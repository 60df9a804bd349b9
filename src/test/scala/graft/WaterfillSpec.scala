package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.ops.Waterfill

/** Waterfill.cap against a brute-force search: for random totals and
  * budgets, the returned cap must be the LARGEST integer c with
  * Σ min(tᵢ, c) ≤ B — maximality and feasibility checked independently. */
class WaterfillSpec extends AnyFunSuite {

  private def used(totals: Seq[Long], c: Long): Long =
    totals.map(t => math.min(t, c)).sum

  test("cap is feasible and maximal on random instances") {
    val gen = for {
      n <- Gen.choose(1, 12)
      ts <- Gen.listOfN(n, Gen.choose(0L, 500L))
      b <- Gen.choose(0L, 3000L)
    } yield (ts, b)
    (1 to 300).foreach { _ =>
      val (ts, b) = gen.sample.get
      val c = Waterfill.cap(ts, b)
      if (c == Long.MaxValue) {
        assert(ts.sum <= b, s"uncapped but sum ${ts.sum} > budget $b")
      } else {
        assert(used(ts, c) <= b, s"cap $c infeasible for $ts budget $b")
        assert(used(ts, c + 1) > b,
          s"cap $c not maximal for $ts budget $b (c+1 still fits)")
      }
    }
  }

  test("edge cases: empty-ish, zero budget, all-equal, single source") {
    assert(Waterfill.cap(Seq(5L), 100L) == Long.MaxValue)
    assert(Waterfill.cap(Seq(5L), 3L) == 3L)
    assert(Waterfill.cap(Seq(10L, 10L, 10L), 0L) == 0L)
    assert(Waterfill.cap(Seq(10L, 10L, 10L), 15L) == 5L)
    assert(Waterfill.cap(Seq(0L, 0L), 7L) == Long.MaxValue)
    // small sources keep everything, big ones share the remainder
    assert(Waterfill.alloc(Seq(2L, 100L, 100L), 52L) == Seq(2L, 25L, 25L))
    intercept[IllegalArgumentException](Waterfill.cap(Seq(-1L), 5L))
  }
}
