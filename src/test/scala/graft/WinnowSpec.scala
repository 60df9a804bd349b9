package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.HashKernels
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprints (q177's kernel) against the Schleimer et al.
  * definition, plus the PrefixSum op behind q178's cumulative curve. */
class WinnowSpec extends AnyFunSuite with SparkSpecBase {

  private def fp(t: String, k: Int = 8, w: Int = 4): Seq[Long] = {
    val a = HashKernels.winnowHashes(UTF8String.fromString(t), k, w)
    (0 until a.numElements()).map(a.getLong)
  }

  test("matches a hand-rolled reference selection (rightmost min per window)") {
    def ref(t: String, k: Int, w: Int): Seq[Long] = {
      val g = (0 to t.length - k).map { i =>
        var acc = 0L
        t.substring(i, i + k).codePoints().forEach(cp =>
          acc = (acc * 31 + cp) % 4294967296L)
        acc
      }
      if (g.length < w) Seq.empty
      else (0 to g.length - w).map { j =>
        // rightmost index of the window min
        val win = g.slice(j, j + w)
        j + win.lastIndexOf(win.min)
      }.map(g).distinct
    }
    for (t <- Seq("the fast key order sort table scan merge part window",
                  "aaaaaaaaaaaaaaaaa", "abcdefghijk", "short", "",
                  "batch batch batch batch")) {
      assert(fp(t) == ref(t, 8, 4), s"on <$t>")
    }
  }

  test("guarantee: shared substring of >= k+w-1 chars => shared fingerprint") {
    val shared = "QUARANTINE-MARKER" // 17 >= 11 chars
    val a = s"left padding here $shared and a tail"
    val b = s"totally different prefix $shared other suffix"
    assert(fp(a).toSet.intersect(fp(b).toSet).nonEmpty)
  }

  test("density: keeps a strict subset of all gram hashes") {
    val t = "the fast key order sort table scan merge part window small hash"
    val m = t.length - 8 + 1
    val n = fp(t).size
    assert(n > 0 && n < m, s"$n of $m grams")
  }

  test("short or null text emits nothing") {
    assert(fp("0123456789") == Seq.empty) // 10 < k+w-1 = 11
    assert(HashKernels.winnowHashes(null, 8, 4).numElements() == 0)
  }

  test("PrefixSum.byKeyAsc == window cumulative sum, any partition count") {
    val s = spark
    import s.implicits._
    val rows = (0L until 97L).map(k => (k, (k * 7 + 3) % 13))
    for (parts <- Seq(1, 4, 32)) {
      val got = graft.ops.PrefixSum.byKeyAsc(rows.toDS(), parts)
        .orderBy($"k").as[(Long, Long, Long)].collect()
      var run = 0L
      rows.foreach { case (k, v) =>
        run += v
        val r = got(k.toInt)
        assert(r == ((k, v, run)), s"parts=$parts k=$k")
      }
    }
    graft.ops.ScratchCache.releaseAll()
  }
}
