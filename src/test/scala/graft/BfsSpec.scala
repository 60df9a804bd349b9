package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Bfs

/** Bfs.distances: hand-built graph truths — hops, cycles, unreachable
  * nodes, depth cap, isolated seeds, early frontier exhaustion. */
class BfsSpec extends AnyFunSuite with SparkSpecBase {
  import spark.implicits._

  private def dist(edges: Seq[(Long, Long)], seeds: Seq[Long], depth: Int) = {
    val e = edges.toDF("src", "dst")
    val s = seeds.toDF("id")
    val out = Bfs.distances(e, s, depth).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.ops.ScratchCache.releaseAll()
    out
  }

  test("chain + branch + cycle: min-hop wins, unreachable absent") {
    // 1 -> 2 -> 3 -> 4, 1 -> 3 (shortcut), 4 -> 1 (cycle), 9 isolated
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 3L), (4L, 1L), (8L, 9L))
    val got = dist(edges, Seq(1L), depth = 5)
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L))
  }

  test("depth cap truncates the frontier") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    assert(dist(edges, Seq(1L), depth = 2) ==
      Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
    assert(dist(edges, Seq(1L), depth = 0) == Map(1L -> 0L))
  }

  test("isolated seed reports at hop 0; multi-seed min-hop merges") {
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 3L))
    val got = dist(edges, Seq(1L, 5L, 42L), depth = 3)
    assert(got == Map(1L -> 0L, 5L -> 0L, 42L -> 0L, 2L -> 1L, 3L -> 1L))
  }

  test("early exit: exhausted frontier stops before the cap") {
    // depth cap 100 but the graph ends after 1 hop — must terminate fast
    val got = dist(Seq((1L, 2L)), Seq(1L), depth = 100)
    assert(got == Map(1L -> 0L, 2L -> 1L))
  }

  private def fused(edges: Seq[(Long, Long)], seeds: Seq[Long], depth: Int) =
    Bfs.distancesFused(edges.toDF("src", "dst"), seeds.toDF("id"), depth)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("fused single-job regime ≡ per-level regime on every graph fixture") {
    val fixtures = Seq(
      (Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 3L), (4L, 1L), (8L, 9L)), Seq(1L), 5),
      (Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)), Seq(1L), 2),
      (Seq((1L, 2L), (2L, 3L), (5L, 3L)), Seq(1L, 5L, 42L), 3),
      (Seq((1L, 2L)), Seq(1L), 7))
    for ((e, s, k) <- fixtures)
      assert(fused(e, s, k) == dist(e, s, k), s"edges=$e seeds=$s depth=$k")
  }

  test("auto regime: driver-local under the edge budget, per-level past it; equal outputs") {
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (1L, 2L)) // dup edge absorbed
    def run(budget: Long) = {
      val out = Bfs.auto(e.toDF("src", "dst"), Seq(1L).toDF("id"),
        maxDepth = 3, maxDriverEdgeBytes = budget)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      graft.ops.ScratchCache.releaseAll()
      (out, Bfs.lastChoice)
    }
    val (small, c1) = run(budget = 1L << 20)
    assert(c1 == "driver-local")
    val (big, c2) = run(budget = 0L)
    assert(c2 == "per-level")
    assert(small == big && small == Map(1L -> 0L, 2L -> 1L, 3L -> 1L))
  }

  test("auto undirected walks both directions in both regimes") {
    val e = Seq((2L, 1L), (3L, 2L)) // seeds only reach them BACKWARD
    def run(budget: Long) = {
      val out = Bfs.auto(e.toDF("src", "dst"), Seq(1L).toDF("id"),
        maxDepth = 2, undirected = true, maxDriverEdgeBytes = budget)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      graft.ops.ScratchCache.releaseAll()
      out
    }
    val expected = Map(1L -> 0L, 2L -> 1L, 3L -> 2L)
    assert(run(1L << 20) == expected) // driver-local
    assert(run(0L) == expected)       // per-level
  }
}
