package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class GraphSpec extends AnyFunSuite with SparkSpecBase {
  import spark.implicits._

  test("rankInt matches a driver-side replay of the integer recurrence") {
    // 1→2, 1→3, 2→3; 3 dangling
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst")
    val got = graft.ops.PageRank.rankInt(spark, edges, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.ops.ScratchCache.releaseAll()
    // exact replay with plain Scala Longs
    val scale = 1000000000000L
    val nodes = Seq(1L, 2L, 3L)
    val out = Map(1L -> Seq(2L, 3L), 2L -> Seq(3L))
    val n = nodes.length.toLong
    val base = 15L * (scale / n) / 100
    var r = nodes.map(_ -> scale / n).toMap
    for (_ <- 1 to 3) {
      val dang = nodes.filterNot(out.contains).map(r).sum
      val c = nodes.map(v => v -> nodes.filter(u =>
        out.getOrElse(u, Nil).contains(v)).map(u => r(u) / out(u).length).sum).toMap
      r = nodes.map(v => v -> (base + 85L * (c(v) + dang / n) / 100)).toMap
    }
    assert(got == r)
    // sink node accumulated the most rank; mass is conserved up to the
    // deterministic integer-division loss (never created)
    assert(got(3L) > got(2L) && got(2L) > got(1L))
    assert(got.values.sum <= scale)
  }

  test("rankIntBroadcast is bit-identical to rankInt on a random graph") {
    val rnd = new scala.util.Random(23)
    val edges = (1 to 300).map { _ =>
      (rnd.nextInt(30).toLong, (30 + rnd.nextInt(40)).toLong)
    }.distinct.toDF("src", "dst")
    val a = graft.ops.PageRank.rankInt(spark, edges, iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.ops.ScratchCache.releaseAll()
    val b = graft.ops.PageRank.rankIntBroadcast(spark, edges, iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.ops.ScratchCache.releaseAll()
    assert(a == b)
  }

  test("rank auto-switch: all three regimes engage on thresholds, ranks identical") {
    val rnd = new scala.util.Random(41)
    val edges = (1 to 300).map { _ =>
      (rnd.nextInt(30).toLong, (30 + rnd.nextInt(40)).toLong)
    }.distinct.toDF("src", "dst")
    // generous thresholds → the edge list fits the driver → driver-local
    val a = graft.ops.PageRank.rank(spark, edges, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(graft.ops.PageRank.lastChoice == "driver-local")
    graft.ops.ScratchCache.releaseAll()
    // edges past the driver budget, vertices within broadcast → broadcast
    val b = graft.ops.PageRank.rank(spark, edges, iters = 3,
        maxDriverEdgeBytes = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(graft.ops.PageRank.lastChoice == "broadcast")
    graft.ops.ScratchCache.releaseAll()
    // both budgets exhausted → the fully distributed path MUST engage
    val c = graft.ops.PageRank.rank(spark, edges, iters = 3,
        maxBroadcastBytes = 0L, maxDriverEdgeBytes = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(graft.ops.PageRank.lastChoice == "distributed")
    graft.ops.ScratchCache.releaseAll()
    assert(a == b && b == c) // the switch may never change the ranks
  }

  test("rankInt handles a fully dangling edge set and empty-side ids") {
    // every dst is dangling; ranks still well-defined and deterministic
    val edges = Seq((1L, 10L), (2L, 10L), (3L, 11L)).toDF("src", "dst")
    val a = graft.ops.PageRank.rankInt(spark, edges, 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.ops.ScratchCache.releaseAll()
    val b = graft.ops.PageRank.rankInt(spark, edges, 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.ops.ScratchCache.releaseAll()
    assert(a == b)                      // rerun-stable
    assert(a(10L) > a(11L))             // two in-edges beat one
    assert(a.keySet == Set(1L, 2L, 3L, 10L, 11L))
  }

  test("rankSeeded: hand-computed TrustRank on a 4-node toy graph") {
    import spark.implicits._
    // seeds {1}; 1 -> 2 -> 3, 4 isolated-ish (4 -> 2). scale 1000.
    val edges = Seq((1L, 2L), (2L, 3L), (4L, 2L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("id")
    val got = graft.ops.PageRank
      .rankSeeded(spark, edges, seeds, iters = 1, scale = 1000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(graft.ops.PageRank.lastChoice == "driver-local")
    // forcing the distributed loop must be bit-identical
    val dist = graft.ops.PageRank
      .rankSeeded(spark, edges, seeds, iters = 1, scale = 1000L,
        maxDriverEdgeBytes = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(graft.ops.PageRank.lastChoice == "distributed")
    assert(dist == got)
    graft.ops.ScratchCache.releaseAll()
    // r0: node1 = 1000, others 0. iter1:
    //   dangling = node3 (d=0) holds 0 -> dm = 0
    //   contrib: 2 <- r(1)/1 = 1000; 3 <- r(2)/1 = 0; 2 <- r(4)/1 = 0
    //   seed base = 15*1000/100 = 150
    //   r(1) = 150 + 85*(0 + 0)/100 = 150
    //   r(2) = 0 + 85*1000/100 = 850; r(3) = 0; r(4) = 0
    assert(got == Map(1L -> 150L, 2L -> 850L, 3L -> 0L, 4L -> 0L))
  }

  test("q190: mass stays on the seed side — non-seed suppliers rank 0") {
    import spark.implicits._
    val out = graft.queries.GraphQueries.q190TrustRank(spark, sfSmoke)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.ops.ScratchCache.releaseAll()
    assert(out.nonEmpty)
    // suppliers are ids < 1000000; nothing points AT a supplier in the
    // directed bipartite graph, so any supplier with rank > 0 must be a
    // seed (teleport + dangling return are seed-only)
    for ((id, r) <- out if id < 1000000L && r > 0L)
      assert(id < 10L, s"non-seed supplier $id has rank $r")
    // total rank never exceeds the scale (integer division only loses)
    assert(out.values.sum <= 1000000000000L)
  }

  test("q93/q94/q95 plans: no cartesian, no window, broadcast stats join") {
    def plan(name: String) = SparkEntry.queries(name)(spark, sfSmoke)
      .queryExecution.sparkPlan.toString
    val pr = plan("q93_pagerank")
    assert(!pr.contains("CartesianProduct"))
    val topk = plan("q94_topk_per_group")
    assert(!topk.contains("Window"), topk)
    assert(topk.contains("ObjectHashAggregate"), topk)
    val outl = plan("q95_outliers")
    assert(!outl.contains("Window"), outl)
    assert(outl.contains("BroadcastHashJoin"), outl)
    graft.ops.ScratchCache.releaseAll()
  }
}
