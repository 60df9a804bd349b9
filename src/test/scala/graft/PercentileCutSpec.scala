package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.PercentileCut

/** Pins PercentileCut (distributed histogram + prefix-sum order
  * statistics) BIT-FOR-BIT against Spark's built-in `percentile`
  * aggregate — q173's hash-sensitive bucket boundaries depend on that
  * exact equality, not on "close enough". */
class PercentileCutSpec extends AnyFunSuite with SparkSpecBase {
  import spark.implicits._

  private val ps = Seq(1.0 / 3, 2.0 / 3, 0.0, 1.0, 0.5, 0.25, 0.9)

  private def builtin(vs: Seq[Double]): Seq[Double] = {
    val df = vs.toDF("v")
    val aggs = ps.zipWithIndex.map { case (p, i) =>
      percentile($"v", lit(p)).as(s"p$i")
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    ps.indices.map(row.getDouble)
  }

  private def check(vs: Seq[Double]): Unit = {
    val got = PercentileCut.cuts(vs.toDF("v"), "v", ps)
    val want = builtin(vs)
    ps.indices.foreach { i =>
      assert(
        java.lang.Double.doubleToLongBits(got(i)) ==
          java.lang.Double.doubleToLongBits(want(i)),
        s"p=${ps(i)} got=${got(i)} want=${want(i)} n=${vs.size}")
    }
    graft.ops.ScratchCache.releaseAll()
  }

  test("withoutAqe: rebound plan is non-adaptive, session conf untouched") {
    val aqeKey = "spark.sql.adaptive.enabled"
    val was = spark.conf.get(aqeKey)
    spark.conf.set(aqeKey, "true")
    try {
      val ds = (1 to 100).toDF("v").groupBy($"v" % 7).count()
      val rebound = org.apache.spark.sql.graftbridge.Bridge.withoutAqe(ds)
      val plan = rebound.queryExecution.executedPlan
      assert(!plan.getClass.getSimpleName.contains("Adaptive"),
        s"expected non-adaptive plan, got ${plan.getClass.getSimpleName}")
      assert(spark.conf.get(aqeKey) == "true",
        "withoutAqe mutated the session-global AQE setting")
      assert(rebound.count() == 7)
      // and the original session still plans adaptively
      assert(ds.queryExecution.executedPlan
        .getClass.getSimpleName.contains("Adaptive"))
    } finally spark.conf.set(aqeKey, was)
  }

  test("sortable bit key round-trips and orders like the double") {
    val vs = Seq(-1e300, -3.5, -1e-308, -0.0, 0.0, 1e-308, 0.25, 7.125, 1e300)
    vs.foreach(v => assert(
      PercentileCut.fromSortableBits(PercentileCut.sortableBits(v)) == v ||
        (v == 0.0 && PercentileCut.fromSortableBits(
          PercentileCut.sortableBits(v)) == 0.0)))
    val keys = vs.map(PercentileCut.sortableBits)
    assert(keys == keys.sorted)
  }

  test("singleton, pair, and all-ties match the builtin exactly") {
    check(Seq(4.25))
    check(Seq(1.5, 2.5))
    check(Seq(3.0, 3.0, 3.0, 3.0))
    check(Seq(-2.0, -2.0, 5.0))
  }

  test("randomized tied 6dp multisets match the builtin bit-for-bit") {
    val rnd = new scala.util.Random(1234)
    for (trial <- 0 until 12) {
      val n = 1 + rnd.nextInt(400)
      // 6dp-quantized values with heavy ties, mixed signs — q173's domain
      val vs = Seq.fill(n) {
        math.rint((rnd.nextDouble() * 20 - 4) * 1e6) / 1e6
      }
      check(vs)
    }
  }

  test("adversarial: positions that land exactly on and just off ranks") {
    // n = 3k+1 makes (1/3)(n-1) integral; 3k makes it x.666…; 3k+2 x.333…
    for (n <- Seq(3, 4, 5, 6, 7, 10, 31, 100)) {
      val vs = (0 until n).map(i => i * 0.125 - 2.0)
      check(vs)
    }
  }

  test("q173's cut on real sf0.001 data equals the builtin on the same frame") {
    val docs = Tables.documents(spark, sfSmoke)
      .select(length($"text").cast("double").as("v"))
    val got = PercentileCut.cuts(docs, "v", Seq(1.0 / 3, 2.0 / 3))
    val row = docs.agg(
      percentile($"v", lit(1.0 / 3)), percentile($"v", lit(2.0 / 3))).head()
    assert(java.lang.Double.doubleToLongBits(got(0)) ==
      java.lang.Double.doubleToLongBits(row.getDouble(0)))
    assert(java.lang.Double.doubleToLongBits(got(1)) ==
      java.lang.Double.doubleToLongBits(row.getDouble(1)))
    graft.ops.ScratchCache.releaseAll()
  }

  test("empty column yields NaN cuts, no job failure") {
    val empty = Seq.empty[Double].toDF("v")
    assert(PercentileCut.cuts(empty, "v", Seq(0.5)).forall(_.isNaN))
    graft.ops.ScratchCache.releaseAll()
  }

  test("groupedCuts equals the builtin percentile per group, bit-for-bit") {
    val rnd = new scala.util.Random(20260816)
    // uneven groups, heavy ties, negatives, one singleton group, and one
    // group whose values straddle many radix cells
    val rows: Seq[(String, Double)] =
      (1 to 4000).map(_ => "a" -> rnd.nextInt(7).toDouble) ++
      (1 to 997).map(_ => "b" -> (rnd.nextDouble() * 2e9 - 1e9)) ++
      (1 to 50).map(_ => "c" -> -rnd.nextInt(3).toDouble) ++
      Seq("d" -> 42.5)
    val df = rows.toDF("g", "v")
    val got = PercentileCut.groupedCuts(df, "g", "v", ps)
    val aggs = ps.zipWithIndex.map { case (p, i) =>
      percentile($"v", lit(p)).as(s"p$i") }
    val want = df.groupBy($"g").agg(aggs.head, aggs.tail: _*)
      .collect().map(r => r.getString(0) -> ps.indices.map(i => r.getDouble(i + 1)))
      .toMap
    assert(got.keySet == want.keySet)
    for (g <- want.keySet; i <- ps.indices)
      assert(java.lang.Double.doubleToLongBits(got(g)(i)) ==
        java.lang.Double.doubleToLongBits(want(g)(i)),
        s"g=$g p=${ps(i)} got=${got(g)(i)} want=${want(g)(i)}")
    // null keys and null values drop; empty frame yields the empty map
    val withNulls = (rows.map { case (g, v) => (g, Some(v)) } ++
      Seq(("a", None), (null: String, Some(1.0)))).toDF("g", "v")
    assert(PercentileCut.groupedCuts(withNulls, "g", "v", Seq(0.5)).keySet ==
      want.keySet)
    assert(PercentileCut.groupedCuts(
      Seq.empty[(String, Double)].toDF("g", "v"), "g", "v", Seq(0.5)).isEmpty)
    graft.ops.ScratchCache.releaseAll()
  }

  test("groupedCuts big-cell refinement with a small group under the same parent prefix") {
    // forces the over-budget branch the other fixtures never reach: one
    // group packs >CollectBudget distinct values into a single 48-bit
    // radix cell (so it must refine 48→32→0), while a tiny group's
    // pending cell lives under the SAME parent prefix — the shift-0
    // small batch and the refining big batch then share a level job and
    // the (group, prefix) pair filter is what keeps the small batch's
    // collect from dragging in the big group's million-value histogram
    val big = spark.range(1050000).select(lit("big").as("g"),
      (lit(1.0) + $"id".cast("double") * lit(1e-12)).as("v"))
    val small = spark.range(37).select(lit("small").as("g"),
      (lit(1.0) + $"id".cast("double") * lit(3.7e-7)).as("v"))
    val df = big.unionByName(small)
    val qs = Seq(0.01, 0.5, 0.99)
    val got = PercentileCut.groupedCuts(df, "g", "v", qs)
    val aggs = qs.zipWithIndex.map { case (p, i) =>
      percentile($"v", lit(p)).as(s"p$i") }
    val want = df.groupBy($"g").agg(aggs.head, aggs.tail: _*)
      .collect().map(r => r.getString(0) -> qs.indices.map(i => r.getDouble(i + 1)))
      .toMap
    assert(got.keySet == Set("big", "small"))
    for (g <- want.keySet; i <- qs.indices)
      assert(java.lang.Double.doubleToLongBits(got(g)(i)) ==
        java.lang.Double.doubleToLongBits(want(g)(i)),
        s"g=$g p=${qs(i)} got=${got(g)(i)} want=${want(g)(i)}")
    graft.ops.ScratchCache.releaseAll()
  }

  test("groupedCuts property sweep: random group shapes across seeds") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed * 7919)
      val nGroups = 1 + rnd.nextInt(12)
      val rows: Seq[(String, Double)] = (0 until nGroups).flatMap { gi =>
        val n = 1 + rnd.nextInt(800)
        val tied = rnd.nextBoolean() // half the groups are heavy-tie integer domains
        (0 until n).map(_ => s"g$gi" -> (
          if (tied) rnd.nextInt(5).toDouble - 2
          else rnd.nextGaussian() * math.pow(10, rnd.nextInt(7))))
      }
      val df = rows.toDF("g", "v")
      val qs = Seq(0.1, 0.5, 0.9)
      val got = PercentileCut.groupedCuts(df, "g", "v", qs)
      val aggs = qs.zipWithIndex.map { case (p, i) =>
        percentile($"v", lit(p)).as(s"p$i") }
      val want = df.groupBy($"g").agg(aggs.head, aggs.tail: _*)
        .collect()
        .map(r => r.getString(0) -> qs.indices.map(i => r.getDouble(i + 1)))
        .toMap
      assert(got.keySet == want.keySet, s"seed=$seed")
      for (g <- want.keySet; i <- qs.indices)
        assert(java.lang.Double.doubleToLongBits(got(g)(i)) ==
          java.lang.Double.doubleToLongBits(want(g)(i)),
          s"seed=$seed g=$g p=${qs(i)}")
      graft.ops.ScratchCache.releaseAll()
    }
  }
}
