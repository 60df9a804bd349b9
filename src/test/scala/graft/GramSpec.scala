package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.SimilarityQueries

/** Gram.MomentsAgg / q187 covariance: independent recomputation,
  * merge-order freedom, and headroom guard. */
class GramSpec extends AnyFunSuite with SparkSpecBase {
  import spark.implicits._

  test("q187 == independent posexplode recomputation (same quantization)") {
    val got = SimilarityQueries.q187Covariance(spark, sfSmoke)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val x = Tables.embeddings(spark, sfSmoke)
      .select($"vec_id", posexplode($"embedding").as(Seq("d", "v")))
      .select($"vec_id", $"d",
        round($"v".cast("double") * 1e4).cast("long").as("xi"))
      .persist()
    val n = Tables.embeddings(spark, sfSmoke).count().toDouble
    val sx = x.groupBy($"d").agg(sum($"xi").as("s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val sxy = x.as("a").join(x.as("b"), Seq("vec_id"))
      .filter($"a.d" <= $"b.d")
      .groupBy($"a.d", $"b.d").agg(sum($"a.xi" * $"b.xi").as("s"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    x.unpersist()
    assert(got.size == 2080 && sxy.size == 2080)
    for (((i, j), c) <- got) {
      val expect = (sxy((i.toInt, j.toInt)).toDouble / n -
        (sx(i.toInt).toDouble / n) * (sx(j.toInt).toDouble / n)) / 1e8
      assert(math.abs(c - expect) < 5e-7, s"($i,$j): $c vs $expect")
    }
    // diagonal = variance >= 0
    for (i <- 0 to 63) assert(got((i.toLong, i.toLong)) >= -1e-9)
  }

  test("MomentsAgg is partition-count invariant (exact Long merges)") {
    val emb = Tables.embeddings(spark, sfSmoke).select($"embedding")
    def run(parts: Int): Seq[(Long, Long, Long)] = {
      val agg = new graft.ops.Gram.MomentsAgg(64)
      val (n, sx, sxy) = emb.repartition(parts).as[Seq[Float]]
        .select(agg.toColumn).head()
      Seq((n, sx.sum, sxy.sum))
    }
    assert(run(1) == run(13))
  }

  test("topEigen recovers a known spectrum and PCA residuals vanish on the fixture") {
    // hand-built symmetric matrix with known eigenvalues {5, 2, 1}
    // via M = Q diag Q^T for an orthonormal Q from Householder-ish rows
    val q = Array(
      Array(1.0 / math.sqrt(2), 1.0 / math.sqrt(2), 0.0),
      Array(1.0 / math.sqrt(2), -1.0 / math.sqrt(2), 0.0),
      Array(0.0, 0.0, 1.0))
    val lams = Array(5.0, 2.0, 1.0)
    val m = Array.tabulate(3, 3)((i, j) =>
      (0 until 3).map(k => q(k)(i) * lams(k) * q(k)(j)).sum)
    val eig = graft.ops.Gram.topEigen(m, 3)
    assert(eig.map(_._1).zip(Seq(5.0, 2.0, 1.0))
      .forall { case (a, b) => math.abs(a - b) < 1e-9 })

    // fixture covariance: every returned eigenpair satisfies Av = λv
    val agg = new graft.ops.Gram.MomentsAgg(64)
    val (n, sx, sxy) = Tables.embeddings(spark, sfSmoke)
      .select($"embedding").as[Seq[Float]].select(agg.toColumn).head()
    val cov = graft.ops.Gram.covariance(n, sx, sxy)
    val top = graft.ops.Gram.topEigen(cov, 8)
    assert(top.map(_._1) == top.map(_._1).sortBy(-_), "descending order")
    for ((lam, v) <- top) {
      val av = Array.tabulate(64)(i => (0 until 64).map(j => cov(i)(j) * v(j)).sum)
      val resid = math.sqrt((0 until 64).map(i => math.pow(av(i) - lam * v(i), 2)).sum)
      assert(resid < 1e-6 * math.max(1.0, math.abs(lam)), s"resid $resid at lam $lam")
    }
    // explained variance can't exceed the trace
    val trace = (0 until 64).map(i => cov(i)(i)).sum
    assert(top.map(_._1).sum <= trace + 1e-9)
  }

  test("q188 ranks a planted far-outlier first; scores nonneg-descending") {
    val base = Tables.embeddings(spark, sfSmoke)
    val dir = java.nio.file.Files.createTempDirectory("graft-q188").toString
    // plant vec_id = -1 at 50x the data scale on every dim
    val planted = base.select($"vec_id", $"embedding", $"label")
      .unionAll(spark.range(1).select(lit(-1L).as("vec_id"),
        array((0 until 64).map(_ => lit(25.0f)): _*).as("embedding"),
        lit(0).as("label")))
    planted.coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
    val out = SimilarityQueries.q188Mahalanobis(spark, dir).collect()
    assert(out.length == 20)
    assert(out.head.getLong(0) == -1L, out.head.toString)
    val scores = out.map(_.getDouble(1))
    assert(scores.forall(_ >= 0.0))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  test("MomentsAgg enforces the Long-headroom row budget") {
    val m = new graft.ops.Gram.Moments(2)
    m.s(0) = 900000001L
    val agg = new graft.ops.Gram.MomentsAgg(2)
    assertThrows[IllegalArgumentException](agg.finish(m))
  }
}
