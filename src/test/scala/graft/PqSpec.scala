package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{PqIndex, Similarity}

class PqSpec extends AnyFunSuite with SparkSpecBase {
  import spark.implicits._

  test("PQ codes are m bytes with values < ksub") {
    val emb = Tables.embeddings(spark, sfSmoke)
    val idx = PqIndex.build(emb, "vec_id", "embedding", m = 8, ksub = 64)
    val codes = idx.encoded.select($"__code").as[Array[Byte]].collect()
    assert(codes.nonEmpty)
    codes.foreach { c =>
      assert(c.length == 8)
      c.foreach(b => assert((b & 0xFF) < 64, s"code byte $b out of range"))
    }
  }

  test("ADC distance approximates true unit-sphere squared L2") {
    val emb = Tables.embeddings(spark, sfSmoke)
    val idx = PqIndex.build(emb, "vec_id", "embedding", m = 8, ksub = 64)
    import graft.functions.{DotProductF32, PqExpressions}
    // ||a-b||^2 on the unit sphere = 2 - 2 cos; ADC should land within a
    // loose band of it (quantization error is bounded by cell radii)
    val q = idx.encoded.filter($"vec_id" === 0)
      .select(PqExpressions.lut($"embedding", idx.cents).as("lut"),
        $"embedding".as("qv"))
    val rows = idx.encoded.filter($"vec_id" > 0).crossJoin(broadcast(q))
      .select(
        PqExpressions.adc($"lut", $"__code").as("adc"),
        (lit(2.0) - lit(2.0) * DotProductF32.cosine($"qv", $"embedding")).as("truth"))
      .as[(Double, Double)].collect()
    assert(rows.nonEmpty)
    // Quantizing near-random unit vectors shrinks reconstruction norms, so
    // ADC carries a NEGATIVE systematic bias (||ĉ||² < ||c||²) that is
    // constant across candidates and thus rank-neutral; assert the
    // rank-relevant residual (bias-corrected MAE) is small vs the ≈[1,3]
    // spread of the true distances
    val bias = rows.map { case (a, t) => a - t }.sum / rows.length
    val mae = rows.map { case (a, t) => math.abs(a - t - bias) }.sum / rows.length
    assert(bias < 0.0, s"expected norm-shrink bias, got $bias")
    assert(mae < 0.25, s"bias-corrected ADC mean abs error $mae")
  }

  test("PQ knn with exact re-rank recovers most of the true top-5") {
    val emb = Tables.embeddings(spark, sfSmoke)
    val brute = Similarity.knnBrute(emb, "vec_id", "embedding", $"vec_id" < 10, 5)
      .select($"qid", $"cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val idx = PqIndex.build(emb, "vec_id", "embedding", m = 8, ksub = 64)
    val pq = PqIndex.knn(idx, "vec_id", "embedding", $"vec_id" < 10, k = 5, refine = 4)
      .select($"qid", $"cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & pq).size.toDouble / brute.size
    assert(recall >= 0.55, s"PQ recall $recall")
  }

  test("PQ save/load: codebook sidecar round-trips, knn parity on reopen") {
    val emb = Tables.embeddings(spark, sfSmoke)
    val idx = PqIndex.build(emb, "vec_id", "embedding", m = 8, ksub = 64)
    val dst = java.nio.file.Files.createTempDirectory("graft-pq").toString
    PqIndex.save(idx, dst)
    val loaded = PqIndex.load(spark, dst)
    assert(loaded.cents.length == idx.cents.length)
    idx.cents.zip(loaded.cents).foreach { case (a, b) =>
      assert(a.length == b.length)
      a.zip(b).foreach { case (ca, cb) => assert(ca.toSeq == cb.toSeq) }
    }
    def res(i: PqIndex.Index) =
      PqIndex.knn(i, "vec_id", "embedding", $"vec_id" < 10, k = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(res(loaded) == res(idx))
  }

  test("pq knn plan has no CodegenFallback for the PQ expressions") {
    val emb = Tables.embeddings(spark, sfSmoke)
    val idx = PqIndex.build(emb, "vec_id", "embedding", m = 8, ksub = 64)
    val plan = PqIndex.knn(idx, "vec_id", "embedding", $"vec_id" < 3, 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CodegenFallback"), "PQ expressions must codegen")
  }
}
