package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{IvfPq, Similarity}

class IvfPqSpec extends AnyFunSuite with SparkSpecBase {
  import spark.implicits._

  test("IVF+PQ recall: double pruning still recovers most of the true top-5") {
    val emb = Tables.embeddings(spark, sfSmoke)
    val brute = Similarity.knnBrute(emb, "vec_id", "embedding", $"vec_id" < 10, 5)
      .select($"qid", $"cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val idx = IvfPq.build(emb, "vec_id", "embedding", nCells = 16, m = 8, ksub = 64)
    val got = IvfPq.knn(idx, "vec_id", "embedding", $"vec_id" < 10, 5,
        nProbe = 6, refine = 4)
      .select($"qid", $"cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & got).size.toDouble / brute.size
    // two stacked approximations (cell probe + code quantization): expect
    // at or below the standalone paths (IVF ≈ 0.55+, PQ ≈ 0.55+) but well
    // above chance
    assert(recall >= 0.4, s"IVF+PQ recall $recall")
  }

  test("the ADC scan touches probed cells only (equi-join, not full scan)") {
    val emb = Tables.embeddings(spark, sfSmoke)
    val idx = IvfPq.build(emb, "vec_id", "embedding", nCells = 16, m = 8, ksub = 64)
    val df = IvfPq.knn(idx, "vec_id", "embedding", $"vec_id" < 3, 5, nProbe = 4)
    val plan = df.queryExecution.executedPlan.toString
    // the code scan must reach the combine through a cell equi-join (hash
    // join on __cell), never a cartesian/NLJ over all codes
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("residual (IVFADC) mode: lower-energy inputs quantize finer than flat") {
    import graft.functions.{DotProductF32, PqExpressions}
    val emb = Tables.embeddings(spark, sfSmoke)
    def adcError(residual: Boolean): Double = {
      val idx = IvfPq.build(emb, "vec_id", "embedding", nCells = 16, m = 8,
        ksub = 64, residual = residual)
      // probe ALL cells for vec_id 0, so every corpus row scores once with
      // its own cell's LUT — the exact configuration knn uses
      val q = idx.encoded.filter($"vec_id" === 0)
        .select($"embedding".as("qv"))
      val scored = idx.encoded.filter($"vec_id" > 0).crossJoin(broadcast(q))
        .select(
          (if (residual)
             PqExpressions.adc(
               PqExpressions.lutResidual($"qv", $"__cell", idx.cells, idx.cents),
               $"__code")
           else
             PqExpressions.adc(
               PqExpressions.lut($"qv", idx.cents), $"__code")).as("adc"),
          (lit(2.0) - lit(2.0) * DotProductF32.cosine($"qv", $"embedding")).as("truth"))
        .as[(Double, Double)].collect()
      scored.map { case (a, t) => math.abs(a - t) }.sum / scored.length
    }
    val flat = adcError(residual = false)
    val res = adcError(residual = true)
    // residual vectors carry far less energy than unit vectors, so the
    // same codebook budget must approximate distances at least as well
    assert(res <= flat, s"residual ADC error $res vs flat $flat")
    graft.ops.ScratchCache.releaseAll()
  }

  test("residual knn recall matches the flat composite's bound") {
    val emb = Tables.embeddings(spark, sfSmoke)
    val brute = Similarity.knnBrute(emb, "vec_id", "embedding", $"vec_id" < 10, 5)
      .select($"qid", $"cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val idx = IvfPq.build(emb, "vec_id", "embedding", nCells = 16, m = 8,
      ksub = 64, residual = true)
    val got = IvfPq.knn(idx, "vec_id", "embedding", $"vec_id" < 10, 5,
        nProbe = 6, refine = 4)
      .select($"qid", $"cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & got).size.toDouble / brute.size
    assert(recall >= 0.4, s"residual IVF+PQ recall $recall")
    graft.ops.ScratchCache.releaseAll()
  }

  test("save/load round-trips the residual flag with knn parity") {
    val emb = Tables.embeddings(spark, sfSmoke)
    val idx = IvfPq.build(emb, "vec_id", "embedding", nCells = 16, m = 8,
      ksub = 64, residual = true)
    val dst = java.nio.file.Files.createTempDirectory("graft-ivfpq-res").toString
    IvfPq.save(idx, dst)
    val loaded = IvfPq.load(spark, dst)
    assert(loaded.residual)
    def res(i: IvfPq.Index) =
      IvfPq.knn(i, "vec_id", "embedding", $"vec_id" < 10, 5, nProbe = 6)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(res(loaded) == res(idx))
    graft.ops.ScratchCache.releaseAll()
  }

  test("save/load: cell-partitioned, sidecars round-trip, knn parity, pruning") {
    val emb = Tables.embeddings(spark, sfSmoke)
    val idx = IvfPq.build(emb, "vec_id", "embedding", nCells = 16, m = 8, ksub = 64)
    val dst = java.nio.file.Files.createTempDirectory("graft-ivfpq").toString
    IvfPq.save(idx, dst)
    val loaded = IvfPq.load(spark, dst)
    assert(loaded.cells.length == idx.cells.length)
    idx.cells.zip(loaded.cells).foreach { case (a, b) => assert(a.toSeq == b.toSeq) }
    idx.cents.zip(loaded.cents).foreach { case (a, b) =>
      a.zip(b).foreach { case (ca, cb) => assert(ca.toSeq == cb.toSeq) }
    }
    def res(i: IvfPq.Index) =
      IvfPq.knn(i, "vec_id", "embedding", $"vec_id" < 10, 5, nProbe = 6)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(res(loaded) == res(idx))
    // probe-shaped filter on the reopened index prunes to the named cells
    val probed = loaded.encoded.filter($"__cell".isin(0, 1, 2))
    val scan = probed.queryExecution.executedPlan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scan.nonEmpty)
    assert(scan.head.selectedPartitions.partitionCount <= 3)
  }
}
