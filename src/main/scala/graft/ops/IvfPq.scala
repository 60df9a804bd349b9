package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{DotProductF32, NearestCells, PqExpressions}
import graft.functions.TextFunctions.roundp

/** IVF+PQ composite ANN (the canonical billion-scale index layout,
  * Jégou et al. 2011 "IVFADC"; FAISS `IVFx,PQy`): a coarse k-means
  * quantizer partitions the corpus into cells, and members are stored as
  * m-byte PQ codes. A query probes its nProbe nearest cells and
  * ADC-scans ONLY those cells' codes.
  *
  * vs the standalone paths: q45's flat PQ scans every code (cheap per
  * code, but all of them); q40's IVF reads whole vectors in probed cells.
  * The composite does both prunings at once — nProbe/nCells of the
  * corpus, at m bytes per member — which is why it is the layout the
  * big-ANN systems actually ship.
  *
  * Codes quantize RAW vectors (FAISS `by_residual=false` flavor), so the
  * flat-PQ codebook/LUT machinery is reused verbatim; residual encoding
  * (per-cell LUT rebuild) is the known accuracy upgrade and is documented
  * out of scope.
  *
  * 100 TB shape: both trainings are driver-bounded samples; assignment and
  * encoding are one distributed scan; `save` partitions by cell so a
  * probe's cell filter becomes directory-level partition pruning AND the
  * ADC scan column-prunes to the m-byte codes; candidates are bounded by
  * TopKAgg; only k·refine candidates per query rejoin float vectors.
  */
object IvfPq {

  final case class Index(cells: Array[Array[Float]],
                         cents: Array[Array[Array[Float]]],
                         encoded: DataFrame,
                         residual: Boolean = false)

  /** Build: coarse cells (Lloyd, like IvfIndex) + PQ codebook, then one
    * scan adds `__cell` and `__code` to every row.
    *
    * `residual = true` is classic IVFADC (by_residual): cells are trained
    * on unit-normalized vectors, the codebook on the residuals
    * `v_n − cell(v_n)` of the sample, and codes quantize each row's
    * residual. Residuals carry far less energy than the vectors, so the
    * same m·ksub budget quantizes finer; the ADC identity
    * ||q_n − x_n||² = ||(q_n − c) − (x_n − c)||² holds per probed cell,
    * so queries just build one LUT per (query, probed cell). Cell
    * ASSIGNMENT stays the raw-dot argmax either way — argmax is scale-
    * invariant, so raw and normalized vectors pick the same cell. */
  def build(emb: DataFrame, id: String, vec: String, nCells: Int, m: Int,
            ksub: Int, seed: Long = 42L, trainCap: Int = 65536,
            residual: Boolean = false): Index = {
    // ONE bounded collect feeds both trainings
    val sample = PqIndex.rawSample(emb, vec, trainCap)
    if (residual) {
      val sampleN = PqIndex.normalized(sample)
      val cells = IvfIndex.lloydCentroids(sampleN, nCells, iters = 8, seed = seed)
      // residual training set: offset of each normalized sample vector
      // from its assigned (argmax-dot, ties to lower id — NearestCells'
      // rule) cell centroid
      val residuals = sampleN.map { v =>
        var best = 0; var bd = Double.NegativeInfinity
        var c = 0
        while (c < cells.length) {
          var d = 0.0; var j = 0
          val ct = cells(c)
          while (j < math.min(v.length, ct.length)) { d += v(j).toDouble * ct(j); j += 1 }
          if (d > bd) { bd = d; best = c }
          c += 1
        }
        val ct = cells(best)
        Array.tabulate(v.length)(j => v(j) - (if (j < ct.length) ct(j) else 0f))
      }
      val cents = PqIndex.trainFromVectors(residuals, m, ksub, seed)
      Index(cells, cents, ScratchCache.register(emb
        .withColumn("__cell", element_at(NearestCells.topCells(col(vec), cells, 1), 1))
        .withColumn("__code",
          PqExpressions.encodeResidual(col(vec), col("__cell"), cells, cents))
        .persist()), residual = true)
    } else {
      val cells = IvfIndex.lloydCentroids(sample, nCells, iters = 8, seed = seed)
      val cents = PqIndex.trainCodebookFromSample(sample, m, ksub, seed)
      // knn references the encoded frame three times — persist so cell
      // assignment + encoding run once (see PqIndex.build; load skips this)
      Index(cells, cents, ScratchCache.register(emb
        .withColumn("__cell", element_at(NearestCells.topCells(col(vec), cells, 1), 1))
        .withColumn("__code", PqExpressions.encode(col(vec), cents))
        .persist()))
    }
  }

  /** Probe nProbe cells, ADC-scan their codes via a CELL EQUI-JOIN (the
    * broadcast query side carries one LUT per query — per (query, cell)
    * in residual mode), bounded top-k·refine combine, exact cosine
    * re-rank. */
  def knn(index: Index, id: String, vec: String, queryPred: Column,
          k: Int, nProbe: Int, refine: Int = 4): DataFrame = {
    // LUTs evaluate per (query, probed cell) in BOTH modes: residual LUTs
    // depend on the cell by nature, and for the flat form Catalyst hoists
    // any pre-explode projection above the Generate anyway (verified on
    // Spark 4.1.2 — ExtractGenerator keeps non-generator expressions in
    // the Project over the Generate). That redundancy is bounded by the
    // query-side contract: Q broadcastable queries × nProbe × m·ksub·dsub
    // flops — thousands of flops per query, not a scan-side cost.
    val qBase = index.encoded.filter(queryPred)
      .select(col(id).as("qid"), col(vec).as("__qv"),
        explode(NearestCells.topCells(col(vec), index.cells, nProbe)).as("__cell"))
    val q = broadcast(qBase
      .withColumn("lut",
        if (index.residual)
          PqExpressions.lutResidual(col("__qv"), col("__cell"), index.cells, index.cents)
        else PqExpressions.lut(col("__qv"), index.cents))
      .drop("__qv"))
    val approx = index.encoded.select(col(id).as("cid"), col("__cell"), col("__code"))
      .join(q, Seq("__cell")) // members of probed cells only
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        negate(PqExpressions.adc(col("lut"), col("__code"))).as("score"))
    val cands = Similarity.topKRank(approx, k * refine).select("qid", "cid")
    val qv = broadcast(index.encoded.filter(queryPred)
      .select(col(id).as("qid"), col(vec).as("qv")))
    val scored = cands
      .join(qv, Seq("qid"))
      .join(index.encoded.select(col(id).as("cid"), col(vec).as("cv")), Seq("cid"))
      .select(col("qid"), col("cid"),
        roundp(DotProductF32.cosine(col("qv"), col("cv")), 6).as("cos"))
    Similarity.topKRank(scored, k)
  }

  /** Persist cell-partitioned (directory pruning on probes) with both
    * codebooks in JSON sidecars. */
  def save(index: Index, dst: String): Unit = {
    index.encoded.write.mode("overwrite").partitionBy("__cell")
      .parquet(dst + "/cells")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dst, "cells.json"),
      CentroidJson.writeCells(index.cells.toSeq))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dst, "codebook.json"),
      CentroidJson.writeCodebook(index.cents))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dst, "meta.json"),
      s"""{"residual":${index.residual}}""")
  }

  def load(spark: SparkSession, dst: String): Index = {
    def sidecar(name: String): String = java.nio.file.Files.readString(
      java.nio.file.Paths.get(dst, name))
    Index(CentroidJson.parseCells(sidecar("cells.json")),
      CentroidJson.parseCodebook(sidecar("codebook.json")),
      spark.read.parquet(dst + "/cells"),
      // pre-meta.json indexes (older saves) are flat by construction
      residual = java.nio.file.Files.exists(java.nio.file.Paths.get(dst, "meta.json")) &&
        sidecar("meta.json").contains("\"residual\":true"))
  }
}
