package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{DotProductF32, PqExpressions}
import graft.functions.TextFunctions.roundp

/** Product-quantization ANN (Jégou et al. 2011) — the compressed-domain
  * scale path for similarity search, complementing LSH (q32) and IVF
  * (q40): the corpus is stored as m-byte codes (32× smaller than d=64
  * float vectors), and queries scan CODES, not vectors.
  *
  * 100 TB shape:
  *  - codebook training is driver-bounded (trainCap sample; m·ksub·dsub
  *    floats ≈ KiBs) and rides the plan as a reference object;
  *  - encoding is one distributed scan (native PqEncode, codegen'd);
  *    codes would be written once at index-build time and re-read for
  *    every query batch — 32× less scan IO than the raw vectors;
  *  - the query side is broadcast with a precomputed ADC lookup table
  *    (PqLut, once per query), so the corpus scan pays O(m) table
  *    lookups per (query, code) pair instead of O(d) multiplies;
  *  - per-query candidate sets are bounded by TopKAgg (partitions×Q×k·r
  *    shuffle rows), and only candidates rejoin the float vectors for
  *    the exact cosine re-rank (IVFADC+R refinement).
  *
  * Vectors are unit-normalized inside the kernels, making squared-L2
  * order over codes equal cosine order over the originals.
  */
object PqIndex {

  /** m subspaces × ksub centroids × (d/m) dims, plus the encoded corpus. */
  final case class Index(cents: Array[Array[Array[Float]]], encoded: DataFrame)

  /** Bounded driver-side sample of raw vectors (shared by the cell and
    * codebook trainings — collected ONCE per index build; same rationale
    * as IvfIndex: centroid quality affects only approximation error,
    * never the re-ranked candidates' correctness). */
  private[ops] def rawSample(emb: DataFrame, vec: String, trainCap: Int): Array[Array[Float]] = {
    val sample = emb.select(col(vec)).limit(trainCap).collect()
      .map(_.getSeq[Float](0).toArray)
    require(sample.nonEmpty, "empty training sample")
    sample
  }

  private[ops] def normalized(sample: Array[Array[Float]]): Array[Array[Float]] =
    sample.map { v =>
      val nrm = math.sqrt(v.foldLeft(0.0)((a, x) => a + x.toDouble * x))
      if (nrm > 0.0) v.map(x => (x / nrm).toFloat) else v
    }

  /** Per-subspace Lloyd over ALREADY-PREPARED vectors (normalized for the
    * flat form, raw residuals for IVFADC's by_residual form). */
  private[ops] def trainFromVectors(vectors: Array[Array[Float]], m: Int,
                                    ksub: Int, seed: Long): Array[Array[Array[Float]]] = {
    require(ksub <= 256, s"PQ codes are bytes: ksub $ksub > 256")
    val dim = vectors.head.length
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val dsub = dim / m
    Array.tabulate(m) { sub =>
      val slice = vectors.map(v => java.util.Arrays.copyOfRange(v, sub * dsub, (sub + 1) * dsub))
      IvfIndex.lloydCentroids(slice, ksub, iters = 8, seed = seed + sub)
    }
  }

  private[ops] def trainCodebookFromSample(sampleRaw: Array[Array[Float]], m: Int,
                                           ksub: Int, seed: Long): Array[Array[Array[Float]]] =
    trainFromVectors(normalized(sampleRaw), m, ksub, seed)

  private[ops] def trainCodebook(emb: DataFrame, vec: String, m: Int, ksub: Int,
                                 seed: Long, trainCap: Int): Array[Array[Array[Float]]] =
    trainCodebookFromSample(rawSample(emb, vec, trainCap), m, ksub, seed)

  /** Build: train the codebook on a capped sample, encode every row
    * distributively (adds an m-byte `__code` column). */
  def build(emb: DataFrame, id: String, vec: String, m: Int, ksub: Int,
            seed: Long = 42L, trainCap: Int = 65536): Index = {
    val cents = trainCodebook(emb, vec, m, ksub, seed, trainCap)
    // knn references the encoded frame three times (code scan, query
    // broadcast, re-rank join) — persist so encoding runs once, released
    // by the session's ScratchCache sweep. A `load`ed index reads
    // pre-encoded parquet instead and skips this.
    Index(cents, ScratchCache.register(
      emb.withColumn("__code", PqExpressions.encode(col(vec), cents)).persist()))
  }

  /** Persist the encoded corpus (id, vector, m-byte code) as parquet with
    * a codebook JSON sidecar. The codes column is what a 100 TB ADC scan
    * reads — 32× narrower than the vectors at d=64/m=8; column pruning
    * keeps the vectors untouched until the candidate re-rank joins them
    * back. */
  def save(index: Index, dst: String): Unit = {
    index.encoded.write.mode("overwrite").parquet(dst + "/codes")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dst, "codebook.json"),
      CentroidJson.writeCodebook(index.cents))
  }

  /** Reopen: codebook from the sidecar, codes as a plain scan. */
  def load(spark: org.apache.spark.sql.SparkSession, dst: String): Index =
    Index(CentroidJson.parseCodebook(java.nio.file.Files.readString(
        java.nio.file.Paths.get(dst, "codebook.json"))),
      spark.read.parquet(dst + "/codes"))

  /** ADC top-k: scan codes with per-query LUTs for the top k·refine
    * approximate candidates, then exact-rank those by true cosine.
    * Id contract: ids in [0, 2³²) (TopKAgg keys are the raw longs here,
    * no packing — the ADC scan emits each (q, c) pair exactly once). */
  def knn(index: Index, id: String, vec: String, queryPred: Column,
          k: Int, refine: Int = 4): DataFrame = {
    val q = broadcast(index.encoded.filter(queryPred)
      .select(col(id).as("qid"), PqExpressions.lut(col(vec), index.cents).as("lut")))
    // broadcast-NLJ over Q×N codes — the PQ contract: the scan side is
    // m-byte codes and each pair costs m lookups; candidates never exceed
    // k·refine per query thanks to the bounded combine
    val approx = index.encoded.select(col(id).as("cid"), col("__code"))
      .join(q, col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        // TopKAgg ranks DESC; negate the distance (ties: lower cid wins)
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
}
