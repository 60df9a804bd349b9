package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._
import graft.functions.TextFunctions.roundp

/** Approximate/exact nearest-neighbor search over an embedding column.
  *
  * Brute force is the correctness baseline (and is the right answer for a
  * broadcastable query set: Q×N score matrix, no shuffle on the corpus).
  * The LSH path is the scale route: random-hyperplane sign buckets bound
  * the candidate join; recall is tunable via bits/tables and is
  * property-tested against brute force rather than oracle-matched.
  */
object Similarity {

  /** Exact top-k cosine neighbors for each query row (queries = rows
    * matching `queryPred`). Broadcast the (small) query side; the corpus
    * streams — at 100 TB this is one scan, no corpus shuffle; the final
    * top-k per query is a bounded window. */
  def knnBrute(emb: DataFrame, id: String, vec: String,
               queryPred: org.apache.spark.sql.Column, k: Int): DataFrame = {
    // norms are precomputed per row (not per pair): cos = dot/(nq*nc) is the
    // same doubles as dot/(sqrt(dot qq)*sqrt(dot cc)), 3x fewer dot products
    val q = emb.filter(queryPred)
      .select(col(id).as("qid"), col(vec).as("qv"), norm(col(vec)).as("qn"))
    val c = emb.select(col(id).as("cid"), col(vec).as("cv"), norm(col(vec)).as("cn"))
    val scored = c.join(broadcast(q), col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        // native fused loop — bit-identical to the HOF dotSeq form
        // (AdvancedSpec), ~25x faster in the Q x N pair loop
        roundp(graft.functions.DotProductF32.dot(col("qv"), col("cv")) /
          (col("qn") * col("cn")), 6).as("cos"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("cid"), col("cos"), col("rank"))
  }

  /** Deterministic pseudo-random hyperplane component r(plane, dim) ∈
    * [−0.5, 0.5): LCG hash of the (plane, dim) index — reproducible across
    * engines and runs, no RNG state. */
  private def planeComponent(plane: Int, dim: org.apache.spark.sql.Column, nDims: Int) = {
    val idx = lit(plane * nDims) + dim
    ((lit(1103515245L) * idx + 12345L) % lit(2147483648L)).cast("double") /
      lit(2147483648.0) - lit(0.5)
  }

  /** Sign-bucket key: `nPlanes` hyperplane sign bits packed to a LONG. */
  def lshBucket(vec: org.apache.spark.sql.Column, nPlanes: Int, nDims: Int,
                table: Int): org.apache.spark.sql.Column =
    aggregate(
      transform(sequence(lit(0), lit(nPlanes - 1)), p => {
        val proj = aggregate(
          zip_with(vec, sequence(lit(0), lit(nDims - 1)),
            (v, d) => v.cast("double") *
              (((lit(1103515245L) * (lit((table * 31 + 1)) * lit(nPlanes * nDims) + p * nDims + d)
                + 12345L) % lit(2147483648L)).cast("double") / lit(2147483648.0) - lit(0.5))),
          lit(0.0), (acc, v) => acc + v)
        when(proj > 0, lit(1L)).otherwise(lit(0L))
      }),
      lit(0L), (acc, b) => acc * 2 + b)

  /** ANN top-k: candidates share an LSH bucket in ≥1 of `nTables` tables;
    * exact cosine ranks candidates. Recall < 1 by construction — verified
    * against `knnBrute` in the spec, not the oracle.
    *
    * Bucketing runs through the native `HyperplaneSigs` expression (one
    * fused JVM loop emitting all `nTables` signatures per row) rather than
    * the staged-HOF `lshBucket` form — same arithmetic (spec-asserted
    * equal), without nTables × nPlanes × nDims interpreted lambda
    * dispatches per row. */
  def knnLsh(emb: DataFrame, id: String, vec: String,
             queryPred: org.apache.spark.sql.Column, k: Int,
             nPlanes: Int = 4, nTables: Int = 8, nDims: Int = 64): DataFrame = {
    val withBuckets = emb.select(col(id).as("cid"), col(vec).as("cv"),
        posexplode(graft.functions.HashExpressions.hyperplaneSigs(
          col(vec), nPlanes, nDims, nTables)))
      .withColumnRenamed("pos", "tbl").withColumnRenamed("col", "bucket")
    val qb = withBuckets.join(
      emb.filter(queryPred).select(col(id).as("qid")),
      col("qid") === col("cid"))
      .select(col("qid"), col("cv").as("qv"), col("tbl"), col("bucket"))
    val cands = withBuckets.join(qb, Seq("tbl", "bucket"))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("qv"), col("cid"), col("cv"))
      .distinct()
    val scored = cands.select(col("qid"), col("cid"),
      roundp(cosine(col("qv"), col("cv")), 6).as("cos"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Embedding near-duplicate pairs (cosine ≥ threshold), brute-force form;
    * the LSH-candidates + verify variant composes from knnLsh's bucketing
    * exactly like Dedup.minhashDedupPairs. */
  def nearDupPairs(emb: DataFrame, id: String, vec: String, threshold: Double): DataFrame = {
    val a = emb.select(col(id).as("id_a"), col(vec).as("va"), norm(col(vec)).as("na"))
    val b = emb.select(col(id).as("id_b"), col(vec).as("vb"), norm(col(vec)).as("nb"))
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        roundp(graft.functions.DotProductF32.dot(col("va"), col("vb")) /
          (col("na") * col("nb")), 6).as("cos"))
      .filter(col("cos") >= threshold)
  }
}
