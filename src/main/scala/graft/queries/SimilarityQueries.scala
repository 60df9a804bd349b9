package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.embeddings
import graft.ops.Similarity

/** Similarity-search coverage: exact brute-force cosine top-k (oracle
  * hash-matched bit-for-bit via the sequential-dot parity form) and the
  * LSH-bucketed ANN scale path (approximate ⇒ rows-only for the driver;
  * recall vs brute force is property-tested in SimilaritySpec).
  */
object SimilarityQueries {

  /** q30: embedding near-duplicate pairs, cosine ≥ 0.4 (data max ≈ 0.51). */
  def q30NearDup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Similarity.nearDupPairs(embeddings(s, d), "vec_id", "embedding", 0.4, nCells = 32)
      .orderBy($"id_a", $"id_b")
  }

  val q30Sql: String =
    s"""SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       |  ${DuckSql.roundpSql(DuckSql.cosineSql("a.embedding", "b.embedding", 64), 6)}
       |    AS cos
       |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
       |WHERE ${DuckSql.roundpSql(DuckSql.cosineSql("a.embedding", "b.embedding", 64), 6)}
       |  >= 0.4
       |ORDER BY id_a, id_b""".stripMargin

  /** q31: exact cosine top-5 for the first 20 vectors as queries —
    * broadcast query side, corpus streams, bounded per-query window. */
  def q31KnnBrute(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Similarity.knnBrute(embeddings(s, d), "vec_id", "embedding",
        $"vec_id" < 20, k = 5)
      .select($"qid", $"rank".cast("bigint").as("rank"), $"cid", $"cos")
      .orderBy($"qid", $"rank")
  }

  val q31Sql: String =
    s"""WITH scored AS (
       |  SELECT q.vec_id AS qid, c.vec_id AS cid,
       |    ${DuckSql.roundpSql(DuckSql.cosineSql("q.embedding", "c.embedding", 64), 6)}
       |      AS cos
       |  FROM embeddings q JOIN embeddings c
       |    ON q.vec_id < 20 AND c.vec_id <> q.vec_id)
       |SELECT qid, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid)
       |    AS rank, cid, cos
       |FROM scored
       |QUALIFY rank <= 5
       |ORDER BY qid, rank""".stripMargin

  /** q32: LSH-bucketed ANN top-5 (8 hyperplane bits × 4 tables) — the scale
    * path. Approximate: no SQL oracle; driver records rows>0, recall is
    * spec-tested. */
  def q32KnnLsh(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Similarity.knnLsh(embeddings(s, d), "vec_id", "embedding",
        $"vec_id" < 20, k = 5)
      .select($"qid", $"rank".cast("bigint").as("rank"), $"cid", $"cos")
      .orderBy($"qid", $"rank")
  }

  /** q40: IVF ANN top-5 (16 k-means cells, 4 probed) — the write-time-
    * partitioned scale path. Approximate like q32: rows-only check, recall
    * vs brute force spec-asserted (IvfSpec). */
  def q40KnnIvf(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val idx = graft.ops.IvfIndex.build(embeddings(s, d), "vec_id", "embedding", nCells = 16)
    graft.ops.IvfIndex.knn(idx, "vec_id", "embedding", $"vec_id" < 20, k = 5, nProbe = 4)
      .select($"qid", $"rank".cast("bigint").as("rank"), $"cid", $"cos")
      .orderBy($"qid", $"rank")
  }

  /** q45: product-quantization ANN top-5 (m=8 byte codes, ksub=64, exact
    * cosine re-rank of the top-20 ADC candidates) — the compressed-domain
    * scale path: queries scan 8-byte codes, not 256-byte vectors.
    * Approximate like q32/q40: rows-only check, recall spec-asserted
    * (PqSpec). */
  def q45KnnPq(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val idx = graft.ops.PqIndex.build(embeddings(s, d), "vec_id", "embedding",
      m = 8, ksub = 64)
    graft.ops.PqIndex.knn(idx, "vec_id", "embedding", $"vec_id" < 20, k = 5)
      .select($"qid", $"rank".cast("bigint").as("rank"), $"cid", $"cos")
      .orderBy($"qid", $"rank")
  }

  /** q49: IVF+PQ composite ANN in RESIDUAL mode (classic IVFADC): 16
    * coarse cells × m=8/ksub=64 codes quantizing per-cell residuals, 6
    * cells probed, exact re-rank. Both prunings at once — nProbe/nCells
    * of the corpus at m bytes/member — with the residual codebook's finer
    * quantization (spec-asserted ≤ flat ADC error). Rows-only like the
    * other ANN paths; recall spec-asserted (IvfPqSpec). */
  def q49KnnIvfPq(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val idx = graft.ops.IvfPq.build(embeddings(s, d), "vec_id", "embedding",
      nCells = 16, m = 8, ksub = 64, residual = true)
    graft.ops.IvfPq.knn(idx, "vec_id", "embedding", $"vec_id" < 20, k = 5,
        nProbe = 6)
      .select($"qid", $"rank".cast("bigint").as("rank"), $"cid", $"cos")
      .orderBy($"qid", $"rank")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q30_embedding_neardup" -> (q30NearDup _),
    "q31_knn_brute"         -> (q31KnnBrute _),
    "q32_knn_lsh"           -> (q32KnnLsh _),
    "q40_knn_ivf"           -> (q40KnnIvf _),
    "q45_knn_pq"            -> (q45KnnPq _),
    "q49_knn_ivfpq"         -> (q49KnnIvfPq _),
  )

  val oracles: Map[String, String] = Map(
    "q30_embedding_neardup" -> q30Sql,
    "q31_knn_brute"         -> q31Sql,
    // q32 intentionally omitted: approximate operator, rows-only check.
  )
}
