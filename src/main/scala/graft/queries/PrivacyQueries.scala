package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.documents
import graft.functions.HashExpressions.polyHash32
import graft.functions.TextFunctions.tokens

/** Differentially-private RELEASE operators (round 14) — the governance
  * layer a training-data pipeline runs when corpus statistics leave the
  * boundary (per-source mixes, marginal tables, the public vocabulary):
  * q152/q186's k-anonymity family audits what a release WOULD expose;
  * these produce the release itself.
  *
  * Mechanism discipline shared by all three: the noise is a TRUNCATED
  * TWO-SIDED GEOMETRIC (discrete Laplace — Ghosh, Roughgarden &
  * Sundararajan 2009, the integer-valued ε-DP mechanism for
  * sensitivity-1 counts), truncated at ±[[DpK]] (tail mass ~1e-7 at
  * ε=0.5 folds onto the endpoints by construction — the truncated
  * variant IS the mechanism both engines define). Each count's draw is
  * a deterministic integer LCG seeded by polyHash32 of the released
  * key, mapped to a noise value by INTEGER comparison against
  * cumulative thresholds precomputed on the driver and embedded as
  * Long literals in BOTH the Spark plan and the SQL twin — the doubles
  * behind the thresholds never cross an engine boundary, so there is
  * no exp()/ln() libm-parity risk anywhere (q245's PoisCum precedent).
  * Determinism here is the TEST harness's replay seam, exactly like
  * q46/q137's LCG sampling gates: a production release would key the
  * LCG with a secret salt, which changes no plan shape.
  *
  * Scale shape shared by all three: noise is applied AFTER the count
  * aggregation, so the CASE chain runs over the bounded released frame
  * (|sources|, |lang×source|, |vocab| rows), never the corpus; driver
  * state is the 61-entry threshold table.
  */
object PrivacyQueries {

  private val DpEps = 0.5
  private val DpK = 30

  /** Cumulative thresholds of the truncated two-sided geometric at
    * scale α = e^(−ε), support −K..K, scaled to 2³¹ and floored:
    * noise(u) = (smallest j with u < t_j) − K. Computed ONCE on the
    * driver; both engines compare the same integers. */
  private val DpThresh: Array[Long] = {
    val alpha = math.exp(-DpEps)
    val w = (-DpK to DpK).map(k => math.pow(alpha, math.abs(k)))
    val z = w.sum
    w.map(_ / z).scanLeft(0.0)(_ + _).tail
      .map(c => math.floor(c * 2147483648.0).toLong).toArray
  }

  /** The deterministic draw for a released key: LCG over
    * polyHash32(key) mod 2³¹ — all operands stay far under Long
    * overflow (≤ 1.1e9 · 2.1e9 ≈ 2.4e18). */
  private def dpDraw(key: Column): Column =
    (lit(1103515245L) * pmod(polyHash32(key), lit(2147483648L)) +
      lit(12345L)) % lit(2147483648L)

  /** Integer-threshold inverse CDF: first j with u < t_j, else K
    * (q245's reverse-fold shape — the innermost applied branch is the
    * smallest j, so ties resolve exactly like a forward scan). */
  private def dpNoise(u: Column): Column =
    DpThresh.zipWithIndex.init.reverse
      .foldLeft(lit(DpK.toLong): Column) { case (acc, (t, j)) =>
        when(u < lit(t), lit((j - DpK).toLong)).otherwise(acc)
      }

  private def dpDrawSql(key: String): String =
    s"(1103515245 * (${DuckSql.polyHashSql(key)} % 2147483648) + 12345) " +
      "% 2147483648"

  private def dpNoiseSql(u: String): String =
    DpThresh.zipWithIndex.init
      .map { case (t, j) => s"WHEN $u < $t THEN ${j - DpK}" }
      .mkString("CASE ", " ", s" ELSE $DpK END")

  // ---------------------------------------------------------------- q253

  /** q253: ε-DP HISTOGRAM release of per-source document counts — the
    * corpus-mix table (q46/q122's input) in the form that can leave the
    * boundary. Each source's count is sensitivity-1 (one document moves
    * one cell by one), so one discrete-Laplace draw per cell gives ε-DP;
    * released counts clamp at 0 (post-processing, free). Output keeps
    * the raw count and the noise term so the spec and the oracle audit
    * the mechanism itself; a production release would project
    * n_released only. One aggregation; noise over |sources| rows. */
  def q253DpHistogram(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val u = dpDraw($"source")
    documents(s, d)
      .groupBy($"source").agg(count(lit(1)).as("n_raw"))
      .select($"source", $"n_raw", dpNoise(u).as("noise"))
      .withColumn("n_released", greatest($"n_raw" + $"noise", lit(0L)))
      .orderBy($"source")
  }

  val q253Sql: String =
    s"""WITH c AS (SELECT source, count(*)::BIGINT AS n_raw
       |  FROM documents GROUP BY source),
       |n AS (SELECT source, n_raw,
       |    (${dpNoiseSql(dpDrawSql("source"))})::BIGINT AS noise
       |  FROM c)
       |SELECT source, n_raw, noise,
       |  greatest(n_raw + noise, 0)::BIGINT AS n_released
       |FROM n ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- q254

  /** q254: DP MARGINAL-CONSISTENCY audit — the lang×source contingency
    * cells and the per-lang row totals are noised INDEPENDENTLY (each
    * its own LCG key), as a real release would; independent noising
    * breaks additivity, and this query quantifies the damage per row:
    * |Σ clamped cells − clamped total|, the L1 gap a consistency
    * post-process (Hay et al. 2010's hierarchical-consistency step)
    * would have to reconcile. Two bounded aggregations (cells, then
    * lang rollup); noise over |lang×source| + |lang| rows. */
  def q254DpConsistency(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val cellKey = concat_ws("|", $"lang", $"source")
    val totKey = concat_ws("|", $"lang", lit("TOTAL"))
    // ONE corpus scan: the true row total is the sum of the raw cell
    // counts, so it rides the same rollup the clamped noisy cells do;
    // the total's own noise applies after the rollup (its key is
    // lang-only, so the draw is a per-row expression there)
    documents(s, d)
      .groupBy($"lang", $"source").agg(count(lit(1)).as("n"))
      .select($"lang", $"n",
        greatest($"n" + dpNoise(dpDraw(cellKey)), lit(0L)).as("cell_rel"))
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_cells"),
        sum($"cell_rel").as("sum_cells"),
        sum($"n").as("n_true"))
      .select($"lang", $"n_cells", $"sum_cells",
        greatest($"n_true" + dpNoise(dpDraw(totKey)), lit(0L))
          .as("total_rel"))
      .withColumn("l1_gap", abs($"sum_cells" - $"total_rel"))
      .orderBy($"lang")
  }

  val q254Sql: String =
    s"""WITH cells AS (SELECT lang, source, count(*)::BIGINT AS n
       |  FROM documents GROUP BY lang, source),
       |crel AS (SELECT lang, n,
       |    greatest(n + (${dpNoiseSql(
              dpDrawSql("concat_ws('|', lang, source)"))})::BIGINT, 0)
       |      AS cell_rel
       |  FROM cells),
       |rollup AS (SELECT lang, count(*)::BIGINT AS n_cells,
       |    sum(cell_rel)::BIGINT AS sum_cells, sum(n)::BIGINT AS n_true
       |  FROM crel GROUP BY lang)
       |SELECT lang, n_cells, sum_cells,
       |  greatest(n_true + (${dpNoiseSql(
            dpDrawSql("concat_ws('|', lang, 'TOTAL')"))})::BIGINT, 0) AS total_rel,
       |  abs(sum_cells - greatest(n_true + (${dpNoiseSql(
            dpDrawSql("concat_ws('|', lang, 'TOTAL')"))})::BIGINT, 0))::BIGINT
       |    AS l1_gap
       |FROM rollup ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------- q255

  /** Per-document contribution clip for q255: only the first
    * [[VocabClip]] tokens of a document can add it to any token's
    * document frequency — the bounded-contribution step that makes the
    * DF release's sensitivity 1 per (document, token) pair and ≤ 50 per
    * document (the standard user-level accounting caveat, carried in
    * the release's metadata). */
  private val VocabClip = 50
  private val VocabTau = 40L

  /** q255: STABILITY-BASED private vocabulary release — the public
    * token list an LLM-data pipeline can ship (tokenizer seeding,
    * reporting) without enumerating rare strings that identify single
    * documents (the memorization/PII channel). Mechanism: per-token
    * document frequency over clipped contributions, one discrete-
    * Laplace draw per token (LCG keyed by the token's own hash), then
    * release ONLY tokens whose noisy DF clears τ — the
    * noisy-threshold / "sparse vector" selection (Korolova et al.
    * 2009's search-log release): tokens far under τ are never output,
    * and their absence, not a noised zero, is what protects the tail.
    * Released values are the noisy DFs (the raw DF never leaves).
    * Scale shape: one posexplode (clipped) → distinct (doc, token) →
    * vocab-bounded DF aggregation; the noise CASE runs over |vocab|
    * rows; output ordered (noisy DF desc, token) with no window. */
  def q255DpVocab(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    documents(s, d)
      .select($"doc_id", posexplode(tokens($"text")).as(Seq("p", "w")))
      .where($"p" < VocabClip)
      .select($"doc_id", $"w").distinct()
      .groupBy($"w").agg(count(lit(1)).as("df"))
      .select($"w", ($"df" + dpNoise(dpDraw($"w"))).as("df_released"))
      .where($"df_released" >= VocabTau)
      .orderBy($"df_released".desc, $"w")
  }

  val q255Sql: String =
    s"""WITH toks AS (SELECT doc_id, ${DuckSql.tokensSql} AS ws
       |  FROM documents),
       |clipped AS (SELECT DISTINCT doc_id, unnest(ws[1:$VocabClip]) AS w
       |  FROM toks),
       |df AS (SELECT w, count(*)::BIGINT AS df FROM clipped GROUP BY w),
       |rel AS (SELECT w,
       |    (df + (${dpNoiseSql(dpDrawSql("w"))})::BIGINT) AS df_released
       |  FROM df)
       |SELECT w, df_released FROM rel WHERE df_released >= $VocabTau
       |ORDER BY df_released DESC, w""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q253_dp_histogram" -> (q253DpHistogram _),
    "q254_dp_consistency" -> (q254DpConsistency _),
    "q255_dp_vocab" -> (q255DpVocab _))

  val oracles: Map[String, String] = Map(
    "q253_dp_histogram" -> q253Sql,
    "q254_dp_consistency" -> q254Sql,
    "q255_dp_vocab" -> q255Sql)
}
