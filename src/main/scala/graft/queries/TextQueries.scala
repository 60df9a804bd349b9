package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.documents
import graft.functions.TextFunctions._

/** Text-analysis operators over the documents table (BASELINE north star):
  * language-ID heuristic, quality scoring, token counting, fingerprinting.
  * All pure codegen'd column expressions with exact DuckDB twins.
  */
object TextQueries {

  private val langWords: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und"),
    "en" -> Seq("the", "a", "of", "and"),
    "es" -> Seq("el", "la", "los", "de"),
    "fr" -> Seq("le", "les", "des", "et"))

  /** q22: stopword-profile language ID. Sequential argmax (first max wins
    * in lang-code order) keeps the prediction deterministic. */
  def q22LangId(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ws = tokens($"text")
    val scored = documents(s, d).select($"doc_id", ws.as("ws"))
      .select($"doc_id" +: langWords.map { case (lang, words) =>
        stopwordCount($"ws", words).cast("bigint").as(s"n_$lang") }: _*)
    val cols = langWords.map { case (lang, _) => col(s"n_$lang") }
    val best = cols.reduce((a, b) => greatest(a, b))
    // left-to-right argmax: first lang (de,en,es,fr order) hitting the max
    val predOrdered = langWords.foldLeft(lit(null).cast("string")) {
      case (acc, (lang, _)) =>
        coalesce(acc, when(col(s"n_$lang") === best && best > 0, lang))
    }
    scored.select($"doc_id",
        col("n_de"), col("n_en"), col("n_es"), col("n_fr"),
        coalesce(predOrdered, lit("unknown")).as("lang_pred"))
      .orderBy($"doc_id")
  }

  val q22Sql: String = {
    val ws = DuckSql.tokensSql
    def cnt(wordsSql: String) = s"len(list_filter(ws, w -> w IN ($wordsSql)))::BIGINT"
    val defs = Seq(
      "n_de" -> cnt("'der','die','das','und'"),
      "n_en" -> cnt("'the','a','of','and'"),
      "n_es" -> cnt("'el','la','los','de'"),
      "n_fr" -> cnt("'le','les','des','et'"))
    val sel = defs.map { case (n, e) => s"$e AS $n" }.mkString(", ")
    s"""WITH toks AS (SELECT doc_id, $ws AS ws FROM documents),
       |scored AS (SELECT doc_id, $sel FROM toks)
       |SELECT doc_id, n_de, n_en, n_es, n_fr,
       |  CASE
       |    WHEN greatest(n_de, n_en, n_es, n_fr) = 0 THEN 'unknown'
       |    WHEN n_de = greatest(n_de, n_en, n_es, n_fr) THEN 'de'
       |    WHEN n_en = greatest(n_de, n_en, n_es, n_fr) THEN 'en'
       |    WHEN n_es = greatest(n_de, n_en, n_es, n_fr) THEN 'es'
       |    ELSE 'fr' END AS lang_pred
       |FROM scored ORDER BY doc_id""".stripMargin
  }

  /** q23: document quality score — length/stopword-ratio heuristic, every
    * ratio an integer-over-integer division (engine-parity safe). */
  def q23Quality(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    documents(s, d)
      .select($"doc_id", tokens($"text").as("ws"), length($"text").as("n_chars"))
      .select($"doc_id",
        size($"ws").cast("bigint").as("n_words"),
        $"n_chars".cast("bigint").as("n_chars"),
        stopwordCount($"ws", Seq("the", "a", "of", "and")).as("n_stop"))
      .select($"doc_id", $"n_words", $"n_chars",
        roundp($"n_stop" * lit(1.0) / $"n_words", 6).as("stop_ratio"),
        roundp(least($"n_words", lit(100)) / lit(100.0) *
          (lit(1.0) - $"n_stop" * lit(1.0) / $"n_words"), 6).as("quality"))
      .orderBy($"doc_id")
  }

  val q23Sql: String = {
    val ws = DuckSql.tokensSql
    s"""WITH t AS (SELECT doc_id, $ws AS ws, len(text)::BIGINT AS n_chars FROM documents),
       |c AS (SELECT doc_id, len(ws)::BIGINT AS n_words, n_chars,
       |  len(list_filter(ws, w -> w IN ('the','a','of','and'))) AS n_stop FROM t)
       |SELECT doc_id, n_words, n_chars,
       |  ${DuckSql.roundpSql("n_stop * 1.0 / n_words", 6)} AS stop_ratio,
       |  ${DuckSql.roundpSql(
             "least(n_words, 100) / 100.0 * (1.0 - n_stop * 1.0 / n_words)", 6)} AS quality
       |FROM c ORDER BY doc_id""".stripMargin
  }

  /** q24: token counting — whitespace tokens vs BPE-ish regex tokens. */
  def q24TokenCount(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    documents(s, d).select($"doc_id",
        size(tokens($"text")).cast("bigint").as("ws_tokens"),
        tokenCountRegex($"text").cast("bigint").as("bpe_tokens"),
        length($"text").cast("bigint").as("n_chars"))
      .orderBy($"doc_id")
  }

  val q24Sql: String =
    s"""SELECT doc_id,
       |  len(${DuckSql.tokensSql})::BIGINT AS ws_tokens,
       |  len(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9\\s]'))::BIGINT
       |    AS bpe_tokens,
       |  len(text)::BIGINT AS n_chars
       |FROM documents ORDER BY doc_id""".stripMargin

  /** q25: document fingerprints — whole-text rolling hash + min shingle
    * hash (the winnowing primitive). */
  def q25Fingerprint(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    documents(s, d)
      .select($"doc_id", polyHash(lower($"text")).as("content_hash"),
        tokens($"text").as("ws"))
      .select($"doc_id", $"content_hash", shingles($"ws", 3).as("sh"))
      .select($"doc_id", $"content_hash",
        array_min(transform($"sh", s => polyHash(s))).as("min_shingle_hash"))
      .orderBy($"doc_id")
  }

  val q25Sql: String =
    s"""WITH t AS (SELECT doc_id, ${DuckSql.tokensSql} AS ws, lower(text) AS lt
       |  FROM documents)
       |SELECT doc_id, ${DuckSql.polyHashSql("lt")} AS content_hash,
       |  list_min(${DuckSql.shingleHashesSql("ws", 3)}) AS min_shingle_hash
       |FROM t ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q22_lang_id"     -> (q22LangId _),
    "q23_quality"     -> (q23Quality _),
    "q24_token_count" -> (q24TokenCount _),
    "q25_fingerprint" -> (q25Fingerprint _),
  )

  val oracles: Map[String, String] = Map(
    "q22_lang_id"     -> q22Sql,
    "q23_quality"     -> q23Sql,
    "q24_token_count" -> q24Sql,
    "q25_fingerprint" -> q25Sql,
  )
}
