package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL corpus interchange — the wire format public text corpora ship
  * in (one JSON document per line). Reads are SCHEMA-ON-READ with an
  * explicit schema: no inference pass over the data (at 100 TB the
  * inference scan would cost a full read before the first real one),
  * and malformed lines land in a quarantine column instead of killing
  * the job or silently vanishing — an ingest pipeline must be able to
  * COUNT its rejects ([[readJsonl]] returns them side-by-side).
  */
object CorpusInterchange {

  /** The documents-table schema, nullable (JSONL fields may be absent —
    * presence is a VALIDATION concern, not a parse error). */
  val DocumentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Read a JSONL corpus: (clean rows in the documents schema, quarantined
    * raw lines). PERMISSIVE mode parses what it can; a line that fails
    * JSON parsing entirely carries its raw text in the corrupt column. */
  def readJsonl(spark: SparkSession, path: String)
      : (DataFrame, DataFrame) = {
    val withCorrupt = StructType(
      DocumentsSchema.fields :+ StructField("_corrupt", StringType))
    // Spark refuses plans that read ONLY the corrupt column straight off
    // the raw source (the parse wouldn't otherwise run) — the documented
    // contract is to materialize the parsed result first, so the raw
    // frame persists (released by the session's ScratchCache sweep)
    val raw = ScratchCache.register(spark.read.schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(path)
      .persist())
    val clean = raw.filter(col("_corrupt").isNull)
      .select(DocumentsSchema.fieldNames.map(col).toSeq: _*)
    val rejects = raw.filter(col("_corrupt").isNotNull)
      .select(col("_corrupt").as("raw_line"))
    (clean, rejects)
  }

  /** Write the corpus as JSONL (one doc per line, gzip-friendly text). */
  def writeJsonl(docs: DataFrame, path: String): Unit =
    docs.select(DocumentsSchema.fieldNames.map(col).toSeq: _*)
      .write.mode(SaveMode.Overwrite).json(path)
}
