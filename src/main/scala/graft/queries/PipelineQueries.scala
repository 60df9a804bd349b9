package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.Tables.documents
import graft.ops.Multimodal
import graft.functions.TextFunctions.roundp

/** Multimodal + streaming coverage.
  *
  * q33 drives the binary-payload mapPartitions batch path; its byte stats
  * are integer-ratio arithmetic, so even the stubbed decoder is
  * oracle-checkable. q34 runs a real Structured Streaming query
  * (AvailableNow over the events parquet → tumbling 5-minute windows →
  * memory sink) whose result must equal the batch SQL oracle — the
  * batch/stream consistency property.
  */
object PipelineQueries {

  /** q33: multimodal feature extraction over binary payloads.
    *
    * The oracle derives bytes from code points (DuckDB has no blob-unnest),
    * which equals the UTF-8 bytes only for ASCII text — so both sides
    * restrict to ASCII docs EXPLICITLY (octet_length == char length)
    * rather than relying on the fixture happening to be ASCII. */
  def q33Multimodal(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ascii = documents(s, d)
      .filter(octet_length($"text") === length($"text"))
    val media = Multimodal.withPayload(ascii, "text")
    Multimodal.extractFeatures(media, "doc_id").toDF()
      .select($"doc_id", $"n_bytes",
        roundp($"mean_byte", 6).as("mean_byte"),
        roundp(element_at($"feature", 1).cast("double"), 2).as("f0"))
      .orderBy($"doc_id")
  }

  // feature[0] = mean of bytes [0, n/4) — float32 then rounded to 2dp: the
  // float cast is deterministic, and DuckDB mirrors it with ::FLOAT.
  val q33Sql: String =
    s"""WITH b AS (SELECT doc_id,
       |    list_transform(split(text, ''), x -> ascii(x)) AS bytes,
       |    octet_length(encode(text))::BIGINT AS n_bytes
       |  FROM documents
       |  WHERE octet_length(encode(text)) = length(text))
       |SELECT doc_id, n_bytes,
       |  ${DuckSql.roundpSql("list_sum(bytes) * 1.0 / n_bytes", 6)} AS mean_byte,
       |  ${DuckSql.roundpSql(
            "(list_sum(bytes[1:greatest(n_bytes//4, 1)]) * 1.0" +
            " / greatest(n_bytes//4, 1))::FLOAT::DOUBLE", 2)} AS f0
       |FROM b ORDER BY doc_id""".stripMargin

  /** q34: Structured Streaming — AvailableNow batch-catchup over the events
    * parquet, tumbling 5-minute window aggregation, memory sink. Returns
    * the sink table; must equal the batch oracle (stream/batch parity). */
  def q34StreamWindow(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val schema = graft.Tables.load(s, d, "events").schema
    val name = "graft_stream_q34"
    val stream = s.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet") // stream source needs a dir
      .parquet(d)
      .withColumn("ts_conv", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ts_conv", "0 seconds")
      .groupBy(window($"ts_conv", "5 minutes").as("w"), $"event_type")
      .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("sum_v"))
    val q = stream.writeStream
      .format("memory").queryName(name).outputMode("complete")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    s.table(name)
      .select($"w.start".as("win_start"), $"event_type", $"n", $"sum_v")
      .orderBy($"win_start", $"event_type")
  }

  val q34Sql: String =
    """SELECT time_bucket(INTERVAL 5 MINUTE, ts) AS win_start, event_type,
      |  count(*) AS n, round(sum(value), 2) AS sum_v
      |FROM events GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q33_multimodal"    -> (q33Multimodal _),
    "q34_stream_window" -> (q34StreamWindow _),
  )

  val oracles: Map[String, String] = Map(
    "q33_multimodal"    -> q33Sql,
    "q34_stream_window" -> q34Sql,
  )
}
