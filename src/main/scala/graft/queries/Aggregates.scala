package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.{events, lineitem}
import graft.agg.TemporalReduce

/** Aggregation-operator coverage (SURVEY §2.4): masked mean (A3), exact
  * holistic median via the engine's own Aggregator (A4), spatial coarsen
  * (A7) — each oracle-checked against DuckDB.
  */
object Aggregates {

  /** A3/P4: masked mean — avg over a predicate-masked value, null-skipping,
    * the relational form of `array.where(qa == 1).mean("time")`
    * (glad.py:259-265). Also emits the unmasked count to pin null semantics. */
  def q19MaskedMean(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    events(s, d)
      .groupBy(($"user_id" % 100).cast("bigint").as("user_bucket"))
      .agg(
        QueryUtil.safeAvg(when($"event_type" === "click", $"value"), 2)
          .as("masked_mean"),
        count(when($"event_type" === "click", lit(1))).as("n_ok"),
        count(lit(1)).as("n_total"))
      .orderBy($"user_bucket")
  }

  val q19Sql: String =
    s"""SELECT CAST(user_id % 100 AS BIGINT) AS user_bucket,
       |  ${QueryUtil.safeAvgSql("CASE WHEN event_type = 'click' THEN value END", 2)}
       |    AS masked_mean,
       |  count(CASE WHEN event_type = 'click' THEN 1 END) AS n_ok,
       |  count(*) AS n_total
       |FROM events GROUP BY 1 ORDER BY user_bucket""".stripMargin

  /** A4: exact median through the engine's holistic MedianAggregator (not
    * Spark's builtin percentile) — numpy/DuckDB semantics: mean of the two
    * middle values on even counts. */
  def q20MaskedMedian(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    lineitem(s, d)
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        round(TemporalReduce.medianUdaf($"l_quantity"), 2).as("median_qty"),
        round(TemporalReduce.medianUdaf(
          when($"l_discount" > 0.02, $"l_extendedprice")), 2).as("median_masked_price"),
        count(lit(1)).as("n"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val q20Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  round(median(l_quantity), 2) AS median_qty,
      |  round(median(CASE WHEN l_discount > 0.02 THEN l_extendedprice END), 2)
      |    AS median_masked_price,
      |  count(*) AS n
      |FROM lineitem GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** A7: coarsen — grid-cell downsample aggregation (coarsen().mean(),
    * flyte/utils.py:100-112) over an (x, y)-bucketed fact grid. */
  def q21Coarsen(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    events(s, d)
      .groupBy(
        floor($"user_id" / 10).cast("bigint").as("gy"),
        floor($"value" / 5).cast("bigint").as("gx"))
      .agg(QueryUtil.safeAvg($"value", 2).as("mean_v"), count(lit(1)).as("n"))
      .orderBy($"gy", $"gx")
  }

  val q21Sql: String =
    s"""SELECT CAST(floor(user_id / 10) AS BIGINT) AS gy,
       |  CAST(floor(value / 5) AS BIGINT) AS gx,
       |  ${QueryUtil.safeAvgSql("value", 2)} AS mean_v, count(*) AS n
       |FROM events GROUP BY 1, 2 ORDER BY gy, gx""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q19_masked_mean"   -> (q19MaskedMean _),
    "q20_masked_median" -> (q20MaskedMedian _),
    "q21_coarsen"       -> (q21Coarsen _),
  )

  val oracles: Map[String, String] = Map(
    "q19_masked_mean"   -> q19Sql,
    "q20_masked_median" -> q20Sql,
    "q21_coarsen"       -> q21Sql,
  )
}
