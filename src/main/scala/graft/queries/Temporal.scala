package graft.queries

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.lineitem
import graft.model.{AnnualMeanDataset, Envelope}
import graft.geo.Envelopes
import graft.plan.ScenePlanner
import graft.ops.Incremental
import graft.time.TemporalGrid

/** Temporal-grid + scene-planning operator coverage (SURVEY §2.5 W1-W4,
  * §2.8 U3/U4, §2.3 J3/J4) as oracle-checkable queries.
  *
  * q13-q15 exercise the period/snap column math on the lineitem fact table;
  * q16-q19 run the actual engine planner (tile grid × window expansion ×
  * deterministic URLs × incremental anti-join) against fixed query literals,
  * with the oracle recomputing the same formulas in SQL — the constants are
  * never hand-derived on the oracle side.
  */
object Temporal {

  private val Env = Envelope(-3.5, 40.2, 2.3, 43.8)
  private val Times = Seq(Timestamp.valueOf("2021-06-15 00:00:00"),
                          Timestamp.valueOf("2022-06-15 00:00:00"))

  /** W1: tumbling annual snap + count (snap_to_temporal_grid). */
  def q13SnapYear(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    lineitem(s, d)
      .groupBy(TemporalGrid.snapToYear($"l_shipdate").cast("date").as("year_start"))
      .agg(count(lit(1)).as("n"), QueryUtil.safeSum($"l_quantity", 2).as("qty"))
      .orderBy($"year_start")
  }

  val q13Sql: String =
    s"""SELECT CAST(date_trunc('year', l_shipdate) AS DATE) AS year_start,
      |  count(*) AS n, ${QueryUtil.safeSumSql("l_quantity", 2)} AS qty
      |FROM lineitem GROUP BY 1 ORDER BY year_start""".stripMargin

  /** W3: 16-day period bucketing (epoch-1997 arithmetic) over the fact
    * table — stays inside whole-stage codegen, no UDF. */
  def q14PeriodBucket(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    lineitem(s, d)
      .groupBy(TemporalGrid.datetimeToPeriod($"l_shipdate").as("period"))
      .agg(count(lit(1)).as("n"),
           QueryUtil.safeAvg($"l_extendedprice", 2).as("avg_price"))
      .orderBy($"period")
  }

  val q14Sql: String =
    s"""SELECT 392 + 23*(year(l_shipdate)-1997) + (dayofyear(l_shipdate)-1)//16 AS period,
       |  count(*) AS n, ${QueryUtil.safeAvgSql("l_extendedprice", 2)} AS avg_price
       |FROM lineitem GROUP BY 1 ORDER BY period""".stripMargin

  /** W3 inverse: period → period-start date round-trip on the distinct
    * periods present in the data. */
  def q15PeriodRoundtrip(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    lineitem(s, d)
      .select(TemporalGrid.datetimeToPeriod($"l_shipdate").as("period"))
      .distinct()
      .select($"period",
        TemporalGrid.periodToDatetime($"period").cast("date").as("period_start"))
      .orderBy($"period")
  }

  // NB: DuckDB's // truncates toward zero; the reference's Python // floors.
  // They differ for pre-1997 (negative-offset) periods, so the oracle floors
  // explicitly.
  val q15Sql: String =
    """SELECT period,
      |  CAST(make_date(1997 + CAST(floor((period-392)/23.0) AS BIGINT), 1, 1)
      |    + INTERVAL ((period - (392 + CAST(floor((period-392)/23.0) AS BIGINT)*23)) * 16) DAY
      |    AS DATE) AS period_start
      |FROM (SELECT DISTINCT
      |    392 + 23*(year(l_shipdate)-1997) + (dayofyear(l_shipdate)-1)//16 AS period
      |  FROM lineitem) ORDER BY period""".stripMargin

  private val oracleTiles =
    """tiles AS (SELECT
      |    CAST(lon AS DOUBLE) AS xmin, CAST(lat AS DOUBLE) AS ymin,
      |    CAST(lon+1 AS DOUBLE) AS xmax, CAST(lat+1 AS DOUBLE) AS ymax,
      |    printf('%03d%s_%d%s', abs(lon)::int,
      |           CASE WHEN lon<0 THEN 'W' ELSE 'E' END,
      |           abs(lat+1)::int,
      |           CASE WHEN lat+1<0 THEN 'S' ELSE 'N' END) AS tile_id
      |  FROM (SELECT range AS lon FROM range(-4,3))
      |  CROSS JOIN (SELECT range AS lat FROM range(40,44)))""".stripMargin

  private val oraclePeriods =
    """snapped AS (SELECT DISTINCT date_trunc('year', t) AS st
      |  FROM (VALUES (TIMESTAMP '2021-06-15'), (TIMESTAMP '2022-06-15')) times(t)),
      |bounds AS (SELECT
      |    392 + 23*(year(greatest(st - INTERVAL 365 DAY, TIMESTAMP '2020-01-01'))-1997)
      |      + (dayofyear(greatest(st - INTERVAL 365 DAY, TIMESTAMP '2020-01-01'))-1)//16 AS p0,
      |    392 + 23*(year(least(st, TIMESTAMP '2024-12-31'))-1997)
      |      + (dayofyear(least(st, TIMESTAMP '2024-12-31'))-1)//16 AS p1
      |  FROM snapped),
      |periods AS (SELECT DISTINCT unnest(range(p0, p1+1)) AS period FROM bounds)""".stripMargin

  /** U4: full required-scenes expansion — tile grid ∩ query envelope (J1),
    * × deduped window periods (W2/J4), scene URLs (F2), period→datetime (W3).
    * The engine side is ScenePlanner.requiredScenes verbatim. */
  def q16RequiredScenes(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val grid = Envelopes.tileGrid(s, Env)
    ScenePlanner.requiredScenes(s, grid, Env, Times, AnnualMeanDataset)
      .select($"datetime".cast("date").as("datetime"), $"url", $"tile_id", $"feature")
      .orderBy($"url")
  }

  val q16Sql: String =
    s"""WITH $oracleTiles,
       |$oraclePeriods
       |SELECT CAST(make_date(1997 + (period-392)//23, 1, 1)
       |    + INTERVAL ((period - (392 + ((period-392)//23)*23)) * 16) DAY AS TIMESTAMP)::DATE
       |    AS datetime,
       |  printf('s3://source.scenes/data/tiles/%s/%s/%d.tif',
       |    split_part(tile_id,'_',-1), tile_id, period) AS url,
       |  tile_id, 'annual_mean' AS feature
       |FROM tiles CROSS JOIN periods
       |WHERE xmin <= 2.3 AND -3.5 <= xmax AND ymin <= 43.8 AND 40.2 <= ymax
       |ORDER BY url""".stripMargin

  /** E3/F5: deterministic feature URLs per (tile × snapped time). */
  def q17TileDateUrls(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val grid = Envelopes.tileGrid(s, Env)
    ScenePlanner.tileDateUrls(s, grid, Env, Times, AnnualMeanDataset, "s3://dst.bucket")
      .select($"tile_id", $"time".cast("date").as("time"), $"url", $"feature")
      .orderBy($"url")
  }

  val q17Sql: String =
    s"""WITH $oracleTiles,
       |snapped AS (SELECT DISTINCT date_trunc('year', t) AS time
       |  FROM (VALUES (TIMESTAMP '2021-06-15'), (TIMESTAMP '2022-06-15')) times(t))
       |SELECT tile_id, CAST(time AS DATE) AS time,
       |  concat_ws('/', 's3://dst.bucket', 'features', 'annual_mean', tile_id,
       |    strftime(time, '%Y%m%d') || '.tif') AS url,
       |  'annual_mean' AS feature
       |FROM tiles CROSS JOIN snapped
       |WHERE xmin <= 2.3 AND -3.5 <= xmax AND ymin <= 43.8 AND 40.2 <= ymax
       |ORDER BY url""".stripMargin

  /** J3: incremental anti-join — required scenes minus an "already ingested"
    * listing (here: every even period), the reference's core memoization
    * pattern (scenes.py:115-138). */
  def q18IncrementalMissing(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val grid = Envelopes.tileGrid(s, Env)
    val required = ScenePlanner.requiredScenes(s, grid, Env, Times, AnnualMeanDataset)
    val existing = required
      .filter(TemporalGrid.datetimeToPeriod($"datetime") % 2 === 0)
      .select($"url")
    Incremental.missing(required, existing, "url")
      .select($"url", $"tile_id")
      .orderBy($"url")
  }

  val q18Sql: String =
    s"""WITH $oracleTiles,
       |$oraclePeriods
       |SELECT printf('s3://source.scenes/data/tiles/%s/%s/%d.tif',
       |    split_part(tile_id,'_',-1), tile_id, period) AS url, tile_id
       |FROM tiles CROSS JOIN periods
       |WHERE xmin <= 2.3 AND -3.5 <= xmax AND ymin <= 43.8 AND 40.2 <= ymax
       |  AND period % 2 <> 0
       |ORDER BY url""".stripMargin

  /** F1: object-store URL → GDAL VSI path rewrite (mosaics.py:74-76) over
    * the q17 URL set; the gs_location column exercises the gs:// branch on
    * the same key space. */
  def q39UrlRewrite(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import graft.model.Urls.gdalVsiLocation
    q17TileDateUrls(s, d)
      .select($"tile_id", $"time",
        gdalVsiLocation($"url").as("location"),
        gdalVsiLocation(replace($"url", lit("s3://"), lit("gs://")))
          .as("gs_location"))
      .orderBy($"location")
  }

  val q39Sql: String =
    s"""WITH q17 AS (${q17Sql.replace("ORDER BY url", "")})
       |SELECT tile_id, time,
       |  replace(replace(url, 'gs://', '/vsigs/'), 's3://', '/vsis3/')
       |    AS location,
       |  replace(replace(replace(url, 's3://', 'gs://'), 'gs://', '/vsigs/'),
       |    's3://', '/vsis3/') AS gs_location
       |FROM q17 ORDER BY location""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q39_url_rewrite"         -> (q39UrlRewrite _),
    "q13_snap_year"           -> (q13SnapYear _),
    "q14_period_bucket"       -> (q14PeriodBucket _),
    "q15_period_roundtrip"    -> (q15PeriodRoundtrip _),
    "q16_required_scenes"     -> (q16RequiredScenes _),
    "q17_tile_date_urls"      -> (q17TileDateUrls _),
    "q18_incremental_missing" -> (q18IncrementalMissing _),
  )

  val oracles: Map[String, String] = Map(
    "q39_url_rewrite"         -> q39Sql,
    "q13_snap_year"           -> q13Sql,
    "q14_period_bucket"       -> q14Sql,
    "q15_period_roundtrip"    -> q15Sql,
    "q16_required_scenes"     -> q16Sql,
    "q17_tile_date_urls"      -> q17Sql,
    "q18_incremental_missing" -> q18Sql,
  )
}
