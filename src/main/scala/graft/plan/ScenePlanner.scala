package graft.plan

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.{Envelope, TemporalDatasetProtocol}
import graft.geo.Envelopes
import graft.time.TemporalGrid

/** Scene/feature work planning (SURVEY §2.8 U3/U4, §3 E2/E3 step 1).
  *
  * The reference enumerates required source scenes and feature outputs with
  * driver-side Python loops (protocols.py:172-191,318-333; glad.py:245-257).
  * Here the same expansion is a declarative plan: broadcast-size tile dim ×
  * explode(sequence(...)) of the period window × format_string URLs — all
  * generation, zero shuffles, so a 1000-executor run scales by input split,
  * not by join planning.
  */
object ScenePlanner {

  /** U4 / get_required_scenes_gdf: all (datetime, url, tile) scene rows a
    * query (envelope × times) needs. `times` are raw query times; each is
    * window-expanded (W2), the union of period ranges deduped (A6), then
    * cross-joined (J4) with the intersecting tiles (J1). */
  def requiredScenes(spark: SparkSession, grid: DataFrame, query: Envelope,
                     times: Seq[Timestamp], proto: TemporalDatasetProtocol): DataFrame = {
    import spark.implicits._
    val tiles = Envelopes.tilesIntersecting(grid, query)
    val periods = times.toDF("t")
      .select(explode(proto.windowPeriods(proto.snapToTemporalGrid($"t"))).as("period"))
      .distinct()
    tiles.crossJoin(broadcast(periods))
      .select(
        TemporalGrid.periodToDatetime($"period").as("datetime"),
        proto.sceneUrl($"tile_id", $"period").as("url"),
        $"tile_id", $"xmin", $"ymin", $"xmax", $"ymax",
        lit(proto.name).as("feature"))
  }

  /** E3 step 1 / get_tile_date_urls: one deterministic feature-output row per
    * (intersecting tile × snapped time) (protocols.py:318-333). */
  def tileDateUrls(spark: SparkSession, grid: DataFrame, query: Envelope,
                   times: Seq[Timestamp], proto: TemporalDatasetProtocol,
                   bucket: String): DataFrame = {
    import spark.implicits._
    val tiles = Envelopes.tilesIntersecting(grid, query).select($"tile_id")
    val snapped = times.toDF("t")
      .select(proto.snapToTemporalGrid($"t").as("time")).distinct()
    tiles.crossJoin(broadcast(snapped))
      .select($"tile_id", $"time",
        proto.featureUrl(bucket, $"tile_id", $"time").as("url"),
        lit(proto.name).as("feature"))
  }
}
