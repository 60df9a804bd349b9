package graft

import java.time.LocalDate
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.apache.spark.sql.functions._
import graft.time.TemporalGrid

class TemporalGridSpec extends AnyFunSuite with SparkSpecBase {

  /** Scala re-statement of the reference formulas (glad.py:28-36) used as
    * the property-test oracle for the Column implementations. */
  private def refPeriod(d: LocalDate): Long =
    392L + 23L * (d.getYear - 1997) + (d.getDayOfYear - 1) / 16
  private def refPeriodStart(p: Long): LocalDate = {
    val yearOffset = Math.floorDiv(p - 392, 23)
    val interval = p - (392 + yearOffset * 23)
    LocalDate.of(1997 + yearOffset.toInt, 1, 1).plusDays(interval * 16)
  }

  private val dates: Gen[LocalDate] =
    Gen.choose(0L, 365L * 60).map(LocalDate.of(1990, 1, 1).plusDays(_))

  test("datetimeToPeriod matches the reference formula across 60 years") {
    import spark.implicits._
    val sample = Gen.listOfN(300, dates).sample.get
    val got = sample.map(_.toString).toDF("d")
      .select($"d", TemporalGrid.datetimeToPeriod(to_timestamp($"d")).as("p"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    sample.foreach { d =>
      assert(got(d.toString) == refPeriod(d), s"date $d")
    }
  }

  test("periodToDatetime inverts datetimeToPeriod onto period starts") {
    import spark.implicits._
    val periods = (300L to 1100L by 7).toDF("p")
      .select($"p", TemporalGrid.periodToDatetime($"p").cast("date").as("start"))
      .collect()
    periods.foreach { r =>
      val p = r.getLong(0)
      assert(r.getDate(1).toLocalDate == refPeriodStart(p), s"period $p")
    }
  }

  test("windowPeriods clamps to [earliest, latest] and is inclusive") {
    import spark.implicits._
    val df = Seq("2021-01-01", "2020-01-05", "2030-01-01").toDF("t")
      .select(TemporalGrid.windowPeriods(to_timestamp($"t"), 365,
        to_timestamp(lit("2020-01-01")), to_timestamp(lit("2024-12-31"))).as("ps"))
    val rows = df.collect().map(_.getSeq[Long](0))
    // 2021-01-01: [max(2020-01-02, earliest) .. 2021-01-01] = p921..p944
    assert(rows(0).head == 921 && rows(0).last == 944)
    // 2020-01-05: window start clamps to earliest 2020-01-01 = p921
    assert(rows(1).head == 921 && rows(1).last == 921)
    // 2030-01-01: end clamps to latest 2024-12-31
    assert(rows(2).last == refPeriod(LocalDate.of(2024, 12, 31)))
  }

  test("tile grid covers envelope with GLAD-style ids") {
    import graft.geo.Envelopes
    import graft.model.Envelope
    val g = Envelopes.tileGrid(spark, Envelope(-3.5, 40.2, 2.3, 43.8))
    val rows = g.collect()
    assert(rows.length == 7 * 4)
    val ids = rows.map(_.getAs[String]("tile_id")).toSet
    assert(ids.contains("004W_41N"), ids.mkString(","))
    assert(ids.contains("002E_44N"), ids.mkString(","))
  }

  test("nanos->micros conversion floors for negative (pre-1970) epochs too") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // ns -> expected floor(ns/1000) micros, exact integer semantics
    val cases = Seq(
      (1500L, 1L), (999L, 0L), (1000L, 1L), (0L, 0L),
      (-1L, -1L), (-999L, -1L), (-1000L, -1L), (-1001L, -2L), (-1500L, -2L),
      // 1969-12-31T23:59:59.999999999 -> -1 micro (floor), not 0 (truncate)
      (-1L, -1L))
    val got = cases.map(_._1).toDF("ts")
      .select(Tables.nanosFloorMicros(col("ts")).as("us"))
      .as[Long].collect().toSeq
    assert(got == cases.map(_._2), got.toString)
  }
}
