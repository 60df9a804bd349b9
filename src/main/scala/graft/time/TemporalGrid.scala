package graft.time

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Temporal-grid column expressions (SURVEY §2.5 W1-W4).
  *
  * Reproduces the reference's 16-day period arithmetic — 23 periods/year,
  * epoch 1997, period 392 = 1997-01-01 (flytemosaic/datasets/glad.py:28-36) —
  * as pure Catalyst expressions: whole-stage-codegen'd column math, no UDFs,
  * so the 100 TB path keeps these inside the scan's codegen stage.
  */
object TemporalGrid {

  val PeriodEpochYear = 1997
  val PeriodBase      = 392
  val PeriodsPerYear  = 23
  val PeriodDays      = 16

  /** W3: timestamp → integer 16-day period
    * (glad.py:33-36: `392 + 23*(year-1997) + daysSinceJan1 // 16`). */
  def datetimeToPeriod(ts: Column): Column = {
    val daysIntoYear = datediff(ts.cast("date"), trunc(ts.cast("date"), "year"))
    (lit(PeriodBase) + lit(PeriodsPerYear) * (year(ts) - lit(PeriodEpochYear)) +
      floor(daysIntoYear / lit(PeriodDays))).cast("bigint")
  }

  /** W3 inverse: period → timestamp of the period start (glad.py:28-31).
    * Uses floor division so pre-epoch periods behave like Python's `//`. */
  def periodToDatetime(p: Column): Column = {
    val yearOffset = floor((p - lit(PeriodBase)).cast("double") / lit(PeriodsPerYear)).cast("int")
    val interval   = (p - (lit(PeriodBase) + yearOffset * lit(PeriodsPerYear))).cast("int")
    to_timestamp(date_add(make_date(lit(PeriodEpochYear) + yearOffset, lit(1), lit(1)),
      interval * lit(PeriodDays)))
  }

  /** W1: snap to the annual temporal grid (glad.py:233-234:
    * `datetime(t.year, 1, 1)`). */
  def snapToYear(ts: Column): Column = date_trunc("year", ts)

  /** W4: clamp a window start/end to dataset availability
    * (glad.py:251-252: `max(t - window, earliest)` / `min(t, latest)`). */
  def clampLo(c: Column, earliest: Column): Column = greatest(c, earliest)
  def clampHi(c: Column, latest: Column): Column   = least(c, latest)

  /** W2: trailing-window period range for a snapped time — the inclusive
    * period sequence for [clamp(t - windowDays), clamp(t)]
    * (protocols.py:178-186 + glad.py:249-253). Generation, not matching:
    * explode(sequence(...)) keeps it shuffle-free. */
  def windowPeriods(ts: Column, windowDays: Int,
                    earliest: Column, latest: Column): Column = {
    val start = datetimeToPeriod(clampLo(ts - expr(s"INTERVAL $windowDays DAYS"), earliest))
    val end   = datetimeToPeriod(clampHi(ts, latest))
    sequence(start, end)
  }
}
