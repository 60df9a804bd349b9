package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class EventAnalyticsSpec extends AnyFunSuite with SparkSpecBase {
  import spark.implicits._

  test("q77: every event lands in exactly windowDuration/slide = 2 windows") {
    val q = SparkEntry.queries("q77_sliding_window")(spark, sfSmoke)
    val winRows = q.agg(sum($"n")).head().getLong(0)
    val nEvents = Tables.events(spark, sfSmoke).count()
    assert(winRows == 2 * nEvents)
  }

  test("q78: funnel stages are strictly ordered and within the 7-day cap") {
    val rows = SparkEntry.queries("q78_funnel")(spark, sfSmoke).collect()
    assert(rows.nonEmpty)
    val week = 7L * 86400000000L
    rows.foreach { r =>
      val t1 = r.getLong(1)
      val t2 = if (r.isNullAt(2)) None else Some(r.getLong(2))
      val t3 = if (r.isNullAt(3)) None else Some(r.getLong(3))
      val depth = r.getLong(4)
      assert(depth == 1 + t2.size + t3.size)
      t2.foreach(t => assert(t > t1 && t <= t1 + week))
      (t2, t3) match {
        case (Some(a), Some(b)) => assert(b > a && b <= a + week)
        case (None, Some(_)) => fail("t3 without t2")
        case _ =>
      }
    }
  }

  test("q79: offset-0 actives per cohort sum to the distinct user count") {
    val q = SparkEntry.queries("q79_cohort")(spark, sfSmoke)
    val zero = q.filter($"week_offset" === 0).agg(sum($"active_users")).head().getLong(0)
    val users = Tables.events(spark, sfSmoke).select($"user_id").distinct().count()
    assert(zero == users)
    // offsets never negative, actives never exceed cohort size at offset 0
    assert(q.filter($"week_offset" < 0).count() == 0)
  }

  test("q80: stateful sessionizer output equals the relational q36 form") {
    val a = SparkEntry.queries("q80_stateful_sessions")(spark, sfSmoke).collect()
    val b = SparkEntry.queries("q36_sessionize")(spark, sfSmoke).collect()
    assert(a.map(_.toSeq).toSet == b.map(_.toSeq).toSet && a.nonEmpty)
  }
}
