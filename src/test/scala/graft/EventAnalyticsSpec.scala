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

  test("q84: SCD2 intervals tile each user's timeline without overlap") {
    val rows = SparkEntry.queries("q84_scd2")(spark, sfSmoke)
      .orderBy($"user_id", $"valid_from").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).values.foreach { g =>
      // consecutive intervals chain exactly; only the last is current/open
      g.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getLong(2) == b.getLong(1), "valid_to must equal next valid_from")
          assert(!a.getBoolean(4))
        case _ =>
      }
      assert(g.last.getBoolean(4) && g.last.getLong(2) == Long.MaxValue)
    }
  }

  test("q85: grouping sets expand 3x, one scan, levels partition the count") {
    val q = SparkEntry.queries("q85_grouping_sets")(spark, sfSmoke)
    val total = Tables.documents(spark, sfSmoke).count()
    val byGid = q.groupBy($"gid").agg(sum($"n_docs")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // gid 1 = by-source, gid 2 = by-lang, gid 3 = grand total
    assert(byGid.keySet == Set(1L, 2L, 3L))
    byGid.values.foreach(v => assert(v == total))
    val plan = q.queryExecution.sparkPlan.toString
    assert("Scan parquet".r.findAllIn(plan).size == 1, s"one scan:\n$plan")
    assert(plan.contains("Expand"))
  }

  test("q86: segments are disjoint and cover clickers union purchasers") {
    val rows = SparkEntry.queries("q86_set_ops")(spark, sfSmoke).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(rows.map(_._1).distinct.length == rows.length, "one segment per user")
    val seg = rows.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(seg.keySet.subsetOf(Set("both", "click_only", "purchase_only")))
  }

  test("q87: the correlated subquery decorrelates (no per-row subplan)") {
    val q = SparkEntry.queries("q87_correlated_subquery")(spark, sfSmoke)
    val plan = q.queryExecution.sparkPlan.toString
    assert(!plan.toLowerCase.contains("subquery"),
      s"expected decorrelated join+agg, got:\n$plan")
    assert(q.count() > 0)
  }

  test("q88: RANGE frame equals a brute-force 30-day trailing sum") {
    val rows = SparkEntry.queries("q88_range_frame")(spark, sfSmoke)
      .select($"o_custkey", $"day", $"price", $"trail30").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val byCust = rows.groupBy(_._1)
    rows.foreach { case (c, d, _, t30) =>
      val expect = byCust(c).filter(r => r._2 >= d - 29 && r._2 <= d).map(_._3).sum
      assert(math.abs(t30 - expect) < 0.02, s"cust $c day $d: $t30 vs $expect")
    }
  }

  test("q80: stateful sessionizer output equals the relational q36 form") {
    val a = SparkEntry.queries("q80_stateful_sessions")(spark, sfSmoke).collect()
    val b = SparkEntry.queries("q36_sessionize")(spark, sfSmoke).collect()
    assert(a.map(_.toSeq).toSet == b.map(_.toSeq).toSet && a.nonEmpty)
  }

  test("q232's Kadane prefix trick equals brute-force max subarray on the demeaned daily series") {
    // both engines replay the SAME formula, so the oracle gate alone
    // can't catch a wrong formula — pin it against O(n²) enumeration
    // on the real fixture's per-type demeaned series
    val daily = Tables.events(spark, sfSmoke)
      .groupBy($"event_type", to_date($"ts").as("day"))
      .agg(sum($"value".cast("decimal(28,6)")).as("dv"))
      .collect()
      .groupBy(_.getString(0))
    val got = SparkEntry.queries("q232_best_run")(spark, sfSmoke)
      .collect().map(r =>
        r.getString(0) -> r.getAs[Double]("best_run")).toMap
    daily.foreach { case (et, rows) =>
      val decs = rows.sortBy(_.getDate(1).toString).map(_.getDecimal(2))
      val dvs = decs.map(_.doubleValue())
      // mean EXACTLY as the engine: exact decimal sum, then one double div
      val mean = decs.reduce(_ add _).doubleValue() / dvs.length
      val dev = dvs.map(v => math.round((v - mean) * 1e6))
      val brute = (for {
        i <- dev.indices; j <- i until dev.length
      } yield dev.slice(i, j + 1).sum).max
      val expect = math.round(brute / 1e6 * 100) / 100.0
      assert(got(et) == expect, s"$et: kadane ${got(et)} vs brute $expect")
    }
  }
}
