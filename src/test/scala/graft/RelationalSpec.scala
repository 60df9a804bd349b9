package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Relational

class RelationalSpec extends AnyFunSuite with SparkSpecBase {

  test("every relational query runs at sf0.001 and has an oracle twin") {
    assert(Relational.queries.keySet == Relational.oracles.keySet)
    Relational.queries.foreach { case (name, fn) =>
      val df = fn(spark, sfSmoke)
      val n = df.count()
      assert(n >= 0, s"$name failed")
    }
  }

  test("l_quantity is integral — the precondition for q208/q209's exact BIGINT threshold math") {
    val n = Tables.lineitem(spark, sfSmoke)
      .filter("l_quantity <> floor(l_quantity)").count()
    assert(n == 0, s"$n non-integral quantities; q208/q209 BIGINT casts would truncate")
  }

  test("q01 aggregates match a hand check") {
    val rows = Relational.q01PricingSummary(spark, sfSmoke).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("count_order")).sum
    val li = Tables.lineitem(spark, sfSmoke)
      .filter("l_shipdate <= timestamp'1998-09-02'").count()
    assert(total == li)
  }

  test("q06 cross join has |region| * |nation| rows") {
    val n = Relational.q06CrossJoin(spark, sfSmoke).count()
    assert(n == 5 * 25)
  }

  test("q11 topk is sorted desc and bounded") {
    val prices = Relational.q11TopK(spark, sfSmoke).collect()
      .map(_.getAs[Double]("price"))
    assert(prices.length == 10)
    assert(prices.sameElements(prices.sorted(Ordering[Double].reverse)))
  }

  test("broadcast join plan actually broadcasts the dim side") {
    val plan = Relational.q03BroadcastJoin(spark, sfSmoke)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join in:\n$plan")
  }

  test("filter/projection reach the parquet scan") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val exec = Relational.q02FilterProject(spark, sfSmoke)
      .queryExecution.sparkPlan // pre-AQE plan exposes the raw scan nodes
    val scans = exec.collectLeaves().collect { case f: FileSourceScanExec => f }
    assert(scans.nonEmpty, exec.toString)
    val pushed = scans.head.metadata("PushedFilters")
    assert(pushed.contains("GreaterThan(l_quantity"), pushed)
    assert(pushed.contains("l_shipdate"), pushed)
    // column pruning: scan must read only the 5 referenced columns
    assert(scans.head.output.length == 5, scans.head.output.mkString(","))
  }
}
