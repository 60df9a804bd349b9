package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Bucketing

/** O2 co-location: bucketed tables join with ZERO exchanges (the write-time
  * shuffle is reused), and results equal the shuffled join. */
class BucketingSpec extends AnyFunSuite with SparkSpecBase {

  test("bucketed fact-fact join plans no Exchange and matches shuffled results") {
    // the in-memory catalog forgets managed tables between JVMs but their
    // warehouse dirs survive — clear both before writing
    for (t <- Seq("b_orders", "b_lineitem")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val dir = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(): Unit
      }
      rm(dir)
    }
    val orders = Tables.orders(spark, sfSmoke)
    val lineitem = Tables.lineitem(spark, sfSmoke)
    Bucketing.writeBucketed(orders.select($"o_orderkey", $"o_totalprice"),
      "b_orders", "o_orderkey", 4)
    Bucketing.writeBucketed(
      lineitem.select($"l_orderkey".as("o_orderkey"), $"l_quantity"),
      "b_lineitem", "o_orderkey", 4)

    // fixture tables are broadcast-small; force the merge join that a
    // fact-fact join would get at scale — that is the plan bucketing serves
    val joined = spark.table("b_orders").hint("merge")
      .join(spark.table("b_lineitem").hint("merge"), "o_orderkey")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan) // both sides read pre-bucketed
    assert(plan.contains("SortMergeJoin"), plan)

    val got = joined.agg(count(lit(1)), round(sum($"l_quantity"), 2)).collect().head
    val want = orders.join(lineitem, $"o_orderkey" === $"l_orderkey")
      .agg(count(lit(1)), round(sum($"l_quantity"), 2)).collect().head
    assert(got == want)
  }

  private implicit class Dollar(val sc: StringContext) {
    def $(args: Any*): org.apache.spark.sql.Column =
      org.apache.spark.sql.functions.col(sc.s(args: _*))
  }
}
