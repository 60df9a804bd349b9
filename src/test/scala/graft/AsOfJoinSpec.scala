package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.AsOfJoin

class AsOfJoinSpec extends AnyFunSuite with SparkSpecBase {
  import spark.implicits._

  private def left = Seq(
    (1L, 10L, "a"), (1L, 20L, "b"), (1L, 5L, "c"),
    (2L, 7L, "d"), (3L, 100L, "e")
  ).toDF("k", "t", "tag")

  private def right = Seq(
    (1L, 8L, 1.5), (1L, 10L, 2.5), (1L, 19L, 3.5),
    (2L, 9L, 9.9), (4L, 1L, 0.0)
  ).toDF("k", "rt", "price")

  test("picks the greatest right time <= left time, inclusive at equality") {
    val out = AsOfJoin.leftAsOf(left, right, Seq("k"), "t", "rt")
      .orderBy($"k", $"t")
      .select($"k", $"t", $"tag", $"rt", $"price")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) -9.9 else r.getDouble(4)))
    assert(out.toSeq == Seq(
      (1L, 5L, "c", -1L, -9.9),   // nothing at or before 5
      (1L, 10L, "a", 10L, 2.5),         // equality is inclusive
      (1L, 20L, "b", 19L, 3.5),
      (2L, 7L, "d", -1L, -9.9),   // right row exists but later
      (3L, 100L, "e", -1L, -9.9)  // key absent on the right
    ))
  }

  test("right row with null payload still wins the as-of race") {
    val r2 = Seq((1L, 8L, Some(1.5)), (1L, 15L, None))
      .toDF("k", "rt", "price")
    val out = AsOfJoin.leftAsOf(Seq((1L, 20L)).toDF("k", "t"), r2,
        Seq("k"), "t", "rt")
      .select($"rt", $"price").collect().head
    // the t=15 null-priced row matches — NOT the older 1.5
    assert(out.getLong(0) == 15L && out.isNullAt(1))
  }

  test("single hash exchange on the key — no range-join explosion") {
    val plan = AsOfJoin.leftAsOf(left, right, Seq("k"), "t", "rt")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 keyed exchange, plan:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("q72 smoke: every click row appears exactly once") {
    val q = SparkEntry.queries("q72_asof_join")(spark, sfSmoke)
    val n = q.count()
    val clicks = Tables.events(spark, sfSmoke)
      .filter($"event_type" === "click").count()
    assert(n == clicks)
    // matched purchases never postdate their click
    assert(q.filter($"purchase_us" > $"click_us").count() == 0)
  }
}
