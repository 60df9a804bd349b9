package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.PlanGuard

/** PlanGuard: the packaged scale-hazard linter. Detector tests build
  * knowingly-bad plans; the sweep asserts the ENTIRE query surface is
  * free of ERROR-grade shapes — the suite-wide form of the per-query
  * plan assertions elsewhere. */
class PlanGuardSpec extends AnyFunSuite with SparkSpecBase {
  import spark.implicits._

  test("detects a cartesian product") {
    val a = (1 to 100).toDF("x")
    val b = (1 to 100).toDF("y")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val fs = PlanGuard.audit(a.crossJoin(b))
      assert(fs.exists(f => f.rule == "cartesian-product" && f.severity == "error"),
        fs.mkString("\n"))
      intercept[IllegalStateException](PlanGuard.assertScaleSafe(a.crossJoin(b)))
      // allowlisted rule passes
      PlanGuard.assertScaleSafe(a.crossJoin(b), allow = Set("cartesian-product"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("detects a global window (empty PARTITION BY)") {
    val df = (1 to 100).toDF("x")
      .withColumn("rn", row_number().over(Window.orderBy($"x")))
    val fs = PlanGuard.audit(df)
    assert(fs.exists(f => f.rule == "global-window" && f.severity == "error"),
      fs.mkString("\n"))
    // a PARTITIONED window is fine
    val ok = (1 to 100).map(i => (i % 3, i)).toDF("g", "x")
      .withColumn("rn", row_number().over(
        Window.partitionBy($"g").orderBy($"x")))
    assert(!PlanGuard.audit(ok).exists(_.severity == "error"))
  }

  test("flags nested-loop joins as WARN, not error") {
    val facts = (1 to 100).toDF("x")
    val scalar = Seq(42).toDF("t") // 1-row broadcast frame: the q06 pattern
    val fs = PlanGuard.audit(facts.crossJoin(broadcast(scalar)))
    assert(fs.exists(_.rule == "nested-loop-join"))
    assert(!fs.exists(_.severity == "error"), fs.mkString("\n"))
    PlanGuard.assertScaleSafe(facts.crossJoin(broadcast(scalar))) // no throw
  }

  test("clean aggregation plan has no findings") {
    val df = Tables.lineitem(spark, sfSmoke)
      .groupBy($"l_returnflag").agg(sum($"l_quantity"))
    assert(PlanGuard.audit(df).isEmpty)
  }

  test("suite sweep: no ERROR-grade plan shape in any registered query") {
    // builds every query's frame (some run internal stat actions) and
    // audits the physical plan — the machine-checked version of
    // VERDICT's 'scale-killers checked and absent'
    val errors = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val fs = try PlanGuard.audit(fn(spark, sfSmoke))
        catch { case e: Throwable => fail(s"$name failed to plan: $e") }
        fs.filter(_.severity == "error").map(f => s"$name -> $f")
    }
    assert(errors.isEmpty, errors.mkString("\n"))
  }
}
