package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.SizeBatch

class SizeBatchSpec extends AnyFunSuite with SparkSpecBase {
  import spark.implicits._

  /** The semantics being replaced: the (single-reducer) global window. */
  private def windowOracle(rows: Seq[(Long, Long)], budget: Long): Seq[(Long, Long, Long)] = {
    var cum = 0L
    rows.sortBy(_._1).map { case (k, n) =>
      val b = cum / budget
      cum += n
      (k, n, b)
    }
  }

  test("two-pass prefix sum matches the global-window batch ids on documents") {
    val rows = Tables.documents(spark, sfSmoke)
      .select($"doc_id", length($"text").cast("bigint"))
      .as[(Long, Long)]
    val got = SizeBatch.assign(rows, budget = 4096L, parts = 7)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val want = windowOracle(rows.collect().toSeq, 4096L)
    assert(got == want)
    spark.catalog.clearCache()
  }

  test("more partitions than rows (empty range partitions) stays correct") {
    val data = Seq((10L, 5L), (20L, 3L), (30L, 9L), (40L, 2L))
    val got = SizeBatch.assign(data.toDS(), budget = 8L, parts = 16)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == windowOracle(data, 8L))
    spark.catalog.clearCache()
  }

  test("single row larger than the budget still lands alone per the floor rule") {
    val data = Seq((1L, 100L), (2L, 1L), (3L, 1L))
    val got = SizeBatch.assign(data.toDS(), budget = 10L, parts = 2)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    // row 1 starts at offset 0 -> batch 0; row 2 at 100 -> batch 10; row 3 at 101 -> batch 10
    assert(got == Seq((1L, 100L, 0L), (2L, 1L, 10L), (3L, 1L, 10L)))
    spark.catalog.clearCache()
  }

  test("property: random sizes/budgets/partition counts match the window oracle") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 5) {
      val n = 1 + rnd.nextInt(200)
      val keys = rnd.shuffle((1 to n).map(_.toLong * 17)).toSeq
      val data = keys.map(k => (k, rnd.nextInt(5000).toLong)) // includes 0-byte rows
      val budget = 1L + rnd.nextInt(4096)
      val parts = 1 + rnd.nextInt(12)
      val got = SizeBatch.assign(data.toDS(), budget, parts)
        .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
      assert(got == windowOracle(data, budget),
        s"trial=$trial n=$n budget=$budget parts=$parts")
    }
    spark.catalog.clearCache()
  }

  test("q37's plan has no WindowExec (the old single-partition scale-killer)") {
    val df = graft.queries.AdvancedQueries.q37SizeBatching(spark, sfSmoke)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    // and it still matches the window formulation end to end
    val w = Window.orderBy($"doc_id")
    val oracle = Tables.documents(spark, sfSmoke)
      .select($"doc_id", length($"text").cast("bigint").as("n_bytes"))
      .withColumn("cum",
        sum($"n_bytes").over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .select($"doc_id", $"n_bytes",
        (coalesce($"cum", lit(0L)) / lit(4096L)).cast("bigint").as("batch_id"))
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val got = df.as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == oracle)
    spark.catalog.clearCache()
  }
}
