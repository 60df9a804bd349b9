package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.TopKScore

/** Native TopKScore aggregate ≡ the typed TopKAgg on adversarial data:
  * ties, ±0.0 scores, groups under/at/over k, single-row groups. */
class TopKScoreSpec extends AnyFunSuite with SparkSpecBase {
  import spark.implicits._

  private def typedTopK(scored: org.apache.spark.sql.DataFrame, k: Int) =
    scored.as[(Long, Long, Double)]
      .groupByKey(_._1).mapValues(r => (r._2, r._3))
      .agg(new graft.agg.TopKAgg(k).toColumn.name("top"))
      .flatMap { case (qid, top) =>
        top.iterator.zipWithIndex.map { case ((cid, cos), i) =>
          (qid, cid, cos, i + 1) }
      }.toDF("qid", "cid", "cos", "rank")

  private def nativeTopK(scored: org.apache.spark.sql.DataFrame, k: Int) =
    scored.groupBy($"qid")
      .agg(TopKScore($"cid", $"cos", k).as("top"))
      .select($"qid", posexplode($"top"))
      .select($"qid", $"col.cid".as("cid"), $"col.cos".as("cos"),
        ($"pos" + 1).cast("int").as("rank"))

  test("native == typed on deterministic pseudo-random data with ties") {
    // LCG-ish deterministic rows: 40 groups, ~200 rows each, scores drawn
    // from a SMALL grid so ties are common; plus exact ±0.0 score rows
    val rows = (0 until 8000).map { i =>
      val qid = (i * 2654435761L % 40).abs
      val cid = (i * 40503L % 100000).abs
      val cos = ((i * 97L % 13) - 6) / 10.0 // grid {-0.6 … 0.6}, many ties
      (qid, cid, cos)
    } ++ Seq((1L, 7L, 0.0), (1L, 8L, -0.0), (2L, 9L, -0.0), (2L, 10L, 0.0))
    val scored = rows.toDF("qid", "cid", "cos")
      // collapse duplicate (qid,cid) so both impls see one row per pair
      .groupBy("qid", "cid").agg(max($"cos").as("cos"))
    for (k <- Seq(1, 5, 64)) {
      val a = typedTopK(scored, k).collect()
        .map(r => (r.getLong(0), r.getInt(3)) -> (r.getLong(1), r.getDouble(2)))
        .toMap
      val b = nativeTopK(scored, k).collect()
        .map(r => (r.getLong(0), r.getInt(3)) -> (r.getLong(1), r.getDouble(2)))
        .toMap
      assert(a.size == b.size, s"k=$k sizes")
      val diff = a.keySet.filter(key => a(key) != b(key))
      assert(diff.isEmpty,
        s"k=$k diverges at ${diff.take(5).map(d => (d, a(d), b(d)))}")
    }
  }

  test("k bounds the output; empty input yields empty output") {
    val scored = Seq((1L, 1L, 0.9), (1L, 2L, 0.8)).toDF("qid", "cid", "cos")
    assert(nativeTopK(scored, 5).count() == 2)
    assert(nativeTopK(scored, 1).collect().map(r => r.getLong(1)).toSeq == Seq(1L))
    val empty = Seq.empty[(Long, Long, Double)].toDF("qid", "cid", "cos")
    assert(nativeTopK(empty, 3).count() == 0)
  }

  test("partial-agg bound: map-side output per key never exceeds k entries") {
    // structural check on the plan: TopKScore appears in a partial
    // aggregate (map-side combine), so shuffled state per key is ≤ k
    val scored = Seq((1L, 1L, 0.9)).toDF("qid", "cid", "cos")
    val plan = scored.groupBy($"qid")
      .agg(TopKScore($"cid", $"cos", 3).as("top"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_topk_score"), plan.take(800))
    assert(plan.toLowerCase.contains("partial"), plan.take(800))
  }
}
