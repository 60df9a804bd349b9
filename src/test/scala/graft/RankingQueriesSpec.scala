package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Specs for the retrieval/linkage/OLAP queries added in round 6:
  * q73 fuzzy join, q74 TF-IDF, q75 BM25, q76 cube. */
class RankingQueriesSpec extends AnyFunSuite with SparkSpecBase {
  import spark.implicits._

  test("q73: blocked fuzzy join is a hash join and finds planted near-dups") {
    val q = SparkEntry.queries("q73_fuzzy_join")(spark, sfSmoke)
    val plan = q.queryExecution.sparkPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"blocking must equi-join:\n$plan")
    val rows = q.collect()
    // pairs are ordered, distances within the cap, no self-pairs
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getInt(2) >= 0 && r.getInt(2) <= 30)
    }
  }

  test("q74: at most 3 terms per doc, ranks contiguous, scores non-increasing") {
    val rows = SparkEntry.queries("q74_tfidf")(spark, sfSmoke)
      .select($"doc_id", $"rank", $"score").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val byDoc = rows.groupBy(_._1)
    assert(byDoc.nonEmpty)
    byDoc.values.foreach { g =>
      val sorted = g.sortBy(_._2)
      assert(sorted.length <= 3)
      assert(sorted.map(_._2).toSeq == (1L to sorted.length).toSeq)
      assert(sorted.map(_._3).toSeq == sorted.map(_._3).sorted.reverse.toSeq)
    }
  }

  test("q75: BM25 top-20, scores sorted desc, every doc hits a query term") {
    val rows = SparkEntry.queries("q75_bm25")(spark, sfSmoke)
      .select($"bm25", $"n_terms_hit").collect()
      .map(r => (r.getDouble(0), r.getLong(1)))
    assert(rows.length <= 20 && rows.nonEmpty)
    assert(rows.map(_._1).toSeq == rows.map(_._1).sorted.reverse.toSeq)
    assert(rows.forall { case (s, h) => s > 0 && h >= 1 && h <= 3 })
  }

  test("q76: cube superaggregates are consistent with the base table") {
    val q = SparkEntry.queries("q76_cube")(spark, sfSmoke)
    val total = Tables.lineitem(spark, sfSmoke).count()
    val grand = q.filter($"gid" === 7).collect()
    assert(grand.length == 1 && grand.head.getAs[Long]("n") == total)
    // each gid level partitions the full row count
    val byGid = q.groupBy($"gid").agg(sum($"n").as("s")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(byGid.size == 8)
    byGid.values.foreach(s => assert(s == total))
    // exactly one Expand + one scan in the plan (single-pass cube)
    val plan = q.queryExecution.sparkPlan.toString
    assert("Expand".r.findAllIn(plan).size >= 1)
    assert("Scan parquet".r.findAllIn(plan).size == 1, s"one scan expected:\n$plan")
  }
}
