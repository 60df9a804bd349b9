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

  test("q74/q75 plan shapes: native ranking tail, joinless pivoted BM25") {
    // q74: the top-3 tail is collect_list+array_sort — no typed
    // Aggregator, so no object serialization boundary in the plan
    val p74 = SparkEntry.queries("q74_tfidf")(spark, sfSmoke)
      .queryExecution.sparkPlan.toString
    assert(!p74.contains("SerializeFromObject") &&
      !p74.contains("MapGroups"), s"q74 tail must stay native:\n$p74")
    // q75: literal query terms pivot into one conditional aggregation —
    // the plan has NO join of any kind (tf/df/dl tables never exist)
    val p75 = SparkEntry.queries("q75_bm25")(spark, sfSmoke)
      .queryExecution.sparkPlan.toString
    assert(!p75.contains("Join"), s"q75 must be join-free:\n$p75")
  }

  test("q81: centroid tightness in [-1,1], members partition the table") {
    val rows = SparkEntry.queries("q81_centroids")(spark, sfSmoke).collect()
    assert(rows.nonEmpty)
    val total = Tables.embeddings(spark, sfSmoke).count()
    assert(rows.map(_.getAs[Long]("n")).sum == total)
    rows.foreach { r =>
      val c = r.getAs[Double]("avg_cos")
      assert(c >= -1.0 && c <= 1.0)
      assert(r.getAs[Double]("centroid_norm") >= 0.0)
    }
  }

  test("q82: decile buckets partition rows and bucket ranges are ordered") {
    val rows = SparkEntry.queries("q82_decile_stats")(spark, sfSmoke)
      .orderBy($"bucket").collect()
    val total = Tables.orders(spark, sfSmoke).count()
    assert(rows.map(_.getAs[Long]("n")).sum == total)
    // hi of bucket k never exceeds lo of bucket k+1
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Double]("hi") <= b.getAs[Double]("lo"))
      case _ =>
    }
    // equal-frequency: every bucket within 2x of the ideal share
    val ideal = total.toDouble / rows.length
    rows.foreach(r => assert(r.getAs[Long]("n") <= ideal * 2))
  }

  test("q83: banding finds EXACTLY the all-pairs Hamming matches") {
    import graft.ops.Multimodal
    val q = SparkEntry.queries("q83_perceptual_dedup")(spark, sfSmoke)
    val got = q.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // brute-force reference on the same hashes
    val ascii = Tables.documents(spark, sfSmoke)
      .filter(octet_length($"text") === length($"text") && length($"text") > 0)
    val hs = Multimodal.averageHash(
      Multimodal.withPayload(ascii, "text"), "doc_id", 8).collect()
    val brute = (for {
      a <- hs; b <- hs if a.doc_id < b.doc_id
      dist = java.lang.Long.bitCount(a.hi ^ b.hi) + java.lang.Long.bitCount(a.lo ^ b.lo)
      if dist <= 3
    } yield (a.doc_id, b.doc_id, dist.toLong)).toSet
    assert(got == brute)
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
