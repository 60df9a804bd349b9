package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Dedup
import graft.queries.{CurationQueries, DedupQueries}

/** Round-7 corpus-curation additions: containment pairs (q116), segment
  * dedup (q117), survivor selection (q115), URL normalization (q118),
  * BPE pair counting (q119), chunk retrieval (q120).
  */
class CorpusOpsSpec extends AnyFunSuite with SparkSpecBase {
  import spark.implicits._

  test("containmentPairs finds a short doc embedded in a long one that Jaccard misses") {
    // doc 2 = doc 1's text plus a long unrelated tail: containment 1.0,
    // Jaccard well under 0.5.
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon " +
        "one two three four five six seven eight nine ten " +
        "eleven twelve thirteen fourteen fifteen sixteen"),
      (3L, "totally unrelated content with different words entirely"))
      .toDF("doc_id", "text")
    val cont = Dedup.containmentPairs(df, "doc_id", "text", 3, 0.9)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(cont.keySet == Set((1L, 2L)))
    assert(math.abs(cont((1L, 2L)) - 1.0) < 1e-9)
    val jac = Dedup.jaccardPairs(df, "doc_id", "text", 3, 0.9).collect()
    assert(jac.isEmpty, "Jaccard at the same threshold should miss the embedding")
  }

  test("containment >= jaccard for every pair at threshold 0 (overlap dominance)") {
    val docs = Tables.documents(spark, sfSmoke).limit(60)
    val j = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.2)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val c = Dedup.containmentPairs(docs, "doc_id", "text", 3, 0.2)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(j.keySet.subsetOf(c.keySet),
      "every Jaccard pair must survive as a containment pair")
    j.foreach { case (k, jv) =>
      assert(c(k) >= jv - 1e-9, s"pair $k: containment ${c(k)} < jaccard $jv")
    }
  }

  test("q117 segment dedup: duplicated segments counted by scan-order dominance") {
    // ten-token segments; doc 1 seg0 == doc 2 seg0 == doc 2 seg1 content.
    val ten = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    val other = "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10"
    val df = Seq(
      (1L, s"$ten $other"), // seg0 first occurrence, seg1 first occurrence
      (2L, s"$ten $ten"),   // both segs dup of doc1 seg0 / of (2,0)
      (3L, other))          // dup of doc1 seg1
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-seg").toString
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = DedupQueries.q117SegmentDedup(spark, dir)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(out(1L) == ((2L, 0L)))
    assert(out(2L) == ((2L, 2L)), "both of doc 2's segments duplicate doc 1 seg0")
    assert(out(3L) == ((1L, 1L)))
  }

  test("q115 survivor = longest text, doc_id tiebreak, per component") {
    val docs = Tables.documents(spark, sfSmoke)
    val pairs = Dedup.minhashDedupPairs(docs, "doc_id", "text", 3, 0.8)
    val comp = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .withColumnRenamed("id", "doc_id")
      .join(docs.select($"doc_id", $"n_chars"), Seq("doc_id"))
      .collect().map(r => (r.getLong(1), (r.getLong(0), r.getLong(2))))
      .groupBy(_._1).map { case (c, ms) => (c, ms.map(_._2)) }
    val got = DedupQueries.q115DedupSurvivors(spark, sfSmoke)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.keySet == comp.keySet)
    comp.foreach { case (c, members) =>
      val best = members.maxBy { case (id, n) => (n, -id) }
      assert(got(c) == ((best._1, best._2, members.size.toLong)),
        s"component $c: got ${got(c)}, members $members")
    }
  }

  test("q118 URL normalization strips case, www, utm params and trailing slash") {
    val dir = java.nio.file.Files.createTempDirectory("graft-url").toString
    // doc_ids chosen to exercise each branch: 30 (HTTPS+WWW+utm, /docs/30),
    // 31 (http, ?ref=), 32 (HTTPS, slash), 33 (http plain)
    Seq((30L, "src3"), (31L, "src1"), (32L, "src0"), (33L, "src7"))
      .map { case (id, src) => (id, "t", "en", src, 1L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = CurationQueries.q118UrlNormalize(spark, dir)
      .collect().map(r => (r.getLong(0), (r.getString(1), r.getBoolean(2)))).toMap
    assert(out(30L)._1 == "https://src3.example.com/docs/30?ref=src3")
    assert(out(30L)._2, "src3 is blocklisted")
    assert(out(31L)._1 == "http://src1.example.com/docs/31?ref=src1")
    assert(!out(31L)._2)
    assert(out(32L)._1 == "https://src0.example.com/docs/32")
    assert(out(33L)._1 == "http://src7.example.com/docs/33")
    assert(out(33L)._2, "src7 is blocklisted")
  }

  test("q119 adjacent-pair counts match a hand count") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bpe").toString
    Seq((1L, "a b a b c"), (2L, "a b"), (3L, "c"))
      .map { case (id, t) => (id, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = CurationQueries.q119BpePairs(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // doc1 pairs: a b, b a, a b, b c; doc2: a b; doc3 dropped (<2 tokens)
    assert(got.toList == List(("a b", 3L), ("b a", 1L), ("b c", 1L)))
  }

  test("q122 curation funnel: stages monotonically shrink and end non-empty") {
    val rows = CurationQueries.q122CurationFunnel(spark, sfSmoke)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rows.map(_._1).toSeq == Seq("0_input", "1_url_blocklist",
      "2_lang", "3_quality", "4_exact_dedup", "5_near_dedup",
      "6_decontaminated"))
    val ns = rows.map(_._2)
    assert(ns.zip(ns.tail).forall { case (a, b) => b <= a },
      s"funnel must shrink: ${ns.toSeq}")
    assert(ns.last > 0 && ns.last < ns.head)
  }

  test("q120 retrieval: top-k size, score bounds, and deterministic order") {
    val rows = CurationQueries.q120ChunkRetrieval(spark, sfSmoke).collect()
    assert(rows.length == CurationQueries.RetrievalTopK)
    val scores = rows.map(_.getDouble(2))
    assert(scores.forall(v => v >= -1.0 - 1e-9 && v <= 1.0 + 1e-9))
    assert(scores.sameElements(scores.sorted(Ordering[Double].reverse)),
      "descending by score")
    val again = CurationQueries.q120ChunkRetrieval(spark, sfSmoke).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq, "rerun-stable")
  }
}
