package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.ops.{Dedup, Similarity}

class DedupSpec extends AnyFunSuite with SparkSpecBase {
  import spark.implicits._

  private def docs = Tables.documents(spark, sfSmoke)

  test("polyHash matches the reference fold") {
    val got = Seq("hello", "a", "spark graft").toDF("s")
      .select(TextFunctions.polyHash($"s")).as[Long].collect()
    def ref(s: String): Long =
      s.foldLeft(0L)((acc, c) => (acc * 31 + c.toInt) % 4294967296L)
    assert(got(0) == ref("hello") && got(0) == 99162322L)
    assert(got(1) == ref("a") && got(2) == ref("spark graft"))
  }

  test("shingles of short docs are empty, not reversed sequences") {
    val sh = Seq("one two", "one two three four").toDF("text")
      .select(TextFunctions.shingles(TextFunctions.tokens($"text"), 3).as("s"))
      .collect().map(_.getSeq[String](0))
    assert(sh(0).isEmpty)
    assert(sh(1) == Seq("one two three", "two three four"))
  }

  test("minhash-LSH pairs equal brute-force jaccard pairs at threshold 0.8") {
    val brute = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.8)
      .select($"id_a", $"id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashDedupPairs(docs, "doc_id", "text", 3, 0.8)
      .select($"id_a", $"id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty, "expected duplicates in fixture")
    assert(lsh == brute)
  }

  test("banded simhash pairs equal brute-force hamming<=3 pairs (pigeonhole recall 1)") {
    val sim = Dedup.simhashPairs(docs, "doc_id", "text", 3, 3)
      .select($"id_a", $"id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fp = Dedup.simhashFingerprints(docs, "doc_id", "text", 3)
    val brute = fp.as("a").join(fp.as("b"), $"a.doc_id" < $"b.doc_id")
      .filter(bit_count($"a.simhash".bitwiseXOR($"b.simhash")) <= 3)
      .select($"a.doc_id", $"b.doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sim == brute)
    assert(sim.nonEmpty, "expected some hamming<=3 pairs in fixture")
  }

  test("knn LSH recall >= 0.5 vs brute force at k=5 (and exact on candidates)") {
    val emb = Tables.embeddings(spark, sfSmoke)
    val brute = Similarity.knnBrute(emb, "vec_id", "embedding", $"vec_id" < 10, 5)
      .select($"qid", $"cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.knnLsh(emb, "vec_id", "embedding", $"vec_id" < 10, 5)
      .select($"qid", $"cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & lsh).size.toDouble / brute.size
    assert(recall >= 0.5, s"recall $recall too low")
  }

  test("multimodal stub features are deterministic byte stats") {
    val (mean, feat) = graft.ops.Multimodal.decodeStub("abcd".getBytes("UTF-8"))
    assert(mean == (97 + 98 + 99 + 100) / 4.0)
    assert(feat.length == 4 && feat(0) == 97.0f)
  }
}
