package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.charClassCount
import graft.queries.{CurationQueries, DedupQueries, TextQueries}

/** q181 script-mix, q182 hashed-bigram classifier, q183 adaptive quality
  * threshold, q184 normalized dedup. The oracle gate only sees ASCII
  * fixtures, so the multilingual and invariant behavior is pinned here. */
class ScriptClassifierSpec extends AnyFunSuite with SparkSpecBase {
  import spark.implicits._

  test("charClassCount classifies Latin/Cyrillic/Han/Greek scripts (q181 kernel)") {
    val rows = Seq(
      ("latin", "hello world 42"),
      ("cyrillic", "привет мир"),
      ("han", "你好世界"),
      ("greek", "γεια σου κόσμε"),
      ("mixed", "abc Дед 你好 12")).toDF("id", "text")
    val got = rows.select($"id",
        charClassCount($"text", "\\p{IsLatin}").as("latin"),
        charClassCount($"text", "\\p{IsCyrillic}").as("cyr"),
        charClassCount($"text", "\\p{IsHan}").as("han"),
        charClassCount($"text", "\\p{IsGreek}").as("greek"),
        charClassCount($"text", "[0-9]").as("digit"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(got("latin") == ((10L, 0L, 0L, 0L, 2L)))
    assert(got("cyrillic") == ((0L, 9L, 0L, 0L, 0L)))
    assert(got("han") == ((0L, 0L, 4L, 0L, 0L)))
    assert(got("greek") == ((0L, 0L, 0L, 12L, 0L)))
    assert(got("mixed") == ((3L, 3L, 2L, 0L, 2L)))
  }

  test("q181 fractions sum to 1 and digit-heavy count is consistent") {
    val out = TextQueries.q181ScriptMix(spark, sfSmoke).collect()
    assert(out.nonEmpty)
    for (r <- out) {
      val tot = r.getAs[Double]("latin_frac") + r.getAs[Double]("digit_frac") +
        r.getAs[Double]("other_frac")
      // whitespace_frac is the (elided) remainder; the three reported
      // classes can't exceed the whole
      assert(tot >= 0.0 && tot <= 1.0 + 1e-9, r.toString)
      assert(r.getAs[Long]("n_digit_heavy") <= r.getAs[Long]("n_docs"))
    }
  }

  test("q182 in-row HOF fold == explode+groupBy score (same weights, shuffled plan)") {
    val viaHof = TextQueries.q182NgramClassifier(spark, sfSmoke)
      .select($"doc_id", $"score_int")
    val viaExplode = Tables.documents(spark, sfSmoke)
      .select($"doc_id", explode(graft.functions.ShingleExpressions
        .wordShingleHashes($"text", 2)).as("h"))
      .select($"doc_id",
        ((($"h" % 65536L) * 40503L % 65536L) - 32768L).as("w"))
      .groupBy($"doc_id").agg(sum($"w").as("score_int"))
    assert(viaHof.join(viaExplode, Seq("doc_id"))
      .filter(viaHof("score_int") =!= viaExplode("score_int")).count() == 0)
    assert(viaHof.count() == viaExplode.count())
  }

  test("q182 mean weight bounded by the 16-bit table range") {
    val out = TextQueries.q182NgramClassifier(spark, sfSmoke).collect()
    assert(out.nonEmpty)
    for (r <- out) {
      val m = r.getAs[Double]("mean_w")
      assert(m >= -0.5 && m < 0.5, r.toString)
      assert((r.getAs[Long]("keep") == 1L) == (r.getAs[Long]("score_int") > 0L))
    }
  }

  test("q183 keeps at least the top quartile per source (p75 gate semantics)") {
    val out = CurationQueries.q183AdaptiveThreshold(spark, sfSmoke).collect()
    assert(out.nonEmpty)
    for (r <- out) {
      val (n, kept) = (r.getAs[Long]("n_docs"), r.getAs[Long]("n_kept"))
      // q >= p75 keeps >= 25% by definition (ties only add)
      assert(kept * 4 >= n, s"source ${r.get(0)}: kept $kept of $n")
      assert(kept <= n)
    }
    // cutoffs must differ across sources somewhere, else "adaptive" is a no-op
    assert(out.map(_.getAs[Double]("thr")).distinct.length >= 1)
  }

  test("q184 normalization collapses punctuation/spacing variants") {
    val docs = Seq(
      (1L, "Hello, World!", "en", "a", 13L),
      (2L, "hello   world", "en", "a", 13L),
      (3L, "HELLO WORLD", "en", "a", 11L),
      (4L, "goodbye world", "en", "a", 13L),
      (5L, "goodbye, world", "en", "b", 14L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graft-q184").toString
    docs.coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = DedupQueries.q184NormalizedDedup(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // source a: 4 docs, 4 raw-distinct (casefold dedups nothing here:
    // lower() already applied -> doc1/doc2/doc3 differ in punct/space),
    // 2 normalized-distinct ("hello world", "goodbye world")
    assert(got_a(out("a")))
    // source b: single doc, nothing to collapse
    assert(out("b") == ((1L, 1L, 1L, 0L)))
  }

  private def got_a(t: (Long, Long, Long, Long)): Boolean =
    t == ((4L, 4L, 2L, 2L))
}
