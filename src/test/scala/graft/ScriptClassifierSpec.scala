package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.charClassCount
import graft.queries.{CurationQueries, DedupQueries, TextQueries}

/** q181 script-mix, q182 hashed-bigram classifier, q184 normalized dedup,
  * q185 weak-supervision label model, q186 l-diversity. The oracle gate
  * only sees ASCII fixtures, so the multilingual and invariant behavior
  * is pinned here. */
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

  test("q185 LF matrix invariants: agree <= both <= min coverage, diagonal exact") {
    val out = CurationQueries.q185LabelModel(spark, sfSmoke).collect()
    assert(out.length == 6)
    val cov = out.filter(r => r.getString(0) == r.getString(1))
      .map(r => r.getString(0) -> r.getAs[Long]("n_both")).toMap
    assert(cov.size == 3)
    for (r <- out) {
      val (a, b) = (r.getString(0), r.getString(1))
      val (both, agree, conf) = (r.getAs[Long]("n_both"),
        r.getAs[Long]("n_agree"), r.getAs[Long]("n_conflict"))
      assert(agree + conf == both, r.toString)
      assert(both <= math.min(cov(a), cov(b)), r.toString)
      if (a == b) assert(agree == both && conf == 0L, r.toString)
    }
  }

  test("q185 conflict counting pinned on a hand-built corpus") {
    // doc1: digits + 5 words (lf1=1, lf2=2 -> CONFLICT; lf3: 0 stop -> abstain)
    // doc2: digits + 3 stopwords of 5 words (lf1=1, lf3=2 -> CONFLICT; lf2=2)
    // doc3: no digits, 50 words, no stopwords (lf1 abstain, lf2=1, lf3 abstain)
    val docs = Seq(
      (1L, "code 42 alpha beta gamma", "en", "a", 24L),
      (2L, "the 7 of and now", "en", "a", 16L),
      (3L, ("lorem " * 50).trim, "en", "a", 300L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graft-q185").toString
    docs.coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = CurationQueries.q185LabelModel(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n_both"), r.getAs[Long]("n_agree"),
          r.getAs[Long]("n_conflict"))).toMap
    assert(out(("lf_digit", "lf_digit")) == ((2L, 2L, 0L)))
    assert(out(("lf_len", "lf_len")) == ((3L, 3L, 0L)))
    assert(out(("lf_stop", "lf_stop")) == ((1L, 1L, 0L)))
    // doc1: lf1=1 vs lf2=2 conflict; doc2: lf1=1 vs lf2=2 conflict
    assert(out(("lf_digit", "lf_len")) == ((2L, 0L, 2L)))
    // doc2 is the only (lf1, lf3) overlap: 1 vs 2 -> conflict
    assert(out(("lf_digit", "lf_stop")) == ((1L, 0L, 1L)))
    // doc2 only: lf2=2, lf3=2 -> agree
    assert(out(("lf_len", "lf_stop")) == ((1L, 1L, 0L)))
  }

  test("q186 entropy l-diversity: 0 <= entropy <= ln(l_distinct), l2 flag consistent") {
    val out = graft.queries.CorpusOpsQueries.q186LDiversity(spark, sfSmoke).collect()
    assert(out.nonEmpty)
    for (r <- out) {
      val (l, e) = (r.getAs[Long]("l_distinct"), r.getAs[Double]("entropy_l"))
      assert(e >= -1e-9 && e <= math.log(l.toDouble) + 1e-9, r.toString)
      assert((r.getAs[Long]("meets_l2") == 1L) == (l >= 2L), r.toString)
      assert(l <= r.getAs[Long]("n_docs"))
    }
    assert(out.exists(_.getAs[Long]("l_distinct") >= 2L))
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
