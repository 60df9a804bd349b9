package graft

import org.scalatest.funsuite.AnyFunSuite

/** The round-14 DP-release family (q253 histogram, q254 marginal
  * consistency, q255 stable vocabulary) pinned against straight-line
  * driver-side replays of the truncated discrete-Laplace mechanism —
  * the oracle gate proves DuckDB parity; these prove the MECHANISM:
  * the noise really is the inverse-CDF of the documented distribution,
  * bounded by ±K, keyed only by the released key, and the selection /
  * clamping semantics hold on hand-built corners. */
class PrivacySpec extends AnyFunSuite with SparkSpecBase {
  import spark.implicits._
  import graft.queries.PrivacyQueries

  private def writeDocs(rows: Seq[(Long, String, String, String, Long)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_priv").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  // straight-line replay of the mechanism: polyHash32 → LCG → threshold
  // scan over the same driver-computed table
  private val eps = 0.5
  private val K = 30
  private val thresh: Array[Long] = {
    val alpha = math.exp(-eps)
    val w = (-K to K).map(k => math.pow(alpha, math.abs(k)))
    val z = w.sum
    w.map(_ / z).scanLeft(0.0)(_ + _).tail
      .map(c => math.floor(c * 2147483648.0).toLong).toArray
  }
  private def polyHash32(s: String): Long =
    graft.functions.ShingleKernel.polyHash32(s)
  private def refNoise(key: String): Long = {
    val u = (1103515245L * (polyHash32(key) % 2147483648L) + 12345L) %
      2147483648L
    val j = thresh.indexWhere(u < _) match { case -1 => 2 * K; case i => i }
    (j - K).toLong
  }

  private val docs = Seq[(Long, String, String, String, Long)](
    (1L, "alpha beta gamma", "en", "src0", 16L),
    (2L, "alpha beta", "en", "src0", 10L),
    (3L, "alpha delta", "en", "src1", 11L),
    (4L, "epsilon zeta", "de", "src1", 12L),
    (5L, "alpha alpha alpha", "de", "src2", 17L))

  test("q253: released histogram equals raw + replayed noise, clamped at 0") {
    val dir = writeDocs(docs)
    val got = PrivacyQueries.q253DpHistogram(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val raw = docs.groupBy(_._4).view.mapValues(_.size.toLong).toMap
    val want = raw.toSeq.sortBy(_._1).map { case (src, n) =>
      val k = refNoise(src)
      (src, n, k, math.max(n + k, 0L))
    }
    assert(got.toSeq == want)
    // mechanism sanity: noise bounded by the truncation, table monotone
    assert(got.forall(r => math.abs(r._3) <= K))
    assert(thresh.zip(thresh.tail).forall { case (a, b) => a <= b })
    assert(thresh.last == 2147483648L || thresh.last == 2147483647L)
  }

  test("q253: a count pushed below zero by noise clamps, not wraps") {
    // find a source name whose noise is negative so a count of 1 clamps
    val negSrc = (0 until 1000).map(i => s"s$i").find(refNoise(_) <= -2).get
    val dir = writeDocs(Seq((1L, "x", "en", negSrc, 1L)))
    val row = PrivacyQueries.q253DpHistogram(spark, dir).collect().head
    assert(row.getLong(1) == 1L && row.getLong(3) == 0L)
  }

  test("q254: cells and total noised independently; l1 gap replayed") {
    val dir = writeDocs(docs)
    val got = PrivacyQueries.q254DpConsistency(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val byLang = docs.groupBy(_._3)
    val want = byLang.toSeq.sortBy(_._1).map { case (lang, rs) =>
      val cells = rs.groupBy(_._4).view.mapValues(_.size.toLong).toMap
      val rel = cells.map { case (src, n) =>
        math.max(n + refNoise(s"$lang|$src"), 0L) }.sum
      val tot = math.max(rs.size.toLong + refNoise(s"$lang|TOTAL"), 0L)
      (lang, cells.size.toLong, rel, tot, math.abs(rel - tot))
    }
    assert(got.toSeq == want)
  }

  test("q255: DF over clipped contributions; sub-tau tokens absent") {
    // one token over tau by construction, one far under
    val common = (1 to 60).map(i =>
      (i.toLong, "alpha filler", "en", "src0", 12L))
    val rare = Seq((99L, "zzzrare", "en", "src0", 7L))
    val dir = writeDocs(common ++ rare)
    val got = PrivacyQueries.q255DpVocab(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val dfAlpha = 60L + refNoise("alpha")
    val dfFiller = 60L + refNoise("filler")
    assert(got.get("alpha").contains(dfAlpha))
    assert(got.get("filler").contains(dfFiller))
    assert(!got.contains("zzzrare")) // 1 + noise can never clear tau=40
    // released values are the NOISY DFs (never the raw 60)
    assert(refNoise("alpha") == 0L || got("alpha") != 60L)
  }

  test("q255: contribution clip — token past position 50 adds no DF") {
    val longDoc = ((1 to 55).map(i => s"w$i").mkString(" ") + " tailtok")
    // 45 docs carry 'tailtok' early — without the other doc's clip the
    // DF would be 46
    val carriers = (1 to 45).map(i =>
      (i.toLong, "tailtok " + (1 to 45).map(j => s"c$j").mkString(" "),
        "en", "src0", 10L))
    val dir = writeDocs(carriers :+ (99L, longDoc, "en", "src0", 10L))
    val got = PrivacyQueries.q255DpVocab(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val expected = 45L + refNoise("tailtok")
    if (expected >= 40L) assert(got.get("tailtok").contains(expected))
    else assert(!got.contains("tailtok"))
  }

  test("empty corpus: all three release empty frames") {
    val dir = writeDocs(Seq.empty)
    assert(PrivacyQueries.q253DpHistogram(spark, dir).count() == 0)
    assert(PrivacyQueries.q254DpConsistency(spark, dir).count() == 0)
    assert(PrivacyQueries.q255DpVocab(spark, dir).count() == 0)
  }
}
