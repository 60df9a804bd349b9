package graft

import org.scalatest.funsuite.AnyFunSuite

/** Differential tests for the repetition/decontamination queries (q43/q44):
  * an independent plain-Scala reference implementation runs over the same
  * sf0.001 fixture and must agree field-for-field with the Spark plans.
  * (The DuckDB oracle is the cross-engine check; this is the in-repo one.)
  */
class TextRepetitionSpec extends AnyFunSuite with SparkSpecBase {

  private def tokens(text: String): Seq[String] =
    text.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq

  private def grams(ws: Seq[String], k: Int): Seq[String] =
    if (ws.length < k) Seq.empty
    else ws.sliding(k).map(_.mkString(" ")).toSeq

  private def roundp(x: Double): Double = math.round(x * 1e6) / 1e6

  private lazy val docs: Seq[(Long, String, String)] = {
    import spark.implicits._
    Tables.documents(spark, sfSmoke)
      .select($"doc_id", $"source", $"text")
      .as[(Long, String, String)].collect().toSeq.sortBy(_._1)
  }

  test("q43 matches a plain-Scala reference on every doc") {
    val expected = docs.map { case (id, _, text) =>
      val ws = tokens(text)
      def counts(k: Int): Map[String, Int] =
        grams(ws, k).groupBy(identity).map { case (g, o) => g -> o.length }
      val w = counts(1); val b = counts(2); val t = counts(3)
      val nWords = ws.length.toLong
      (id, nWords,
        if (nWords == 0) 0.0 else roundp(w.size.toDouble / nWords),
        if (nWords == 0) 0.0 else roundp(w.values.max.toDouble / nWords),
        if (b.isEmpty) 0.0 else roundp(b.values.max.toDouble / b.values.sum),
        if (t.isEmpty) 0.0
        else roundp(t.values.map(_ - 1).sum.toDouble / t.values.sum))
    }
    import spark.implicits._
    val got = graft.queries.TextQueries.q43Repetition(spark, sfSmoke)
      .as[(Long, Long, Double, Double, Double, Double)].collect().toSeq
    assert(got.size == expected.size)
    got.zip(expected).foreach { case (g, e) => assert(g == e, s"doc ${e._1}") }
  }

  test("q44 matches a plain-Scala reference (string-exact gram sets)") {
    val sets = docs.map { case (id, src, text) =>
      (id, src, grams(tokens(text), 5).distinct.toSet)
    }
    val corpus: Set[String] =
      sets.filter(_._2 != "src0").flatMap(_._3).toSet
    val expected = sets.filter(_._2 == "src0").map { case (id, _, gs) =>
      val hit = gs.count(corpus.contains).toLong
      (id, gs.size.toLong, hit,
        if (gs.isEmpty) 0.0 else roundp(hit.toDouble / gs.size))
    }.sortBy(_._1)
    import spark.implicits._
    val got = graft.queries.TextQueries.q44Contamination(spark, sfSmoke)
      .as[(Long, Long, Long, Double)].collect().toSeq.sortBy(_._1)
    assert(got == expected)
  }

  test("q54 gate verdicts replay the rule order on the component stats") {
    import org.apache.spark.sql.functions.col
    val stats = graft.queries.TextQueries.q22LangId(spark, sfSmoke)
      .select(col("doc_id"), col("lang_pred"))
      .join(graft.queries.TextQueries.q43Repetition(spark, sfSmoke), Seq("doc_id"))
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(6)))
      .toMap // lang_pred, n_words, distinct_word_ratio, top_word_frac, dup_trigram_frac
    val gate = graft.queries.TextQueries.q54QualityGate(spark, sfSmoke)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2)))
    assert(gate.length == stats.size)
    var kept = 0
    gate.foreach { case (id, verdict, keep) =>
      val (lang, n, dwr, twf, dtf) = stats(id)
      val expect =
        if (lang == "unknown") "lang"
        else if (n < 20) "too_short"
        else if (dwr < 0.4) "low_diversity"
        else if (twf > 0.2) "repetitive_word"
        else if (dtf > 0.05) "repetitive_trigram"
        else "ok"
      assert(verdict == expect && keep == (expect == "ok"), s"doc $id")
      if (keep) kept += 1
    }
    assert(kept > 0 && kept < gate.length, "gate must actually discriminate")
  }

  test("q44 held-out docs never count their own source as contamination") {
    import org.apache.spark.sql.functions._
    // a gram present ONLY within src0 must not be flagged: rebuild the
    // corpus check with src0 included and require strictly more hits
    val withSelf = {
      import spark.implicits._
      val sets = docs.map { case (id, src, text) =>
        (id, src, grams(tokens(text), 5).distinct.toSet) }
      val corpusAll: Set[String] = sets.flatMap(_._3).toSet // includes src0
      sets.filter(_._2 == "src0")
        .map { case (_, _, gs) => gs.count(corpusAll.contains) }.sum
    }
    val engine = graft.queries.TextQueries.q44Contamination(spark, sfSmoke)
      .agg(sum("n_contaminated")).collect()(0).getLong(0)
    assert(engine < withSelf, "self-source grams must be excluded")
  }

  test("q55 bloom decontamination == exact join; candidate scan is shuffle-free") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val d = Tables.documents(spark, sfSmoke)
    val got = graft.queries.TextQueries.q55BloomDecontaminate(spark, sfSmoke)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // exact reference: corpus docs with >=1 gram-hash in the bench set
    val hs = graft.functions.ShingleExpressions.wordShingleHashes($"text", 5)
    val toks = d.select($"doc_id", $"source", hs.as("hs")).filter($"hs".isNotNull)
    val benchH = toks.filter($"source" === "src0")
      .select(explode($"hs").as("h")).distinct()
    val expect = toks.filter($"source" =!= "src0")
      .select($"doc_id", size($"hs").cast("bigint").as("n_grams"), explode($"hs").as("h"))
      .join(benchH, Seq("h"), "left_semi")
      .groupBy($"doc_id", $"n_grams").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expect)
    assert(got.nonEmpty, "fixture must actually contaminate")
    graft.ops.ScratchCache.releaseAll()
    // scale shape: the sketch test itself must add no shuffle and no join —
    // build just the candidate filter the operator uses and audit its plan
    val plan = graft.queries.TextQueries.q55BloomDecontaminate(spark, sfSmoke)
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain") || plan.contains("BloomFilterMightContain"),
      plan.take(1500))
    graft.ops.ScratchCache.releaseAll()
  }
}
