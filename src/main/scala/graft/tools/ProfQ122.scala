package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-cost split for q122 curation funnel. */
object ProfQ122 {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("PROF_SF", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.register(spark)
    import spark.implicits._
    import graft.functions.TextFunctions.{polyHash, shingles, stopwordCount, tokens}
    def time3(name: String)(f: => Any): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f
        graft.ops.ScratchCache.releaseAll(); spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"STAGE $name%-24s ${ts.map(t => f"$t%6.3f").mkString(" ")}")
    }
    val docs = graft.Tables.documents(spark, sf)
    docs.count()

    val langCounts = Seq(
      "n_de" -> Seq("der", "die", "das", "und"),
      "n_en" -> Seq("the", "a", "of", "and"),
      "n_es" -> Seq("el", "la", "los", "de"),
      "n_fr" -> Seq("le", "les", "des", "et"))
    def flagged = {
      val f0 = langCounts.foldLeft(docs
          .select($"doc_id", $"text", $"source")
          .withColumn("ws", tokens($"text"))) {
        case (df, (n, wlist)) => df.withColumn(n, stopwordCount($"ws", wlist))
      }
      val g = greatest($"n_de", $"n_en", $"n_es", $"n_fr")
      f0.withColumn("f_url", !$"source".isInCollection(Seq("src3", "src7")))
        .withColumn("f_lang", $"f_url" && g > 0 && $"n_en" === g && $"n_de" < g)
        .withColumn("f_qual", $"f_lang" && size($"ws") >= 20 &&
          size(array_distinct($"ws")) * lit(1.0) / size($"ws") >= 0.4)
    }
    time3("flags-agg") {
      flagged.agg(count(lit(1)), sum(when($"f_url", 1L).otherwise(0L)),
        sum(when($"f_lang", 1L).otherwise(0L)),
        sum(when($"f_qual", 1L).otherwise(0L))).head()
    }
    def s3 = flagged.filter($"f_qual").select($"doc_id", $"text", $"source", $"ws")
    time3("exact-dedup-s4") {
      val canon = s3.groupBy(lower($"text").as("lt"))
        .agg(min($"doc_id").as("keep_id"))
      s3.join(canon,
        lower(s3("text")) === canon("lt") && s3("doc_id") === canon("keep_id"),
        "left_semi").count()
    }
    time3("minhash-on-s4") {
      val canon = s3.groupBy(lower($"text").as("lt"))
        .agg(min($"doc_id").as("keep_id"))
      val s4 = graft.ops.ScratchCache.register(s3.join(canon,
        lower(s3("text")) === canon("lt") && s3("doc_id") === canon("keep_id"),
        "left_semi").persist())
      graft.ops.Dedup.minhashDedupPairs(s4, "doc_id", "text", 3, 0.8).count()
    }
    time3("decontam-alone") {
      val benchGrams = docs.filter($"source" === "src0")
        .select(explode(shingles(tokens($"text"), 5)).as("gr"))
        .select(polyHash($"gr").as("h")).distinct()
      docs.filter($"source" =!= "src0")
        .select($"doc_id", explode(shingles(tokens($"text"), 5)).as("gr"))
        .select($"doc_id", polyHash($"gr").as("h"))
        .join(benchGrams, Seq("h"), "left_semi")
        .select($"doc_id").distinct().count()
    }
    time3("full") {
      graft.queries.CurationQueries.q122CurationFunnel(spark, sf).count()
    }
    spark.stop()
  }
}
