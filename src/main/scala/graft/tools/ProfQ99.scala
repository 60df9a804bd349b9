package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage timing for q99 entity resolution — isolates the blocked
  * fuzzy-pair join from the component shuffle and assignment tail.
  * Maintained dev utility (`runMain graft.tools.ProfQ99`). */
object ProfQ99 {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("PROF_SF", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.register(spark)
    import spark.implicits._
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROFSTAGE $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    graft.queries.DedupQueries.q99EntityResolution(spark, sf).count() // warm
    val doc = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", substring($"text", 1, 12).as("blk"),
        substring($"text", 1, 80).as("w80"))
    val pairs = doc.as("a").join(doc.as("b"),
        $"a.blk" === $"b.blk" && $"a.doc_id" < $"b.doc_id")
      .select($"a.blk".as("blk"), $"a.doc_id".as("doc_a"),
        $"b.doc_id".as("doc_b"),
        levenshtein($"a.w80", $"b.w80", 30).as("dist"))
      .filter($"dist" =!= -1)
    t("pairs-count")(println("pairs=" + pairs.count()))
    t("components") {
      graft.ops.Dedup.blockLocalComponents(pairs, "blk", "doc_a", "doc_b")
        .count()
    }
    t("full-query")(
      graft.queries.DedupQueries.q99EntityResolution(spark, sf).count())
    t("full-query-2")(
      graft.queries.DedupQueries.q99EntityResolution(spark, sf).count())
    spark.stop()
  }
}
