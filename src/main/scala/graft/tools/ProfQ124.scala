package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage timing for q124 source-overlap: isolates the shingle
  * scan+agg from the mask-histogram tail jobs to show where the seconds
  * go. Maintained dev utility (`runMain graft.tools.ProfQ124`). */
object ProfQ124 {
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
    // warm the JVM/codegen first
    graft.queries.CurationQueries.q124SourceOverlap(spark, sf).count()
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    t("sources-distinct-collect") {
      docs.select($"source").distinct().as[String].collect()
    }
    val base = docs.select($"source", explode(
      graft.functions.ShingleExpressions.wordShingleHashes64($"text", 3))
      .as("sh64"))
    t("scan+shingle-explode-count")(base.count())
    t("groupBy(sh64)-bitor-hist") {
      base.withColumn("bit", lit(1L))
        .groupBy($"sh64").agg(bit_or($"bit").as("m"))
        .groupBy($"m").agg(count(lit(1))).count()
    }
    t("full-query")(
      graft.queries.CurationQueries.q124SourceOverlap(spark, sf).count())
    t("full-query-2")(
      graft.queries.CurationQueries.q124SourceOverlap(spark, sf).count())
    spark.stop()
  }
}
