package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Regime comparison for q93 PageRank at gate SF: broadcast loop
  * (per-iteration driver collect) vs distributed loop (one lazy plan).
  * Maintained dev utility (`runMain graft.tools.ProfQ93`). */
object ProfQ93 {
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
    def edges = spark.read.parquet(s"$sf/lineitem.parquet")
      .select($"l_suppkey".cast("long").as("src"),
        ($"l_partkey".cast("long") + 1000000L).as("dst"))
      .distinct()
    graft.ops.PageRank.rankInt(spark, edges, 3).count() // warm
    spark.catalog.clearCache()
    t("edges-distinct-count")(edges.count())
    spark.catalog.clearCache()
    t("broadcast-loop")(
      graft.ops.PageRank.rankIntBroadcast(spark, edges, 3).count())
    spark.catalog.clearCache()
    t("distributed-loop")(
      graft.ops.PageRank.rankInt(spark, edges, 3).count())
    spark.catalog.clearCache()
    t("broadcast-loop-2")(
      graft.ops.PageRank.rankIntBroadcast(spark, edges, 3).count())
    spark.catalog.clearCache()
    t("distributed-loop-2")(
      graft.ops.PageRank.rankInt(spark, edges, 3).count())
    spark.stop()
  }
}
