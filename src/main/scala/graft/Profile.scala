package graft
import org.apache.spark.sql.SparkSession
/** Per-query profiler: `runMain graft.Profile q01_... q02_...` times each
  * named query at PROF_SF (default sf0.1). Maintained dev utility. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("PROF_SF", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftExtensions.register(spark)
    args.foreach { n =>
      val t0 = System.nanoTime()
      val cnt = try SparkEntry.queries(n)(spark, sf).count() catch { case e: Throwable => println(s"$n ERROR ${e.getMessage.take(100)}"); -1L }
      println(f"PROF $n%-24s ${(System.nanoTime()-t0)/1e9}%8.2f s rows=$cnt")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
