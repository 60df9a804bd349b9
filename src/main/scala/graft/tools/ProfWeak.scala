package graft.tools

import org.apache.spark.sql.SparkSession

/** Repeated-run profiler for the slowest like-for-like queries: prints each
  * of N in-session runs so steady-state cost separates from first-run
  * plan/codegen/listing overhead. Usage: runMain graft.tools.ProfWeak
  * [substrings] [runs]. */
object ProfWeak {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args(0).split(",").toSeq
      else Seq("q73", "q74", "q76", "q58", "q124", "q32_knn_lsh", "q99")
    val runs = if (args.length > 1) args(1).toInt else 4
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftExtensions.register(spark)
    for ((name, fn) <- graft.SparkEntry.queries.toSeq.sortBy(_._1)
         if names.exists(name.contains)) {
      val ts = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        graft.ops.ScratchCache.releaseAll()
        spark.catalog.clearCache()
        dt
      }
      println(f"PROF $name%-26s ${ts.map(t => f"$t%6.3f").mkString(" ")}")
    }
    spark.stop()
  }
}
