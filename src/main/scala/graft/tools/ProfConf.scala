package graft.tools

import org.apache.spark.sql.SparkSession

/** Config A/B diagnostic: runs the named queries under a config variant,
  * 3 passes each, printing per-pass wall times. Variants are selected by
  * env PROF_VARIANT: "base" (Bench's session), "noaqe", "p8" (8 shuffle
  * partitions). Dev utility for separating fixed AQE/driver overhead from
  * data cost at bench scale. */
object ProfConf {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("PROF_SF", "/root/testdata/sf0.1")
    val variant = sys.env.getOrElse("PROF_VARIANT", "base")
    val b = SparkSession.builder().master("local[32]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      .config("spark.ui.enabled", "false")
    val spark = (variant match {
      case "noaqe" => b.config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "false")
      case "p8" => b.config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
      case "sizefirst" => b.config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      case "bc64" => b.config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      case _ => b.config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
    }).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.register(spark)
    // /proc/stat snapshot → (steal, idle, total) so each pass self-reports
    // whether the hypervisor was stealing CPU during it
    def stat(): (Long, Long, Long) = {
      val f = scala.io.Source.fromFile("/proc/stat")
      val v = try f.getLines().next().split("\\s+").drop(1).take(8).map(_.toLong)
              finally f.close()
      (v(7), v(3), v.sum)
    }
    args.foreach { name =>
      def cpuSec: Double =
        java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
          case os: com.sun.management.OperatingSystemMXBean => os.getProcessCpuTime / 1e9
          case _ => -1.0
        }
      def gcMs: Long = {
        import scala.jdk.CollectionConverters._
        java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
          .asScala.map(_.getCollectionTime).sum
      }
      val times = (1 to 3).map { _ =>
        val (st0, _, tot0) = stat()
        val (c0, g0) = (cpuSec, gcMs)
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, sf).count()
        val dt = (System.nanoTime() - t0) / 1e9
        graft.ops.ScratchCache.releaseAll()
        spark.catalog.clearCache()
        val (st1, _, tot1) = stat()
        val stealPct = 100.0 * (st1 - st0) / math.max(1L, tot1 - tot0)
        (dt, stealPct, cpuSec - c0, (gcMs - g0) / 1e3)
      }
      println(f"CONF $variant $name%-28s " +
        times.map { case (t, s, c, g) =>
          f"$t%6.2f(st$s%4.1f%% cpu$c%6.1f gc$g%5.1f)" }.mkString(" "))
    }
    spark.stop()
  }
}
