package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Per-JOB profiler: `runMain graft.tools.ProfJobs q133_... [nPasses]` runs
  * the named query nPasses times (default 2) and prints every Spark job of
  * the LAST pass with its wall duration and description — the serial-action
  * breakdown the stage UI would show, without the UI. Dev utility. */
object ProfJobs {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("PROF_SF", "/root/testdata/sf0.1")
    val name = args(0)
    val passes = if (args.length > 1) args(1).toInt else 2
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.register(spark)

    case class J(id: Int, t0: Long, var t1: Long = 0L, var desc: String = "",
                 var nTasks: Int = 0)
    val jobs = scala.collection.mutable.ArrayBuffer.empty[J]
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = jobs.synchronized {
        val j = J(e.jobId, e.time)
        j.nTasks = e.stageInfos.map(_.numTasks).sum
        j.desc = e.stageInfos.sortBy(_.stageId)
          .map(s => s.name.takeWhile(_ != '$').take(30) + ":" + s.numTasks)
          .mkString(" | ")
        jobs += j
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = jobs.synchronized {
        jobs.find(_.id == e.jobId).foreach(_.t1 = e.time)
      }
    }
    spark.sparkContext.addSparkListener(listener)

    (1 to passes).foreach { p =>
      jobs.synchronized(jobs.clear())
      val t0 = System.nanoTime()
      val cnt = graft.SparkEntry.queries(name)(spark, sf).count()
      val dt = (System.nanoTime() - t0) / 1e9
      graft.ops.ScratchCache.releaseAll()
      spark.catalog.clearCache()
      println(f"PASS $p $name $dt%8.2f s rows=$cnt")
      if (p == passes) {
        Thread.sleep(1500) // let the listener bus drain
        var prevEnd = 0L
        jobs.synchronized(jobs.toSeq).sortBy(_.t0).foreach { j =>
          val gap = if (prevEnd == 0) 0.0 else (j.t0 - prevEnd) / 1e3
          prevEnd = j.t1
          println(f"  job ${j.id}%3d ${(j.t1 - j.t0) / 1e3}%7.2f s  gap=$gap%6.2f s  tasks=${j.nTasks}%3d  ${j.desc.take(150)}")
        }
      }
    }
    spark.stop()
  }
}
