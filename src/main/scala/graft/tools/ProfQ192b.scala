// scratch: q192 job-level timing + reuse check —
//   sbt -batch "runMain graft.tools.ProfQ192b"
package graft.tools

import org.apache.spark.sql.SparkSession

object ProfQ192b {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("PROF_SF", "/tmp/sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.register(spark)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Long]
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.put(js.jobId, js.time)
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        println(f"  JOB ${je.jobId}%3d ${(je.time - jobs.getOrDefault(je.jobId, je.time)) / 1e3}%6.2f s")
    })
    graft.Tables.lineitem(spark, sf).count()
    for (pass <- 1 to 2) {
      println(s"--- pass $pass")
      val t0 = System.nanoTime()
      val df = graft.queries.AdvancedQueries.q192BasketLift(spark, sf)
      println(f"construct ${(System.nanoTime() - t0) / 1e9}%.2f s")
      val t1 = System.nanoTime()
      df.count()
      println(f"run       ${(System.nanoTime() - t1) / 1e9}%.2f s")
      if (pass == 2) {
        val plan = df.queryExecution.executedPlan.toString
        println("ReusedExchange lines: " +
          plan.split('\n').count(_.contains("ReusedExchange")))
      }
      graft.ops.ScratchCache.releaseAll()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
