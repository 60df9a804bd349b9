// scratch: dup-collapse sliver-gate stage timing —
//   sbt -batch "runMain graft.tools.ProfGate"
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ProfGate {
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
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
    }
    def reset(): Unit = {
      graft.ops.ScratchCache.releaseAll(); spark.catalog.clearCache()
    }
    // job-level timing: description -> seconds
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.put(js.jobId, (Option(js.properties.getProperty("spark.job.description"))
          .getOrElse("?"), js.time))
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val (d, t0) = jobs.getOrDefault(je.jobId, ("?", je.time))
        println(f"  JOB ${je.jobId}%3d ${(je.time - t0) / 1e3}%6.2f s  $d")
      }
    })
    val docs = graft.Tables.documents(spark, sf)
    time("warm") { docs.count() }
    reset()
    for (i <- 1 to 2) {
      spark.sparkContext.setJobDescription(s"construct-$i")
      val p = time(s"cc-construct-$i") {
        graft.ops.Dedup.minhashDedupPairs(docs, "doc_id", "text", 3, 0.8)
      }
      spark.sparkContext.setJobDescription(s"ccrun-$i")
      time(s"cc-run-$i") {
        graft.ops.Dedup.connectedComponents(p, "id_a", "id_b").count()
      }
      reset()
    }
    spark.stop()
  }
}
