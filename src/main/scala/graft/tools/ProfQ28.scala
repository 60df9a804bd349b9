// scratch: q28 stage timing — sbt -batch "runMain graft.tools.ProfQ28"
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ProfQ28 {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("PROF_SF", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.register(spark)
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $name%-22s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
    }
    val docs = graft.Tables.documents(spark, sf)
    time("warm") { docs.count() }
    time("candidates") {
      graft.ops.Dedup.minhashCandidates(docs, "doc_id", "text", 3, 64, 2).count()
    }
    spark.catalog.clearCache()
    time("full-q28") {
      graft.ops.Dedup.minhashDedupPairs(docs, "doc_id", "text", 3, 0.8).count()
    }
    spark.catalog.clearCache()
    time("full-q28-again") {
      graft.ops.Dedup.minhashDedupPairs(docs, "doc_id", "text", 3, 0.8).count()
    }
    spark.stop()
  }
}
