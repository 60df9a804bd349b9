// scratch: quantify the maxDf cap under a planted ubiquitous shingle —
//   sbt -batch "runMain graft.tools.ProfHotShingle"
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ProfHotShingle {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("PROF_SF", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $name%-26s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
    }
    // plant one shingle shared by EVERY doc: df = 5000 → 12.5M extra
    // self-join rows uncapped; the cap drops it from the universe
    val docs = graft.Tables.documents(spark, sf)
      .withColumn("text", concat(col("text"), lit(" zz0 zz1 zz2")))
    time("uncapped (hot shingle)") {
      graft.ops.Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.7).count()
    }
    spark.catalog.clearCache()
    time("capped maxDf=1000") {
      graft.ops.Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.7,
        maxDf = Some(1000)).count()
    }
    spark.stop()
  }
}
