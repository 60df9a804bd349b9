// scratch: stage-wise q27 timing — run with
//   sbt -batch "runMain graft.ProfQ27"
package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ProfQ27 {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("PROF_SF", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftExtensions.register(spark)
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
    }
    val docs = Tables.documents(spark, sf)
    time("tokens") {
      docs.select(graft.functions.TextFunctions.tokens(col("text")).as("ws"))
        .select(sum(size(col("ws")))).collect()
    }
    time("shingles") {
      ops.Dedup.shingleSets(docs, "doc_id", "text", 3)
        .select(sum(size(col("shingles")))).collect()
    }
    val inv = ops.Dedup.shingleSets(docs, "doc_id", "text", 3)
      .select(col("doc_id"), explode(col("shingles")).as("s"))
    time("explode-count") { inv.select(count(lit(1))).collect() }
    time("selfjoin-count") {
      inv.as("a").join(inv.as("b"),
          col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
        .select(count(lit(1))).collect()
    }
    time("full-q27") {
      queries.DedupQueries.q27NgramJaccard(spark, sf).count()
    }
    spark.stop()
  }
}
