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
    time("warmup-tokens") {
      docs.select(graft.functions.TextFunctions.tokens(col("text")).as("ws"))
        .select(sum(size(col("ws")))).collect()
    }
    // new-plan stages
    val sets0 = ops.Dedup.shingleSets(docs, "doc_id", "text", 3).cache()
    time("hot-job (df counts)") {
      sets0.select(explode(col("shingles")).as("s"))
        .groupBy("s").count().filter(col("count") > 1000).select("s").collect()
    }
    val inv = sets0
      .withColumn("n", size(col("shingles"))).filter(col("n") > 0)
      .select(col("doc_id"), col("n"), explode(col("shingles")).as("s"))
      .cache()
    time("inv-materialize") { inv.count() }
    time("selfjoin-hash+agg") {
      inv.as("a").join(inv.as("b").hint("SHUFFLE_HASH"),
          col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
        .select(shiftleft(col("a.doc_id"), 32).bitwiseOR(col("b.doc_id")).as("pair"),
          col("a.n").as("na0"), col("b.n").as("nb0"))
        .groupBy(col("pair"))
        .agg(count(lit(1)).as("inter"), first(col("na0")).as("na"), first(col("nb0")).as("nb"))
        .select(count(lit(1))).collect()
    }
    spark.catalog.clearCache()
    time("full-q27 (cold)") {
      queries.DedupQueries.q27NgramJaccard(spark, sf).count()
    }
    spark.catalog.clearCache()
    time("full-q27 (again)") {
      queries.DedupQueries.q27NgramJaccard(spark, sf).count()
    }
    spark.stop()
  }
}
