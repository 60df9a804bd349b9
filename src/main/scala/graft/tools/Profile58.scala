package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway per-stage profiler for q58 (VERDICT r13 item 3: commit the
  * constant-factor floor so the flip-flopping twin stops re-litigating). */
object Profile58 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .appName("profile58").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label%-30s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    spark.range(1000).agg(sum("id")).collect()

    for (pass <- 1 to 3) {
      println(s"--- pass $pass")
      val df0 = graft.Tables.documents(spark, sfDir)
      val df = graft.ops.FanOut.cpu(df0)
      val hp = graft.functions.ShingleExpressions.charWindowHashPos(col("text"), 30)
      val keep = df.select(explode(hp).as("w"))
        .select(col("w.h").as("h"))
        .groupBy(col("h")).count()
        .filter(col("count") >= 2 && col("count") <= lit(1000))
        .select("h")
      time("pass1: hash df count") { keep.count() }
      val sets = df.select(col("doc_id").cast("long").as("doc_id"),
          col("text").as("t"), explode(hp).as("w"))
        .withColumn("h", col("w.h"))
        .join(keep, Seq("h"), "left_semi")
        .select(col("doc_id"), col("t").substr(col("w.pos"), lit(30)).as("sub"))
        .groupBy("sub").agg(sort_array(collect_set(col("doc_id"))).as("ds"))
        .filter(size(col("ds")) >= 2)
      time("pass2: rescan+semi+sets") { sets.count() }
      time("full q58") {
        graft.queries.DedupQueries.q58SubstringDedup(spark, sfDir).collect()
      }
    }
    spark.stop()
  }
}
