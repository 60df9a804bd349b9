package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway per-stage profiler for q154 (VERDICT r13 item 2). */
object Profile154 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .appName("profile154").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import org.apache.spark.sql.functions._

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label%-30s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    spark.range(1000).agg(sum("id")).collect()

    for (pass <- 1 to 3) {
      println(s"--- pass $pass")
      val doc = graft.Tables.documents(spark, sfDir)
      val toks = graft.ops.ScratchCache.register(
        doc.select($"doc_id", $"source",
          graft.functions.TextFunctions.tokens($"text").as("ws")).persist())
      val bg = toks.where(size($"ws") >= 2)
        .select($"doc_id", $"source", explode(expr(
          "transform(sequence(0, size(ws)-2), " +
            "i -> struct(ws[i] as w1, ws[i+1] as w2))")).as("b"))
        .select($"doc_id", $"source", $"b.w1".as("w1"), $"b.w2".as("w2"))
      val uni = graft.ops.ScratchCache.register(
        toks.where($"source" === "src0")
          .select(explode($"ws").as("w"))
          .groupBy($"w").agg(count(lit(1)).as("c1")).persist())
      time("uni fill + count") { uni.count() }
      val big = bg.where($"source" === "src0")
        .groupBy($"w1", $"w2").agg(count(lit(1)).as("c12"))
      time("bg count (cached toks)") { bg.count() }
      time("big agg only") { big.count() }
      val vocab = uni.agg(count(lit(1)).as("v"))
      val joined = bg.join(big, Seq("w1", "w2"), "left")
      time("bg JOIN big") { joined.count() }
      val scored = joined
        .join(broadcast(uni.withColumnRenamed("w", "w1")), Seq("w1"), "left")
        .crossJoin(broadcast(vocab))
        .select($"doc_id",
          (-log((coalesce($"c12", lit(0L)) + lit(1.0)) /
            (coalesce($"c1", lit(0L)) + $"v"))).as("nll"),
          when($"c12".isNull, lit(1L)).otherwise(lit(0L)).as("unseen"))
      time("scored (all joins)") { scored.count() }
      time("scored + final agg") {
        scored.groupBy($"doc_id")
          .agg(count(lit(1)).as("n_bigrams"), avg($"nll").as("ce"),
            sum($"unseen").as("n_unseen")).count()
      }
      graft.ops.ScratchCache.releaseAll()
    }
    val q = graft.queries.TextQueries.q154LmFilter(spark, sfDir)
    println(q.queryExecution.executedPlan.toString.take(4000))
    spark.stop()
  }
}
