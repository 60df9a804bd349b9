package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase split for q173: token-join+persist vs PercentileCut cuts vs
  * final census — isolates where the histogram-cut rewrite spends. */
object ProfQ173 {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("PROF_SF", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.register(spark)
    import spark.implicits._
    import graft.functions.TextFunctions.{tokens, roundp}

    for (round <- 1 to 2) {
      var t0 = System.nanoTime()
      def lap(tag: String): Unit = {
        println(f"PROF[$round] $tag%-18s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
        t0 = System.nanoTime()
      }
      val toks = graft.Tables.documents(spark, sf)
        .select($"doc_id", $"source", explode(tokens($"text")).as("w"))
      val model = toks.groupBy($"w").agg(count(lit(1)).as("c"))
      val stats = model.agg(sum($"c").as("n_tok"), count(lit(1)).as("vocab"))
      val nll = graft.ops.ScratchCache.register(
        toks.join(broadcast(model), Seq("w"))
          .crossJoin(broadcast(stats))
          .groupBy($"doc_id", $"source")
          .agg(roundp(avg(-log(($"c" + lit(1.0)) / ($"n_tok" + $"vocab"))), 6)
            .as("nll"))
          .persist())
      val nd = nll.count()
      lap(s"nll+persist n=$nd")
      val cuts = graft.ops.PercentileCut.cuts(nll, "nll", Seq(1.0 / 3, 2.0 / 3))
      lap(s"percentile_cut ${cuts.mkString(",")}")
      val old = nll.agg(percentile($"nll", lit(1.0 / 3)),
        percentile($"nll", lit(2.0 / 3))).head()
      lap(s"builtin_pctile ${old.getDouble(0)},${old.getDouble(1)}")
      val census = nll
        .select($"source",
          when($"nll" <= lit(cuts(0)), "0_head")
            .when($"nll" <= lit(cuts(1)), "1_middle")
            .otherwise("2_tail").as("bucket"))
        .groupBy($"source", $"bucket").agg(count(lit(1)).as("n_docs"))
        .count()
      lap(s"census rows=$census")
      graft.ops.ScratchCache.releaseAll()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
