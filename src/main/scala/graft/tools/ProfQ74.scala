package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-cost split for q74 TF-IDF. */
object ProfQ74 {
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
    import spark.implicits._
    def time3(name: String)(f: => Any): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f
        graft.ops.ScratchCache.releaseAll(); spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"STAGE $name%-24s ${ts.map(t => f"$t%6.3f").mkString(" ")}")
    }
    val doc = graft.Tables.documents(spark, sf)
    doc.count()
    val tokens = graft.functions.TextFunctions.tokens _

    time3("count-job") { doc.count() }
    time3("toks-tf") {
      graft.ops.FanOut.cpu(doc)
        .select($"doc_id", explode(tokens($"text")).as("term"))
        .repartition($"term")
        .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf")).count()
    }
    time3("full-current") {
      graft.queries.TextQueries.q74Tfidf(spark, sf).count()
    }
    time3("full-nopersist") {
      val n = doc.count()
      val toks = graft.ops.FanOut.cpu(doc)
        .select($"doc_id", explode(tokens($"text")).as("term"))
        .repartition($"term")
      val tf = toks.groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
      val df = tf.groupBy($"term").agg(count(lit(1)).as("df"))
      val scored = tf.join(df, "term")
        .withColumn("score", $"tf" * log(lit(n.toDouble) / $"df"))
      scored.select($"doc_id", $"term", $"score", $"tf", $"df")
        .groupBy($"doc_id")
        .agg(slice(array_sort(collect_list(struct(
          (-$"score").as("ns"), $"term", $"score", $"tf", $"df"))), 1, 3)
          .as("top"))
        .select($"doc_id", posexplode($"top"))
        .select($"doc_id", ($"pos" + 1).cast("long").as("rank"),
          $"col.term".as("term"), $"col.score".as("score"),
          $"col.tf".as("tf"), $"col.df".as("df"))
        .orderBy($"doc_id", $"rank")
        .count()
    }
    spark.stop()
  }
}
