package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Pass-level q58 cost split: window kernel alone, pass-1 df count alone,
  * then the full plan — each ×3 in-session. */
object ProfQ58b {
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
    def time3(name: String)(f: => Any): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"STAGE $name%-24s ${ts.map(t => f"$t%6.3f").mkString(" ")}")
    }
    val docs = graft.Tables.documents(spark, sf)
    docs.count()
    val fanned = graft.ops.FanOut.cpu(docs)
    val hp = graft.functions.ShingleExpressions.charWindowHashPos(col("text"), 30)

    time3("kernel-only") {
      fanned.select(explode(hp).as("w")).select(col("w.h")).count()
    }
    time3("pass1-keep") {
      fanned.select(explode(hp).as("w")).select(col("w.h").as("h"))
        .repartition(32, col("h"))
        .groupBy("h").count()
        .filter(col("count") >= 2 && col("count") <= 1000)
        .count()
    }
    time3("pass1-noRepart") {
      fanned.select(explode(hp).as("w")).select(col("w.h").as("h"))
        .groupBy("h").count()
        .filter(col("count") >= 2 && col("count") <= 1000)
        .count()
    }
    time3("full") {
      graft.ops.Dedup.substringPairs(docs, "doc_id", "text", 30, Some(1000)).count()
    }
    // one-shuffle variant: carry (doc_id, pos) through a single groupBy(h)
    // (collect_list), then re-materialize window text for survivors only by
    // joining the tiny survivor set back to the docs
    time3("one-shuffle") {
      val wins = fanned.select(col("doc_id").cast("long").as("doc_id"),
          explode(hp).as("w"))
        .select(col("w.h").as("h"), col("doc_id"), col("w.pos").as("pos"))
        .groupBy("h").agg(collect_list(struct(col("doc_id"), col("pos"))).as("dp"))
        .filter(size(col("dp")).between(2, 1000))
      val surv = wins.select(col("h"), explode(col("dp")).as("e"))
        .select(col("e.doc_id").as("doc_id"), col("e.pos").as("pos"))
      val subs = surv.join(docs.select(col("doc_id").cast("long").as("doc_id"),
          col("text")), Seq("doc_id"))
        .select(col("doc_id"), col("text").substr(col("pos"), lit(30)).as("sub"))
        .groupBy("sub").agg(sort_array(collect_set(col("doc_id"))).as("ds"))
        .filter(size(col("ds")) >= 2)
      subs.select(col("sub"), explode(expr(
          "flatten(transform(ds, (a, i) -> " +
          "transform(slice(ds, i + 2, size(ds)), b -> struct(a, b))))")).as("pr"))
        .groupBy(col("pr.a").as("id_a"), col("pr.b").as("id_b"))
        .agg(count(lit(1)).as("shared"), min(col("sub")).as("example"))
        .count()
    }
    spark.stop()
  }
}
