package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage timing for q192 variants at SPARK_GRAFT_SF_DIR. */
object ProfQ192 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.shuffle.compress", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $tag%-30s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    graft.Tables.lineitem(spark, sfDir).count()
    for (pass <- 1 to 2) {
      println(s"--- pass $pass")
      val li = graft.Tables.lineitem(spark, sfDir)
        .select($"l_orderkey".cast("long").as("ok"),
          $"l_partkey".cast("long").as("item"))
      // variant A: self-join
      val items = li.distinct().persist()
      t("A items distinct")(items.count())
      val a = items.select($"ok", $"item".as("item_a"))
      val b = items.select($"ok", $"item".as("item_b"))
      val pairsA = a.join(b, Seq("ok")).filter($"item_a" < $"item_b")
        .groupBy($"item_a", $"item_b").agg(count(lit(1)).as("f_ab"))
        .filter($"f_ab" >= 3L).persist()
      t("A pair join+agg")(pairsA.count())
      val freqA = items.groupBy($"item").agg(count(lit(1)).as("f")).persist()
      t("A freq")(freqA.count())
      t("A assembly")(pairsA
        .join(broadcast(freqA.select($"item".as("item_a"), $"f".as("f_a"))), Seq("item_a"))
        .join(broadcast(freqA.select($"item".as("item_b"), $"f".as("f_b"))), Seq("item_b"))
        .count())
      items.unpersist(); pairsA.unpersist(); freqA.unpersist()
      // variant B: basket arrays
      val baskets = li.groupBy($"ok")
        .agg(sort_array(collect_set($"item")).as("its")).persist()
      t("B baskets")(baskets.count())
      val pairsB = baskets
        .select(explode(flatten(transform($"its", (x, i) =>
          transform(slice($"its", i + lit(2), size($"its")),
            y => struct(x.as("item_a"), y.as("item_b")))))).as("p"))
        .select($"p.item_a", $"p.item_b")
        .groupBy($"item_a", $"item_b").agg(count(lit(1)).as("f_ab"))
        .filter($"f_ab" >= 3L)
      t("B pair explode+agg")(pairsB.count())
      baskets.unpersist()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
