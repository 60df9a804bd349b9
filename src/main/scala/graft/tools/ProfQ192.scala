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
      // variant C: codegen'd packedPairs kernel (collect_list — the kernel
      // sorts+dedups in-row), freq still its own explode+shuffle
      val basketsC = li.groupBy($"ok")
        .agg(collect_list($"item").as("its")).persist()
      t("C baskets (list)")(basketsC.count())
      t("C kernel pairs+agg")(basketsC
        .select(explode(graft.functions.GraphFunctions.packedPairs($"its")).as("pk"))
        .groupBy($"pk").agg(count(lit(1)).as("f_ab"))
        .filter($"f_ab" >= 3L).count())
      t("C freq")(basketsC.select(explode($"its").as("item")).distinct()
        .groupBy($"item").agg(count(lit(1))).count())
      basketsC.unpersist()
      // variant D: fused pairs+singles — ONE explode+shuffle yields pair
      // counts AND item frequencies (diagonal keys), full query to output
      val basketsD = li.groupBy($"ok")
        .agg(collect_list($"item").as("its")).persist()
      t("D baskets (list)")(basketsD.count())
      val aggD = basketsD
        .select(explode(
          graft.functions.GraphFunctions.packedPairsAndSingles($"its")).as("pk"))
        .groupBy($"pk").agg(count(lit(1)).as("f_ab")).persist()
      t("D fused explode+agg")(aggD.count())
      t("D assembly")({
        val tot = basketsD.agg(count(lit(1)).as("n"))
        val freq = aggD
          .filter(shiftrightunsigned($"pk", 32) === $"pk".bitwiseAND(lit(0xFFFFFFFFL)))
          .select(shiftrightunsigned($"pk", 32).as("item"), $"f_ab".as("f"))
        aggD
          .filter(shiftrightunsigned($"pk", 32) =!= $"pk".bitwiseAND(lit(0xFFFFFFFFL)))
          .filter($"f_ab" >= 3L)
          .select(shiftrightunsigned($"pk", 32).as("item_a"),
            $"pk".bitwiseAND(lit(0xFFFFFFFFL)).as("item_b"), $"f_ab")
          .join(broadcast(freq.select($"item".as("item_a"), $"f".as("f_a"))), Seq("item_a"))
          .join(broadcast(freq.select($"item".as("item_b"), $"f".as("f_b"))), Seq("item_b"))
          .crossJoin(broadcast(tot))
          .select($"item_a", $"item_b", $"f_ab",
            (($"f_ab" * $"n").cast("double") / ($"f_a" * $"f_b").cast("double")).as("lift"))
          .orderBy($"lift".desc, $"item_a", $"item_b").limit(50).count()
      })
      aggD.unpersist(); basketsD.unpersist()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
