package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** q195 shape shootout at PROF_SF: two plain aggregations (shipped) vs a
  * single-shuffle collect_set-of-packed-longs variant. */
object ProfQ195 {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("PROF_SF", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.shuffle.compress", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $tag%-22s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    graft.Tables.lineitem(spark, sf).count()
    for (pass <- 1 to 2) {
      println(s"--- pass $pass")
      t("A two-agg (shipped)")(
        graft.queries.Relational.q195BlameSupplier(spark, sf).count())
      // B: ONE shuffle — collect_set of suppkey*2+flag per order, array ops
      val li = graft.Tables.lineitem(spark, sf)
        .select($"l_orderkey".as("ok"),
          ($"l_suppkey".cast("long") * 2L +
            when($"l_returnflag" === "R", 1L).otherwise(0L)).as("pk"))
      val perOrder = li.groupBy($"ok")
        .agg(collect_set($"pk").as("pks"))
        .select($"ok",
          size(array_distinct(transform($"pks", p => p / 2L))).as("n_supp"),
          filter($"pks", p => p % 2L === 1L).as("bad"))
        .filter($"n_supp" >= 2 &&
          size(array_distinct(transform($"bad", p => p / 2L))) === 1)
        .select($"ok", (element_at($"bad", 1) / 2L).as("bad_supp"))
      val fin = graft.Tables.orders(spark, sf)
        .filter($"o_orderstatus" === "F").select($"o_orderkey")
      t("B collect_set 1-shuffle")(perOrder
        .join(fin, $"ok" === $"o_orderkey", "left_semi")
        .join(graft.Tables.supplier(spark, sf),
          $"bad_supp" === $"s_suppkey".cast("long"))
        .groupBy($"s_name").agg(count(lit(1)).as("numwait"))
        .orderBy($"numwait".desc, $"s_name").limit(100).count())
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
