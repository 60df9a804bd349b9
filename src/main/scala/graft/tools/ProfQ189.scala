package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-stage timing of q189's BFS at SPARK_GRAFT_SF_DIR — which level /
  * which sub-plan owns the wall clock. */
object ProfQ189 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.shuffle.compress", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    // warm tables
    graft.Tables.lineitem(spark, sfDir).count()
    for (pass <- 1 to 2) {
      println(s"--- pass $pass")
      val base = graft.Tables.lineitem(spark, sfDir)
        .select($"l_suppkey".cast("long").as("src"),
          ($"l_partkey".cast("long") + 1000000L).as("dst"))
      val edges = base.unionByName(base.select($"dst".as("src"), $"src".as("dst")))
      val e = edges.persist()
      t("edges persist")(e.count())
      var visited = t("seeds")(graft.Tables.lineitem(spark, sfDir)
        .filter($"l_suppkey" < 10)
        .select($"l_suppkey".cast("long").as("id")).distinct()
        .select($"id", lit(0L).as("hop")).persist()).count()
      var vdf = graft.Tables.lineitem(spark, sfDir).filter($"l_suppkey" < 10)
        .select($"l_suppkey".cast("long").as("id"), lit(0L).as("hop")).distinct().persist()
      var frontier = vdf
      for (d <- 1 to 4) {
        val fr = frontier.select($"id".as("fid"))
        val next = e.join(broadcast(fr), $"fid" === $"src")
          .select($"dst".as("id")).distinct()
          .join(vdf, Seq("id"), "left_anti")
          .select($"id", lit(d.toLong).as("hop")).persist()
        val n = t(s"level $d")(next.count())
        println(s"[prof]   frontier=$n")
        vdf = vdf.unionByName(next).persist()
        frontier = next
      }
      t("final materialize")(vdf.orderBy($"id").collect().length)
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
