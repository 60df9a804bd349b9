package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B: Bfs.distances (per-level actions) vs Bfs.distancesFused (one
  * lazy plan) on q189's real supplier↔part graph at SPARK_GRAFT_SF_DIR —
  * which regime the auto-switch should prefer when the node bound fits
  * the broadcast budget. */
object ProfQ189b {
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
    def t(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[prof] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s  rows=$n")
    }
    graft.Tables.lineitem(spark, sfDir).count()
    def graph() = {
      val base = graft.Tables.lineitem(spark, sfDir)
        .select($"l_suppkey".cast("long").as("src"),
          ($"l_partkey".cast("long") + 1000000L).as("dst"))
      val edges = base.unionByName(base.select($"dst".as("src"), $"src".as("dst")))
      val seeds = graft.Tables.lineitem(spark, sfDir).filter($"l_suppkey" < 10)
        .select($"l_suppkey".cast("long").as("id")).distinct()
      (edges, seeds)
    }
    for (pass <- 1 to 3) {
      println(s"--- pass $pass")
      locally {
        val (e, s) = graph()
        t("per-level distances")(
          graft.ops.Bfs.distances(e, s, 4).orderBy($"id").count())
        graft.ops.ScratchCache.releaseAll(); spark.catalog.clearCache()
      }
      locally {
        val (e, s) = graph()
        t("fused")(
          graft.ops.Bfs.distancesFused(e, s, 4).orderBy($"id").count())
        graft.ops.ScratchCache.releaseAll(); spark.catalog.clearCache()
      }
      locally {
        // fused with the edge table persisted (every level scans it)
        val (e, s) = graph()
        val ep = graft.ops.ScratchCache.register(e.persist())
        t("fused + edge persist")(
          graft.ops.Bfs.distancesFused(ep, s, 4).orderBy($"id").count())
        graft.ops.ScratchCache.releaseAll(); spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
