// scratch: stage-wise q103 timing — run with
//   sbt -batch "runMain graft.ProfQ103"
package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ProfQ103 {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("PROF_SF", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
    }
    import graft.ops.PackedPair
    val pairs = Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("o"), col("l_partkey").cast("long").as("p"))
      .groupBy(col("o")).agg(sort_array(collect_set(col("p"))).as("ps"))
      .select(explode(expr(
        "flatten(transform(ps, (a, i) -> " +
        "transform(slice(ps, i + 2, size(ps)), b -> struct(a, b))))")).as("pr"))
    time("pairs-count") { println("  pairs=" + pairs.count()) }
    val e = pairs.select(PackedPair.pack(col("pr.a"), col("pr.b")).as("uv")).distinct()
      .select(PackedPair.idA(col("uv")).as("u"), PackedPair.idB(col("uv")).as("v"))
      .persist()
    time("e-materialize") { println("  edges=" + e.count()) }
    time("tri-broadcast") {
      println("  tri=" + queries.GraphQueries
        .triangleCount(e, broadcastEdges = true).head().getLong(0))
    }
    time("tri-broadcast-2") {
      queries.GraphQueries.triangleCount(e, broadcastEdges = true).head()
    }
    time("nodes-metric") {
      e.select(col("u").as("id")).union(e.select(col("v")))
        .agg(countDistinct(col("id"))).collect()
    }
    e.unpersist()
    spark.stop()
  }
}
