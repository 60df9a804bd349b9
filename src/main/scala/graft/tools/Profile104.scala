package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway per-stage profiler for q104 (VERDICT r13 item 1). */
object Profile104 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .appName("profile104").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import org.apache.spark.sql.functions._

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    // warm the session codegen paths once with a trivial job
    spark.range(1000).agg(sum("id")).collect()

    for (pass <- 1 to 3) {
      println(s"--- pass $pass")
      val emb = graft.Tables.embeddings(spark, sfDir)
      val cents = time("centroid collect") {
        emb.select($"vec_id".cast("long"), $"embedding")
          .as[(Long, Array[Float])].orderBy($"vec_id").limit(16).collect()
      }
      val scored = array(cents.map { case (cid, cv) =>
        struct(
          graft.functions.VectorFunctions.cosine($"embedding", typedlit(cv)).as("cos"),
          lit(-cid).as("ncid"))
      }: _*)
      val assigned = emb
        .select($"vec_id".cast("long").as("vec_id"), $"embedding")
        .withColumn("best", array_max(scored))
        .select($"vec_id", $"embedding", (-$"best.ncid").cast("long").as("cluster"))
      time("assignment (HOF) count") { assigned.groupBy($"cluster").count().collect() }

      // native-dot variant
      val normA = sqrt(graft.functions.DotProductF32.dot($"embedding", $"embedding"))
      val scoredN = array(cents.map { case (cid, cv) =>
        val nc = math.sqrt(cv.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble))
        struct(
          (graft.functions.DotProductF32.dot($"embedding", typedlit(cv)) /
            ($"na" * lit(nc))).as("cos"),
          lit(-cid).as("ncid"))
      }: _*)
      val assignedN = emb
        .select($"vec_id".cast("long").as("vec_id"), $"embedding", normA.as("na"))
        .withColumn("best", array_max(scoredN))
        .select($"vec_id", $"embedding", (-$"best.ncid").cast("long").as("cluster"))
      time("assignment (native) count") { assignedN.groupBy($"cluster").count().collect() }

      time("full q104") {
        graft.queries.CurationQueries.q104SemDedup(spark, sfDir).collect()
      }
    }
    spark.stop()
  }
}
