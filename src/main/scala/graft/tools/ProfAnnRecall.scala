package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: per-query-point recall of each ANN path vs brute force at
  * PROF_SF — sizes the recall-metric oracle thresholds (q32/q40/q45/q49).
  * `runMain graft.tools.ProfAnnRecall`. */
object ProfAnnRecall {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("PROF_SF", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val brute = graft.queries.SimilarityQueries.q31KnnBrute(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    for (name <- Seq("q32_knn_lsh", "q40_knn_ivf", "q45_knn_pq", "q49_knn_ivfpq")) {
      val ann = graft.SparkEntry.queries(name)(spark, sf)
        .collect().map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
        .view.mapValues(_.map(_._2).toSet).toMap
      val recalls = brute.keys.toSeq.sorted.map { q =>
        val hits = (brute(q) & ann.getOrElse(q, Set.empty)).size
        q -> (hits, ann.getOrElse(q, Set.empty).size)
      }
      val rs = recalls.map(_._2._1 / 5.0)
      println(f"RECALL $name min=${rs.min}%.2f mean=${rs.sum / rs.size}%.2f " +
        s"nlt5=${recalls.count(_._2._2 < 5)} " +
        s"per=${recalls.map(r => s"${r._1}:${r._2._1}").mkString(",")}")
    }
    spark.stop()
  }
}
