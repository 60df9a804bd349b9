package graft.ops

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.DotProductF32
import graft.functions.TextFunctions.roundp

/** IVF (inverted-file) approximate nearest neighbor — the k-means-cell
  * scale path for similarity search (BASELINE north star: "an IVF or LSH
  * bucketed variant").
  *
  * Index = KMeans centroids (deterministic seed) + a corpus partitioned by
  * nearest-centroid cell; query = score only the `nProbe` nearest cells'
  * members. At 100 TB the cell assignment is the write-time partition key
  * (one shuffle at index build, zero at query: cells are pruned partitions)
  * and centroids are a broadcast table.
  */
object IvfIndex {

  final case class Index(centroids: Array[(Int, Array[Float])], assigned: DataFrame)

  /** Build: cluster on a (deterministic) sample, assign every row to its
    * cell via the native top-cells expression (no per-row UDF — the
    * centroid table rides in the plan, one fused JVM loop per row). */
  def build(emb: DataFrame, id: String, vec: String, nCells: Int,
            seed: Long = 42L, trainCap: Int = 65536): Index = {
    val spark = emb.sparkSession
    import spark.implicits._
    // centroid training is bounded by design: at 100 TB the fit runs on a
    // capped sample (centroid quality needs representativeness, not the
    // full corpus), while ASSIGNMENT below is distributed over everything
    val train = emb.select(col(vec)).limit(trainCap).as[Array[Float]]
      .map(a => org.apache.spark.ml.feature.LabeledPoint(0.0,
        Vectors.dense(a.map(_.toDouble))))
      .toDF()
    // random init (seeded): k-means|| init costs several extra distributed
    // passes that buy nothing at IVF's coarse-quantizer quality bar
    val model = new KMeans().setK(nCells).setSeed(seed).setMaxIter(8)
      .setInitMode("random").setFeaturesCol("features").fit(train)
    val centroids = model.clusterCenters.zipWithIndex
      .map { case (c, i) => i -> c.toArray.map(_.toFloat) }
    val cents = centroids.map(_._2)
    Index(centroids, emb.withColumn("__cell",
      element_at(graft.functions.NearestCells.topCells(col(vec), cents, 1), 1)))
  }

  /** Query: probe the nProbe nearest cells per query vector, exact-rank
    * members by cosine. */
  def knn(index: Index, id: String, vec: String,
          queryPred: org.apache.spark.sql.Column, k: Int, nProbe: Int): DataFrame = {
    val cents = index.centroids.map(_._2)
    val q = index.assigned.filter(queryPred)
      .select(col(id).as("qid"),
        explode(graft.functions.NearestCells.topCells(col(vec), cents, nProbe))
          .as("__cell"))
    // candidate ids first, vectors joined back after the dedupe — the
    // nProbe-way expansion never shuffles embedding payloads
    val cands = index.assigned
      .select(col(id).as("cid"), col("__cell"))
      .join(q, Seq("__cell"))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"))
      .distinct()
    val qv = broadcast(index.assigned.filter(queryPred)
      .select(col(id).as("qid"), col(vec).as("qv")))
    val scored = cands
      .join(qv, Seq("qid"))
      .join(index.assigned.select(col(id).as("cid"), col(vec).as("cv")), Seq("cid"))
      .select(col("qid"), col("cid"),
        roundp(DotProductF32.cosine(col("qv"), col("cv")), 6).as("cos"))
    Similarity.topKRank(scored, k)
  }
}
