package graft.ops

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

  /** Seeded Lloyd k-means on a driver-side sample. The sample is already
    * bounded (trainCap), so a plain JVM loop beats a distributed fit: the
    * previous Spark ML KMeans ran ~2 jobs PER iteration over a 3-partition
    * toy DataFrame — tens of scheduler round-trips to cluster rows that
    * all fit in one array. Centroid quality only affects probe recall,
    * never correctness (the probed cells are exact-ranked). */
  private[ops] def lloydCentroids(sample: Array[Array[Float]], k: Int,
                                  iters: Int, seed: Long): Array[Array[Float]] = {
    require(sample.nonEmpty, "empty training sample")
    val dim = sample.head.length
    val rnd = new scala.util.Random(seed)
    val kk = math.min(k, sample.length)
    var cents = rnd.shuffle(sample.indices.toVector).take(kk)
      .map(i => sample(i).map(_.toDouble)).toArray
    var it = 0
    while (it < iters) {
      val sums = Array.fill(kk)(new Array[Double](dim))
      val cnt = new Array[Int](kk)
      sample.foreach { v =>
        var best = 0; var bd = Double.MaxValue; var c = 0
        while (c < kk) {
          var d = 0.0; var j = 0
          while (j < dim) {
            val t = v(j).toDouble - cents(c)(j); d += t * t; j += 1
          }
          if (d < bd) { bd = d; best = c }
          c += 1
        }
        cnt(best) += 1
        var j = 0
        while (j < dim) { sums(best)(j) += v(j); j += 1 }
      }
      cents = cents.zipWithIndex.map { case (old, c) =>
        if (cnt(c) == 0) old else sums(c).map(_ / cnt(c))
      }
      it += 1
    }
    cents.map(_.map(_.toFloat))
  }

  /** Build: cluster on a (deterministic) sample, assign every row to its
    * cell via the native top-cells expression (no per-row UDF — the
    * centroid table rides in the plan, one fused JVM loop per row). */
  def build(emb: DataFrame, id: String, vec: String, nCells: Int,
            seed: Long = 42L, trainCap: Int = 65536): Index = {
    // centroid training is bounded by design: at 100 TB the fit runs on a
    // capped sample (centroid quality needs representativeness, not the
    // full corpus), while ASSIGNMENT below is distributed over everything
    val sample = emb.select(col(vec)).limit(trainCap).collect()
      .map(_.getSeq[Float](0).toArray)
    val cents = lloydCentroids(sample, nCells, iters = 8, seed = seed)
    val centroids = cents.zipWithIndex.map { case (c, i) => i -> c }
    // knn references the assigned frame four times (probe side, candidate
    // corpus side, query vectors, re-rank join) — persist so assignment
    // runs once, released by the session's ScratchCache sweep; a `load`ed
    // index reads the cell-partitioned parquet instead
    Index(centroids,
      ScratchCache.register(assignTo(emb, vec, cents).persist()))
  }

  /** Persist the index with the CELL AS THE PARTITION KEY: parquet
    * partitioned by `__cell` plus a JSON centroid sidecar. This is the
    * 100 TB form of the scale claim on this class — a probe of nProbe of
    * nCells cells reads exactly that fraction of the corpus, enforced by
    * Spark's partition pruning on the directory keys (spec-asserted via
    * the scan's selected-partition count). */
  def save(index: Index, id: String, vec: String, dst: String): Unit = {
    index.assigned
      .select(col(id), col(vec), col("__cell"))
      .write.mode("overwrite").partitionBy("__cell").parquet(dst + "/cells")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dst, "centroids.json"),
      CentroidJson.writeCells(index.centroids.map(_._2).toSeq))
  }

  /** Reopen a saved index: centroids from the sidecar (no data file is
    * touched), vectors as the cell-partitioned scan. */
  def load(spark: org.apache.spark.sql.SparkSession, dst: String): Index = {
    val cents = CentroidJson.parseCells(java.nio.file.Files.readString(
      java.nio.file.Paths.get(dst, "centroids.json")))
    Index(cents.zipWithIndex.map { case (c, i) => i -> c },
      spark.read.parquet(dst + "/cells"))
  }

  /** Cell assignment against a FIXED centroid table — the shared kernel
    * of [[build]] and [[append]] (one fused JVM loop per row, centroids
    * ride in the plan as literals). */
  def assignTo(emb: DataFrame, vec: String,
               cents: Array[Array[Float]]): DataFrame =
    emb.withColumn("__cell",
      element_at(graft.functions.NearestCells.topCells(col(vec), cents, 1), 1))

  /** Incrementally GROW a saved index: assign `newEmb` to the EXISTING
    * centroids and parquet-append into the cell partitions — no
    * re-clustering, no rewrite of the resident corpus. This is how a
    * 100 TB vector index absorbs a daily ingest batch: the batch pays one
    * assignment scan + one append; probe cost afterwards is identical to
    * a from-scratch build with the same centroids (spec-asserted), because
    * querying only ever sees (centroids, cell-partitioned rows). Repeated
    * small appends fragment the cell directories — [[compact]] rewrites
    * them; probe results are unaffected either way.
    *
    * Like BandIndex.append, ids must be disjoint from the resident
    * corpus (the knn dedupe treats equal ids as self-pairs). */
  def append(spark: org.apache.spark.sql.SparkSession, dst: String,
             newEmb: DataFrame, id: String, vec: String): Index = {
    val cents = CentroidJson.parseCells(java.nio.file.Files.readString(
      java.nio.file.Paths.get(dst, "centroids.json")))
    // column names must match the resident cells: a parquet append with
    // different names would silently UNION the schemas and null out
    // every resident column on read — refuse loudly instead
    val existing = spark.read.parquet(dst + "/cells").columns.toSet
    require(existing == Set(id, vec, "__cell"),
      s"IvfIndex.append: saved index has columns $existing, " +
        s"append offers ${Set(id, vec, "__cell")} — names must match")
    assignTo(newEmb, vec, cents.toArray)
      .select(col(id), col(vec), col("__cell"))
      .write.mode("append").partitionBy("__cell").parquet(dst + "/cells")
    load(spark, dst)
  }

  /** Rewrite append-fragmented cell partitions: one file per cell again
    * (the build layout), via the BandIndex tmp/old directory swap so a
    * crash mid-compaction never leaves the index unreadable. Probe
    * results are identical before and after — only file counts change. */
  def compact(spark: org.apache.spark.sql.SparkSession, dst: String): Unit = {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    def rmTree(p: java.nio.file.Path): Unit =
      if (Files.exists(p))
        Files.walk(p).sorted(java.util.Comparator.reverseOrder())
          .iterator().asScala.foreach(q => Files.deleteIfExists(q))
    val dir = Paths.get(dst, "cells")
    val tmp = Paths.get(dst, "cells_tmp")
    val old = Paths.get(dst, "cells_old")
    rmTree(tmp); rmTree(old)
    spark.read.parquet(dir.toString)
      .repartition(col("__cell"))
      .write.mode("overwrite").partitionBy("__cell").parquet(tmp.toString)
    Files.move(dir, old)
    Files.move(tmp, dir)
    rmTree(old) // best-effort GC of the replaced generation
  }

  /** Query: probe the nProbe nearest cells per query vector, exact-rank
    * members by cosine. Id contract: `id` values must lie in [0, 2³²) —
    * the candidate dedupe packs (qid, cid) into one long (PackedPair) and
    * raises on out-of-range ids rather than corrupting pairs. */
  def knn(index: Index, id: String, vec: String,
          queryPred: org.apache.spark.sql.Column, k: Int, nProbe: Int): DataFrame = {
    val cents = index.centroids.map(_._2)
    val q = index.assigned.filter(queryPred)
      .select(col(id).as("qid"),
        explode(graft.functions.NearestCells.topCells(col(vec), cents, nProbe))
          .as("__cell"))
    // candidate ids first, vectors joined back after the dedupe — the
    // nProbe-way expansion never shuffles embedding payloads. PackedPair
    // raises on ids outside [0, 2^32) rather than corrupting the key.
    val cands = index.assigned
      .select(col(id).as("cid"), col("__cell"))
      .join(q, Seq("__cell"))
      .filter(col("qid") =!= col("cid"))
      .select(PackedPair.pack(col("qid"), col("cid")).as("pair"))
      .distinct() // one packed long per candidate in the dedupe shuffle
      .select(PackedPair.idA(col("pair")).as("qid"),
        PackedPair.idB(col("pair")).as("cid"))
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
