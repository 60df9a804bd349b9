package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{IvfIndex, Rebalance, Similarity}

class IvfSpec extends AnyFunSuite with SparkSpecBase {
  import spark.implicits._

  test("IVF knn reaches higher recall than hyperplane LSH at same k") {
    val emb = Tables.embeddings(spark, sfSmoke)
    val brute = Similarity.knnBrute(emb, "vec_id", "embedding", $"vec_id" < 10, 5)
      .select($"qid", $"cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val idx = IvfIndex.build(emb, "vec_id", "embedding", nCells = 16)
    // weakly-similar synthetic data: recall tracks the probed fraction;
    // 6/16 cells ≈ 38% of the corpus should recover well over half the
    // true top-5 (hyperplane LSH measured 0.45 on the same data)
    val ivf = IvfIndex.knn(idx, "vec_id", "embedding", $"vec_id" < 10, 5, nProbe = 6)
      .select($"qid", $"cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall >= 0.55, s"IVF recall $recall")
  }

  test("IVF save/load: cell-partitioned layout, sidecar centroids, knn parity") {
    val emb = Tables.embeddings(spark, sfSmoke)
    val idx = IvfIndex.build(emb, "vec_id", "embedding", nCells = 16)
    val dst = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    IvfIndex.save(idx, "vec_id", "embedding", dst)
    val loaded = IvfIndex.load(spark, dst)
    // centroids round-trip through the sidecar (no data file touched)
    assert(loaded.centroids.map(_._1).toSeq == idx.centroids.map(_._1).toSeq)
    idx.centroids.zip(loaded.centroids).foreach { case ((_, a), (_, b)) =>
      assert(a.toSeq == b.toSeq)
    }
    // identical probes on built vs reopened index
    def res(i: IvfIndex.Index) =
      IvfIndex.knn(i, "vec_id", "embedding", $"vec_id" < 10, 5, nProbe = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(res(loaded) == res(idx))
  }

  test("append grows a saved index to knn-parity with a full build; compact defragments") {
    val emb = Tables.embeddings(spark, sfSmoke)
    val half1 = emb.filter($"vec_id" % 2 === 0)
    val half2 = emb.filter($"vec_id" % 2 =!= 0)
    // build + save on half the corpus, append the rest in two batches
    // (two appends so the cell dirs genuinely fragment)
    val idx1 = IvfIndex.build(half1, "vec_id", "embedding", nCells = 16)
    val dst = java.nio.file.Files.createTempDirectory("graft-ivf-app").toString
    IvfIndex.save(idx1, "vec_id", "embedding", dst)
    IvfIndex.append(spark, dst, half2.filter($"vec_id" % 4 === 1),
      "vec_id", "embedding")
    val grown = IvfIndex.append(spark, dst, half2.filter($"vec_id" % 4 === 3),
      "vec_id", "embedding")
    assert(grown.assigned.count() == emb.count())
    // parity: a from-scratch assignment of the FULL corpus to the SAME
    // centroids must answer probes identically
    val full = IvfIndex.Index(idx1.centroids,
      IvfIndex.assignTo(emb, "embedding", idx1.centroids.map(_._2)))
    def res(i: IvfIndex.Index) =
      IvfIndex.knn(i, "vec_id", "embedding", $"vec_id" < 10, 5, nProbe = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val before = res(grown)
    assert(before == res(full))
    // compact: fewer files, identical probes
    def nFiles = java.nio.file.Files.walk(
        java.nio.file.Paths.get(dst, "cells"))
      .filter(p => p.toString.endsWith(".parquet")).count()
    val fragmented = nFiles
    IvfIndex.compact(spark, dst)
    assert(nFiles < fragmented,
      s"compact should shrink $fragmented parquet files")
    assert(res(IvfIndex.load(spark, dst)) == before)
  }

  test("a probe of k cells reads exactly k partitions (write-time pruning)") {
    val emb = Tables.embeddings(spark, sfSmoke)
    val idx = IvfIndex.build(emb, "vec_id", "embedding", nCells = 16)
    val dst = java.nio.file.Files.createTempDirectory("graft-ivf-prune").toString
    IvfIndex.save(idx, "vec_id", "embedding", dst)
    val loaded = IvfIndex.load(spark, dst)
    val nParts = loaded.assigned.select("__cell").distinct().count()
    assert(nParts > 4, s"fixture clustered into only $nParts cells")
    val probed = loaded.assigned.filter($"__cell".isin(0, 1))
    val scan = probed.queryExecution.executedPlan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scan.nonEmpty, probed.queryExecution.executedPlan.toString)
    val selected = scan.head.selectedPartitions.partitionCount
    assert(selected <= 2, s"probe of 2 cells scanned $selected partitions")
  }

  test("salted sum/count equals the plain aggregate") {
    val li = Tables.lineitem(spark, sfSmoke)
    val plain = li.groupBy($"l_returnflag")
      .agg(sum($"l_quantity").as("sum_l_quantity"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), (r.getDouble(1), r.getLong(2)))).toMap
    val salted = Rebalance.saltedSumCount(li, Seq("l_returnflag"), "l_quantity")
      .collect().map(r => (r.getString(0), (r.getDouble(1), r.getLong(2)))).toMap
    assert(salted.keySet == plain.keySet)
    salted.foreach { case (k, (s, n)) =>
      assert(n == plain(k)._2)
      assert(math.abs(s - plain(k)._1) < 1e-6)
    }
  }
}
