package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.cube.ChunkRow
import graft.model.GridDef
import graft.zarr.ArrayStore

class ChunkSourceSpec extends AnyFunSuite with SparkSpecBase {
  import spark.implicits._

  private val grid = GridDef(3, 2, 4, 4, 2, 2, 4)
  private def rows = for {
    t <- 0 until 3; b <- 0 until 2; cy <- 0 until 2; cx <- 0 until 2
  } yield ChunkRow(t, b, cy, cx, Array.tabulate(4)(i => (t * 100 + b * 10 + i).toFloat))

  private lazy val root: String = {
    val r = java.nio.file.Files.createTempDirectory("graft-dsv2").toString
    ArrayStore.init(r, ArrayStore.Meta(grid, Seq("B1", "B2")))
    ArrayStore.write(spark.createDataset(rows), r)
    r
  }

  private def load = spark.read.format("graft.zarr.ChunkStoreSource").load(root)

  test("DSv2 scan reads every chunk with correct payloads") {
    val got = load.collect()
    assert(got.length == rows.size)
    val r = load.filter($"time" === 1 && $"band" === 1 && $"cy" === 0 && $"cx" === 1)
      .select($"data").as[Array[Float]].collect().head
    assert(r.toSeq == Seq(110f, 111f, 112f, 113f))
  }

  test("key predicates are pushed down and prune files at plan time") {
    val df = load.filter($"time" === 2 && $"cy" === 0)
    assert(df.count() == 2 * 1 * 2) // bands x cy=0 x cx
    val scan = df.queryExecution.sparkPlan.collectLeaves().head
    val desc = scan.toString
    assert(desc.contains("PushedFilters") &&
      (desc.contains("EqualTo(time,2)") || desc.contains("time")), desc)
    // pruning check: the scan's partitions only carry matching files
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val batch = df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b
    }
    // under AQE the BatchScanExec may be nested; fall back to sparkPlan
    val b = if (batch.nonEmpty) batch
      else df.queryExecution.sparkPlan.collect { case b: BatchScanExec => b }
    assert(b.nonEmpty)
    val nFiles = b.head.inputPartitions.map(
      _.asInstanceOf[graft.zarr.ChunkInputPartition].files.length).sum
    assert(nFiles == 4, s"expected 4 pruned files, scan reads $nFiles")
  }

  test("non-key filters stay residual and still apply") {
    val df = load.filter(element_at($"data", 1) === 110f)
    val got = df.collect()
    assert(got.length == 4) // t=1,b=1: all 4 spatial chunks share that payload
  }
}
