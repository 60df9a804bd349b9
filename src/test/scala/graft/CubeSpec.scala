package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.cube.{ChunkRow, ChunkTable}
import graft.model.{GridDef, Region}
import graft.plan.RegionPlanner
import graft.zarr.ArrayStore

/** Golden tests for the cube substrate, mirroring the reference's planner
  * properties (tests/unit/flytemosaic/test_mosaics.py) plus masked-reduce
  * math against hand-computed arrays (SURVEY §5). */
class CubeSpec extends AnyFunSuite with SparkSpecBase {
  import spark.implicits._

  // 2×2 chunks, grid 4×4 (2×2 chunk grid), 2 value bands + QA band 2
  private val grid = GridDef(nTime = 3, nBand = 3, nY = 4, nX = 4,
    chunkY = 2, chunkX = 2, itemBytes = 4)

  /** value(t, b, cell i) = 10*t + b + i; QA: time t masks cell i where
    * (t + i) % 3 == 0. */
  private def cube(): Seq[ChunkRow] =
    for {
      t <- 0 until grid.nTime
      b <- 0 until grid.nBand
      cy <- 0 until grid.chunksY
      cx <- 0 until grid.chunksX
    } yield {
      val data = Array.tabulate(4) { i =>
        if (b == 2) (if ((t + i) % 3 == 0) 0f else 1f)
        else (10f * t + b + i)
      }
      ChunkRow(t, b, cy, cx, data)
    }

  test("temporalReduce masked mean matches hand computation") {
    val ds = spark.createDataset(cube())
    val out = ChunkTable.temporalReduce(ds, grid, qaBand = 2, "mean")
      .collect().map(r => ((r.band, r.cy, r.cx), r.data)).toMap
    assert(out.size == 2 * 2 * 2)
    // cell i, band b: mean of {10t+b+i : t in 0..2, (t+i)%3 != 0}
    for (b <- 0 until 2; i <- 0 until 4) {
      val kept = (0 until 3).filter(t => (t + i) % 3 != 0).map(t => 10f * t + b + i)
      val expected = kept.sum / kept.size
      val got = out((b, 0, 0))(i)
      assert(math.abs(got - expected) < 1e-5, s"band $b cell $i: $got != $expected")
    }
  }

  test("temporalReduce masked median matches hand computation") {
    val ds = spark.createDataset(cube())
    val out = ChunkTable.temporalReduce(ds, grid, qaBand = 2, "median")
      .collect().map(r => ((r.band, r.cy, r.cx), r.data)).toMap
    for (b <- 0 until 2; i <- 0 until 4) {
      val kept = (0 until 3).filter(t => (t + i) % 3 != 0)
        .map(t => 10f * t + b + i).sorted
      val expected =
        if (kept.size % 2 == 1) kept(kept.size / 2)
        else (kept(kept.size / 2 - 1) + kept(kept.size / 2)) / 2.0f
      assert(out((b, 0, 0))(i) == expected, s"band $b cell $i")
    }
  }

  test("concat along time shifts keys; slice prunes to a region") {
    val a = spark.createDataset(cube().filter(_.band == 0))
    val b = spark.createDataset(cube().filter(_.band == 0))
    val both = ChunkTable.concatTime(a, b, grid.nTime)
    assert(both.count() == 2 * a.count())
    assert(both.map(_.time).collect().max == 2 * grid.nTime - 1)
    val sliced = ChunkTable.slice(both, Region(0, 3, 0, 1, 0, 2, 0, 4), grid)
    // times 0..2, band 0, top chunk row only (cy=0), both cx
    assert(sliced.count() == 3 * 1 * 1 * 2)
  }

  test("coarsen by 2 averages 2x2 blocks, skipping NaN") {
    val one = Seq(ChunkRow(0, 0, 0, 0,
      Array(1f, 2f, Float.NaN, 4f)))  // 2x2 chunk -> 1x1
    val out = ChunkTable.coarsen(spark.createDataset(one), grid, 2).collect().head
    assert(out.data.length == 1)
    assert(math.abs(out.data(0) - (1 + 2 + 4) / 3.0f) < 1e-6)
  }

  test("region planner: expected sizes (reference test_mosaics parametrization)") {
    // reference: 100x100 grid of 10x10 chunks, float64, 3 bands, 5 times
    val g = GridDef(nTime = 5, nBand = 3, nY = 100, nX = 100,
      chunkY = 10, chunkX = 10, itemBytes = 8)
    val bands = Seq("a", "b", "c")
    def regionBytes(r: Region): Long = r.cells * g.itemBytes
    // (target, actualPerBand, bands)
    val cases = Seq(
      (800L, 800L, Seq("a")), (800L, 800L, Seq("a", "b")),
      (800L, 800L, Seq("b", "c")), (800L * 8 - 1, 800L, Seq("a", "b")),
      (800L * 8, 3200L, Seq("a")), (800L * 8, 3200L, Seq("a", "b")),
      (800L * 12, 3200L, Seq("a", "b", "c")))
    cases.foreach { case (target, perBand, sel) =>
      val rs = RegionPlanner.planRegions(g, target, bands, sel)
      rs.foreach { r =>
        assert(r.band1 - r.band0 == sel.size)
        assert(regionBytes(r) == perBand * sel.size, s"target=$target sel=$sel r=$r")
      }
    }
  }

  test("region planner: regions tile the array exactly once (coverage property)") {
    // reference: 102x103 (non-divisible!) with 50x50 chunks, time chunk 5
    val g = GridDef(nTime = 5, nBand = 3, nY = 102, nX = 103,
      chunkY = 50, chunkX = 50, itemBytes = 8)
    for (budget <- Seq(200L, 800L, 1600L, 3200L)) {
      val cover = Array.ofDim[Int](g.nBand, g.nTime, g.nY, g.nX)
      for (sel <- Seq((0, 1), (1, 3))) {
        RegionPlanner.planBandRange(g, budget, sel._1, sel._2, timeChunk = 5)
          .foreach { r =>
            for (b <- r.band0 until r.band1; t <- r.time0 until r.time1;
                 y <- r.y0 until r.y1; x <- r.x0 until r.x1)
              cover(b)(t)(y)(x) += 1
          }
      }
      val flat = cover.flatten.flatten.flatten
      assert(flat.forall(_ == 1), s"budget=$budget: some cells covered != once")
    }
  }

  test("region planner rejects non-contiguous bands") {
    val g = GridDef(5, 3, 100, 100, 10, 10, 8)
    val e = intercept[IllegalArgumentException] {
      RegionPlanner.planRegions(g, 800, Seq("a", "b", "c"), Seq("a", "c"))
    }
    assert(e.getMessage.contains("not contiguous"))
  }

  test("array store: init + parallel idempotent write + reopen round-trips") {
    val root = java.nio.file.Files.createTempDirectory("graft-store").toString
    val ds = spark.createDataset(cube())
    ArrayStore.init(root, ArrayStore.Meta(grid, Seq("B1", "B2", "QA")))
    ArrayStore.write(ds, root)
    ArrayStore.write(ds, root) // idempotent re-run (task retry semantics)
    val meta = ArrayStore.readMeta(root)
    assert(meta.grid == grid && meta.bands == Seq("B1", "B2", "QA"))
    val back = ArrayStore.read(spark, root).collect()
      .map(r => ((r.time, r.band, r.cy, r.cx), r.data.toSeq)).toMap
    val orig = cube().map(r => ((r.time, r.band, r.cy, r.cx), r.data.toSeq)).toMap
    assert(back == orig)
    // incremental listing sees every key
    assert(ArrayStore.existingKeys(spark, root).count() == cube().size)
  }

  test("rechunk re-tiles by key arithmetic: values at global coords preserved") {
    // cube where cell value encodes its GLOBAL (y, x): g = y * 100 + x
    val g = GridDef(nTime = 1, nBand = 1, nY = 6, nX = 10, chunkY = 2,
      chunkX = 4, itemBytes = 4)
    def globalVal(y: Int, x: Int): Float = (y * 100 + x).toFloat
    val rows = for (cy <- 0 until 3; cx <- 0 until 3) yield {
      val data = Array.tabulate(2 * 4) { i =>
        val y = cy * 2 + i / 4; val x = cx * 4 + i % 4
        if (y < 6 && x < 10) globalVal(y, x) else Float.NaN // pad cells
      }
      ChunkRow(0, 0, cy, cx, data)
    }
    val ds = rows.toDS()
    // 2x4 -> 3x3 tiling (neither dimension divides evenly)
    val re = ChunkTable.rechunk(ds, g, 3, 3).collect()
      .map(r => (r.cy, r.cx) -> r.data).toMap
    assert(re.keySet == (for (cy <- 0 until 2; cx <- 0 until 4) yield (cy, cx)).toSet)
    for (((cy, cx), data) <- re; i <- data.indices) {
      val y = cy * 3 + i / 3; val x = cx * 3 + i % 3
      if (y < 6 && x < 10)
        assert(data(i) == globalVal(y, x), s"chunk ($cy,$cx) cell $i")
      else assert(data(i).isNaN, s"chunk ($cy,$cx) cell $i should be fill")
    }
    // round-trip back to the original tiling reproduces the cube exactly
    val back = ChunkTable.rechunk(
        ChunkTable.rechunk(ds, g, 3, 3),
        g.copy(chunkY = 3, chunkX = 3), 2, 4).collect()
      .map(r => (r.cy, r.cx) -> r.data.toSeq).toMap
    val want = rows.map(r => (r.cy, r.cx) -> r.data.toSeq).toMap
    assert(back.keySet == want.keySet)
    for ((k, v) <- want; (got, w) <- back(k).zip(v))
      assert((got.isNaN && w.isNaN) || got == w, s"chunk $k")
  }

  test("geo-table records round-trip executor boundaries (reference test_types parity)") {
    // tests/unit/flyte/test_types.py: a GeoDataFrame passed through a task
    // boundary must come back equal. Spark twin: the task-IO case classes
    // survive an encoder round-trip through a distributed identity map
    // (serialize -> executor -> deserialize), values and schema intact.
    import spark.implicits._
    val rows = Seq(
      graft.model.TileDateUrl("10N_000E", java.sql.Timestamp.valueOf("2021-01-01 00:00:00"),
        "s3://source.scenes/a.tif", "annual_mean"),
      graft.model.TileDateUrl("11N_001E", java.sql.Timestamp.valueOf("2022-01-01 00:00:00"),
        "s3://source.scenes/b.tif", "annual_median"))
    val back = spark.createDataset(rows).repartition(2)
      .map(identity).collect().sortBy(_.tile_id).toSeq
    assert(back == rows)
    val tiles = Seq(graft.model.Tile("t1", -1.0, 40.0, 0.0, 41.0))
    assert(spark.createDataset(tiles).map(identity).collect().toSeq == tiles)
    val regions = Seq(graft.model.Region(0, 1, 0, 3, 0, 100, 0, 100))
    assert(spark.createDataset(regions).map(identity).collect().toSeq == regions)
  }
}
