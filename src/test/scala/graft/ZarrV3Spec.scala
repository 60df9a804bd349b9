package graft

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.cube.ChunkRow
import graft.model.GridDef
import graft.zarr.ZarrStoreV3

/** Zarr v3 on-disk compatibility: spec-mandated zarr.json fields, nested
  * default chunk keys, gzip codec decoded INDEPENDENTLY (plain
  * java.util.zip.GZIPInputStream, no store code), and the shared DSv2
  * pushdown path over the v3 layout. */
class ZarrV3Spec extends AnyFunSuite with SparkSpecBase {
  import spark.implicits._

  private val grid = GridDef(2, 1, 6, 6, 4, 4, 4) // edge chunks pad

  private def freshStore(): String = {
    val root = Files.createTempDirectory("graft-zarr3").toString
    ZarrStoreV3.init(root, grid, bands = Seq("b0"))
    root
  }

  test("zarr.json carries the v3 core-spec fields") {
    val root = freshStore()
    val group = Files.readString(Paths.get(root, "zarr.json"))
    assert(group.contains("\"zarr_format\":3") && group.contains("\"node_type\":\"group\""))
    val za = Files.readString(Paths.get(root, "data", "zarr.json"))
    for (frag <- Seq("\"zarr_format\":3", "\"node_type\":\"array\"",
        "\"shape\":[2,1,6,6]", "\"data_type\":\"float32\"",
        "\"chunk_grid\":{\"name\":\"regular\",\"configuration\":{\"chunk_shape\":[1,1,4,4]}}",
        "\"chunk_key_encoding\":{\"name\":\"default\",\"configuration\":{\"separator\":\"/\"}}",
        "\"fill_value\":\"NaN\"",
        "{\"name\":\"bytes\",\"configuration\":{\"endian\":\"little\"}}",
        "{\"name\":\"gzip\",\"configuration\":{\"level\":1}}",
        "\"dimension_names\":[\"time\",\"band\",\"y\",\"x\"]"))
      assert(za.contains(frag), s"missing $frag in $za")
    assert(ZarrStoreV3.readGrid(root) == grid)
  }

  test("write/read round-trip: nested keys, NaN edge padding, idempotence") {
    val root = freshStore()
    val fullData = Array.tabulate(16)(_.toFloat)
    val edgeData = Array.tabulate(8)(i => 100f + i)
    ZarrStoreV3.write(Seq(
      ChunkRow(0, 0, 0, 0, fullData),
      ChunkRow(1, 0, 1, 1, edgeData)).toDS(), root)
    // default chunk-key encoding: c/<t>/<b>/<cy>/<cx> nested dirs
    assert(Files.exists(Paths.get(root, "data", "c", "0", "0", "0", "0")))
    assert(Files.exists(Paths.get(root, "data", "c", "1", "0", "1", "1")))
    val back = ZarrStoreV3.read(spark, root).collect()
      .map(r => (r.time, r.band, r.cy, r.cx) -> r.data).toMap
    assert(back((0, 0, 0, 0)).toSeq == fullData.toSeq)
    val edge = back((1, 0, 1, 1))
    assert(edge.take(8).toSeq == edgeData.toSeq)
    assert(edge.drop(8).forall(_.isNaN))
    // double-write idempotence (S9 contract holds in the v3 encoding)
    ZarrStoreV3.write(Seq(ChunkRow(0, 0, 0, 0, fullData)).toDS(), root)
    assert(ZarrStoreV3.read(spark, root).collect().length == 2)
  }

  test("chunk files decode with plain gzip to little-endian C-order float32") {
    val root = freshStore()
    val data = Array.tabulate(16)(i => i * 1.5f)
    ZarrStoreV3.write(Seq(ChunkRow(0, 0, 0, 0, data)).toDS(), root)
    val raw = Files.readAllBytes(Paths.get(root, "data", "c", "0", "0", "0", "0"))
    assert((raw(0) & 0xFF) == 0x1f && (raw(1) & 0xFF) == 0x8b, "RFC 1952 magic")
    val in = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(raw))
    val out = try in.readAllBytes() finally in.close()
    assert(out.length == 64)
    val floats = new Array[Float](16)
    ByteBuffer.wrap(out).order(ByteOrder.LITTLE_ENDIAN).asFloatBuffer().get(floats)
    assert(floats.toSeq == data.toSeq)
  }

  test("v3 layout reads through DSv2 with key pushdown pruning files") {
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    import org.apache.spark.sql.functions.col
    val root = freshStore()
    val rows = for (t <- 0 to 1; cy <- 0 to 1; cx <- 0 to 1)
      yield ChunkRow(t, 0, cy, cx, Array.fill(16)((t * 100 + cy * 10 + cx).toFloat))
    ZarrStoreV3.write(rows.toDS(), root)
    val df = spark.read.format("graft.zarr.ChunkStoreSource").load(root)
      .filter(col("time") === 1 && col("cx") === 0)
    assert(df.count() == 2)
    val b = df.queryExecution.sparkPlan.collect { case s: BatchScanExec => s }
    assert(b.nonEmpty)
    val nFiles = b.head.inputPartitions.map(
      _.asInstanceOf[graft.zarr.ChunkInputPartition].files.length).sum
    assert(nFiles == 2, s"pushdown should plan exactly 2 gzip files, got $nFiles")
    val got = df.collect().map(r => r.getSeq[Float](4).head).toSet
    assert(got == Set(100f, 110f))
  }
}
