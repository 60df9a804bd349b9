package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Fetch
import graft.zarr.ArrayStore

class StoreOpsSpec extends AnyFunSuite with SparkSpecBase {
  import spark.implicits._

  test("fetchToDir moves real bytes, preserves URL paths, and skips on rerun") {
    val src = Files.createTempDirectory("graft-fetch-src")
    val work = Files.createTempDirectory("graft-fetch-work")
    val payloads = (1 to 5).map { i =>
      val p = src.resolve(s"tiles/t$i/scene.bin")
      Files.createDirectories(p.getParent)
      Files.write(p, Array.fill(i * 100)(i.toByte))
      p
    }
    val urls = payloads.map(p => "file://" + p.toAbsolutePath).toDF("url")
    val r1 = Fetch.fetchToDir(urls, "url", work.toString)().collect()
    assert(r1.length == 5 && r1.forall(_.getBoolean(3)), r1.mkString(","))
    payloads.zipWithIndex.foreach { case (p, i) =>
      val dst = work.resolve(p.toAbsolutePath.toString.dropWhile(_ == '/'))
      assert(Files.exists(dst), dst.toString)
      assert(Files.readAllBytes(dst).toSeq == Array.fill((i + 1) * 100)((i + 1).toByte).toSeq)
    }
    // idempotent rerun: nothing re-fetched, sizes intact
    val r2 = Fetch.fetchToDir(urls, "url", work.toString)().collect()
    assert(r2.forall(r => !r.getBoolean(3)))
    assert(r1.map(_.getLong(2)).sorted.toSeq == r2.map(_.getLong(2)).sorted.toSeq)
  }

  test("fetch destination layout matches URL-path-minus-host (reference parity)") {
    assert(Fetch.destRel("s3://bucket/a/b/c.tif") == "a/b/c.tif")
    assert(Fetch.destRel("gs://bucket/x.tif") == "x.tif")
    assert(Fetch.destRel("file:///tmp/y/z.bin") == "tmp/y/z.bin")
    assert(Fetch.destRel("/plain/path.bin") == "plain/path.bin")
  }

  test("du accounts files+bytes per top-level entry; rm is force-guarded") {
    val root = Files.createTempDirectory("graft-du").toString
    import graft.model.GridDef
    val meta = ArrayStore.Meta(GridDef(1, 1, 8, 8, 4, 4, 4), Seq("b0"))
    ArrayStore.init(root, meta)
    val rows = Seq(
      graft.cube.ChunkRow(0, 0, 0, 0, Array.fill(16)(1.0f)),
      graft.cube.ChunkRow(0, 0, 0, 1, Array.fill(16)(2.0f)))
    ArrayStore.write(rows.toDS(), root)
    val usage = ArrayStore.du(root)
    assert(usage.contains("meta.json") && usage.contains("c"), usage)
    assert(usage("c") == ((2L, 128L)), usage) // 2 chunks x 16 f32
    assert(usage("meta.json")._1 == 1L)
    intercept[IllegalArgumentException] { ArrayStore.rm(root, force = false) }
    assert(Files.exists(Paths.get(root, "meta.json")))
    ArrayStore.rm(root, force = true)
    assert(!Files.exists(Paths.get(root)))
  }
}
