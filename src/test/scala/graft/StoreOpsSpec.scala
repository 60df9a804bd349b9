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

  test("fetchChunkedToDir: multi-connection range assembly, skip, failure cleanup") {
    val src = Files.createTempDirectory("graft-chunk-src")
    val work = Files.createTempDirectory("graft-chunk-work")
    // a payload spanning MANY chunks with position-dependent bytes: any
    // range landing at the wrong offset corrupts the content check
    val big = Array.tabulate(100 * 1024 + 37)(i => (i * 31 + i / 251).toByte)
    val p = src.resolve("data/big.bin")
    Files.createDirectories(p.getParent)
    Files.write(p, big)
    val small = src.resolve("data/small.bin")
    Files.write(small, Array[Byte](1, 2, 3)) // single sub-chunk file
    val urls = Seq("file://" + p.toAbsolutePath,
      "file://" + small.toAbsolutePath).toDF("url")
    val r1 = Fetch.fetchChunkedToDir(urls, "url", work.toString,
      chunkBytes = 8 * 1024, connections = 4)().collect()
    assert(r1.length == 2 && r1.forall(_.getBoolean(3)))
    val dstBig = work.resolve(p.toAbsolutePath.toString.dropWhile(_ == '/'))
    assert(java.util.Arrays.equals(Files.readAllBytes(dstBig), big))
    val dstSmall = work.resolve(small.toAbsolutePath.toString.dropWhile(_ == '/'))
    assert(Files.readAllBytes(dstSmall).toSeq == Seq[Byte](1, 2, 3))
    // idempotent rerun
    val r2 = Fetch.fetchChunkedToDir(urls, "url", work.toString,
      chunkBytes = 8 * 1024, connections = 4)().collect()
    assert(r2.forall(r => !r.getBoolean(3)))
    // a source lying about its size fails the range check and leaves no
    // partial destination (temp cleaned, no dst)
    val liar = new Fetch.RangeSource {
      val real = Fetch.defaultRangeSource
      def size(url: String): Long = real.size(url) + 10 // overclaims
      def read(url: String, off: Long, len: Long) = real.read(url, off, len)
    }
    val fresh = Files.createTempDirectory("graft-chunk-fail")
    val ex = intercept[org.apache.spark.SparkException] {
      Fetch.fetchChunkedToDir(urls, "url", fresh.toString,
        chunkBytes = 8 * 1024, connections = 2, retries = 0)(() => liar).collect()
    }
    assert(ex.getMessage.contains("bytes") || ex.getCause != null)
    val leftovers = Files.walk(fresh).iterator()
    var found = List.empty[String]
    while (leftovers.hasNext) {
      val f = leftovers.next()
      if (Files.isRegularFile(f)) found ::= f.toString
    }
    assert(found.isEmpty, s"partial files left: $found")
  }

  test("auth header provider: credentialed HTTP fetch, plain + chunked") {
    // auth-requiring stub server (reference parity: flyte/scenes.py:92-105
    // threads secrets into the scene downloads as client headers)
    val payload = Array.tabulate(40 * 1024 + 11)(i => (i * 17 + 3).toByte)
    val srv = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    srv.createContext("/data/scene.bin", { ex =>
      val got = Option(ex.getRequestHeaders.getFirst("Authorization"))
      if (!got.contains("Bearer graft-test-token")) {
        ex.sendResponseHeaders(401, -1); ex.close()
      } else {
        val range = Option(ex.getRequestHeaders.getFirst("Range"))
        range match {
          case Some(r) => // bytes=a-b inclusive
            val Array(a, b) = r.stripPrefix("bytes=").split("-").map(_.toLong)
            val slice = java.util.Arrays.copyOfRange(
              payload, a.toInt, (b + 1).toInt)
            ex.sendResponseHeaders(206, slice.length.toLong)
            ex.getResponseBody.write(slice)
          case None =>
            ex.sendResponseHeaders(200, payload.length.toLong)
            ex.getResponseBody.write(payload)
        }
        ex.close()
      }
    }: com.sun.net.httpserver.HttpHandler)
    srv.start()
    try {
      val url = s"http://127.0.0.1:${srv.getAddress.getPort}/data/scene.bin"
      val urls = Seq(url).toDF("url")
      val bearer: Fetch.HeaderProvider =
        _ => Map("Authorization" -> "Bearer graft-test-token")
      // no credentials → the server rejects, the task fails (no silent skip)
      val noAuthDir = Files.createTempDirectory("graft-auth-no")
      intercept[org.apache.spark.SparkException] {
        Fetch.fetchToDir(urls, "url", noAuthDir.toString,
          retries = 0, backoffMs = 1L)().collect()
      }
      // with the provider the bytes land intact
      val okDir = Files.createTempDirectory("graft-auth-ok")
      val r = Fetch.fetchToDir(urls, "url", okDir.toString,
        retries = 0, backoffMs = 1L, auth = bearer)().collect()
      assert(r.length == 1 && r.head.getBoolean(3) &&
        r.head.getLong(2) == payload.length.toLong)
      assert(java.util.Arrays.equals(
        Files.readAllBytes(okDir.resolve("data/scene.bin")), payload))
      // chunked variant sends the header on the size probe AND every range
      val chDir = Files.createTempDirectory("graft-auth-ch")
      val rc = Fetch.fetchChunkedToDir(urls, "url", chDir.toString,
        chunkBytes = 8 * 1024, connections = 3,
        retries = 0, backoffMs = 1L, auth = bearer)().collect()
      assert(rc.length == 1 && rc.head.getBoolean(3))
      assert(java.util.Arrays.equals(
        Files.readAllBytes(chDir.resolve("data/scene.bin")), payload))
    } finally srv.stop(0)
  }

  test("transient IO failures retry with backoff; success on retry, skip intact") {
    val src = Files.createTempDirectory("graft-flaky-src")
    val work = Files.createTempDirectory("graft-flaky-work")
    val p = src.resolve("tiles/flaky.bin")
    Files.createDirectories(p.getParent)
    Files.write(p, Array.fill(64)(7.toByte))
    val urls = Seq("file://" + p.toAbsolutePath).toDF("url")
    StoreOpsSpec.flakyAttempts.clear()
    val flaky: () => String => java.io.InputStream = () => { u =>
      val n = StoreOpsSpec.flakyAttempts.merge(u, 1, (a, b) => a + b)
      if (n <= 2) throw new java.io.IOException(s"transient #$n")
      Fetch.defaultOpen(u)
    }
    val r = Fetch.fetchToDir(urls, "url", work.toString,
      retries = 3, backoffMs = 1L)(flaky).collect()
    assert(r.length == 1 && r.head.getBoolean(3) && r.head.getLong(2) == 64L)
    assert(StoreOpsSpec.flakyAttempts.values().iterator().next() == 3) // 2 failures + 1 success
    // idempotent skip unaffected: second run never calls open at all
    StoreOpsSpec.flakyAttempts.clear()
    val r2 = Fetch.fetchToDir(urls, "url", work.toString,
      retries = 3, backoffMs = 1L)(flaky).collect()
    assert(!r2.head.getBoolean(3) && StoreOpsSpec.flakyAttempts.isEmpty)
    // exhausted retries propagate the IOException (task fails)
    StoreOpsSpec.flakyAttempts.clear()
    val dead: () => String => java.io.InputStream =
      () => _ => throw new java.io.IOException("always down")
    val urls2 = Seq("file://" + p.toAbsolutePath + ".gone").toDF("url")
    val e = intercept[Exception] {
      Fetch.fetchToDir(urls2, "url", work.toString,
        retries = 1, backoffMs = 1L)(dead).collect()
    }
    assert(e.getMessage != null)
    // non-IO exceptions are NOT retried: exactly one attempt happens
    val bomb: () => String => java.io.InputStream = () => { u =>
      StoreOpsSpec.flakyAttempts.merge(u, 1, (a, b) => a + b)
      throw new IllegalStateException("not transient")
    }
    StoreOpsSpec.flakyAttempts.clear()
    intercept[Exception] {
      Fetch.fetchToDir(urls2, "url", work.toString,
        retries = 3, backoffMs = 1L)(bomb).collect()
    }
    assert(StoreOpsSpec.flakyAttempts.values().iterator().next() == 1)
  }

  test("fetch destination layout matches URL-path-minus-host (reference parity)") {
    assert(Fetch.destRel("s3://bucket/a/b/c.tif") == "a/b/c.tif")
    assert(Fetch.destRel("gs://bucket/x.tif") == "x.tif")
    assert(Fetch.destRel("file:///tmp/y/z.bin") == "tmp/y/z.bin")
    assert(Fetch.destRel("/plain/path.bin") == "plain/path.bin")
  }

  test("boundedFetchParts sizes the fan-out from scratch budget (reference batching)") {
    import graft.ops.Fetch.boundedFetchParts
    // reference shape (scenes.py:68): 32 GiB scratch / (256 MiB file * 4x
    // headroom) = 32 urls/task
    val gib = 1L << 30
    assert(boundedFetchParts(1280, 256L << 20, 32L * gib) == 40)
    assert(boundedFetchParts(1, 256L << 20, 32L * gib) == 1)
    assert(boundedFetchParts(33, 256L << 20, 32L * gib) == 2) // 32/task -> 2
    // headroom disabled: budget == scratch
    assert(boundedFetchParts(1280, 256L << 20, 32L * gib, headroomDivisor = 1) == 10)
    // derated scratch == one file: one url per task
    assert(boundedFetchParts(7, gib, 4L * gib) == 7)
    // derated scratch can't hold one file
    intercept[IllegalArgumentException] { boundedFetchParts(7, gib, gib) }
    intercept[IllegalArgumentException] { boundedFetchParts(10, 2 * gib, gib, 1) }
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

/** Executor-side attempt counters for the flaky-fetch test (local mode:
  * same JVM, so a static map is visible to both driver and tasks). */
object StoreOpsSpec {
  val flakyAttempts = new java.util.concurrent.ConcurrentHashMap[String, Int]()
}
