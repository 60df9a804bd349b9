package graft.ops

import java.io.InputStream
import java.net.URI
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** S5: bulk byte-moving fetch — the engine twin of the reference's
  * `download_files_with_fsspec` (datasets/utils.py:70-96): take a table
  * with a URL column, download every object into `workdir` preserving the
  * URL's path (host dropped, leading '/' stripped — the reference's
  * `URL(url).path.lstrip('/')` layout).
  *
  * Spark shape: one client per PARTITION (the `openFactory` runs once per
  * partition, like the per-worker fsspec filesystem), rows stream through
  * it; partition parallelism is the concurrency knob (the reference's
  * `max_concurrency=10` becomes "how many partitions run at once").
  * Writes are temp-file + atomic-rename and existing destinations are
  * skipped, so retries and speculative duplicates are idempotent — same
  * contract as the store sink.
  *
  * `defaultOpen` handles file:/ URIs and plain paths (what tests can reach
  * in a zero-egress sandbox) plus any URL scheme the JVM has a handler for
  * (http/https on a real cluster); object-store schemes supply their own
  * `openFactory` (e.g. an S3 client per partition).
  */
object Fetch {

  /** Destination relative path for a URL: URI path without the leading
    * slash; opaque/plain strings fall back to the raw value less any
    * leading slashes. */
  private[graft] def destRel(url: String): String = {
    val p =
      try {
        val u = new URI(url)
        if (u.getPath != null && u.getPath.nonEmpty) u.getPath else url
      } catch { case _: Exception => url }
    p.dropWhile(_ == '/')
  }

  private[graft] def defaultOpen: String => InputStream = { url =>
    if (url.startsWith("file:")) Files.newInputStream(Paths.get(new URI(url)))
    else if (url.contains("://")) new URI(url).toURL.openStream()
    else Files.newInputStream(Paths.get(url))
  }

  /** Partition count that bounds per-task download volume — the engine
    * twin of the reference's scratch-sized URL batching
    * (`flyte/scenes.py:60-70`: batch_size = ephemeral_storage //
    * (max_bytes_per_file * 4), one task per batch). The reference's 4×
    * headroom is kept as `headroomDivisor`: downloads share the task's
    * scratch disk with tile outputs and temp files, so budgeting only
    * 1/headroom of it for fetched bytes leaves the rest free.
    * Repartitioning the URL table to this count before `fetchToDir` caps
    * each task's worst-case download volume at
    * `taskScratchBytes / headroomDivisor` regardless of row skew. */
  def boundedFetchParts(nUrls: Long, maxBytesPerFile: Long,
                        taskScratchBytes: Long, headroomDivisor: Int = 4): Int = {
    require(maxBytesPerFile > 0, "maxBytesPerFile must be positive")
    require(headroomDivisor > 0, "headroomDivisor must be positive")
    require(taskScratchBytes / headroomDivisor >= maxBytesPerFile,
      "task scratch (after headroom) must hold at least one file")
    val urlsPerTask = taskScratchBytes / headroomDivisor / maxBytesPerFile
    math.max(1L, (nUrls + urlsPerTask - 1) / urlsPerTask).toInt
  }

  /** Bounded exponential retry on transient IO failures — the engine twin
    * of the reference's recoverable-exception retries ×3 around scrapes
    * (flyte/scenes.py:81-105) and GDAL's retry/delay configs
    * (gdal_configs.py:17-21). Only IOException is transient-by-contract;
    * anything else propagates immediately. Spark task retries remain the
    * outer safety net — this inner loop just avoids re-running a whole
    * partition for one flaky object. */
  private[graft] def withRetries[A](retries: Int, backoffMs: Long)(f: => A): A = {
    var attempt = 0
    var delay = backoffMs
    while (true) {
      try return f
      catch {
        case e: java.io.IOException =>
          if (attempt >= retries) throw e
          attempt += 1
          Thread.sleep(delay)
          delay = math.min(delay * 2, 30000L)
      }
    }
    sys.error("unreachable")
  }

  /** Fetch every row's `urlCol` into `workdir`. Returns one row per input
    * row: (url, dest, n_bytes, fetched) — `fetched = false` marks an
    * idempotent skip (destination already present; n_bytes = its size).
    * Each URL gets up to `retries` transient-IOException retries with
    * doubling backoff from `backoffMs` before the task fails. */
  def fetchToDir(df: DataFrame, urlCol: String, workdir: String,
                 retries: Int = 3, backoffMs: Long = 100L)
                (openFactory: () => String => InputStream = () => defaultOpen): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(urlCol).cast("string")).as[String].mapPartitions { it =>
      val open = openFactory()
      it.map { url =>
        val dst = Paths.get(workdir).resolve(destRel(url))
        if (Files.exists(dst)) (url, dst.toString, Files.size(dst), false)
        else {
          Files.createDirectories(dst.getParent)
          val n = withRetries(retries, backoffMs) {
            val tmp = dst.resolveSibling(
              s".${dst.getFileName}.${java.util.UUID.randomUUID}.tmp")
            try {
              val in = open(url)
              val copied =
                try Files.copy(in, tmp, StandardCopyOption.REPLACE_EXISTING)
                finally in.close()
              moveAtomic(tmp, dst)
              copied
            } catch {
              case e: Throwable => Files.deleteIfExists(tmp); throw e
            }
          }
          (url, dst.toString, n, true)
        }
      }
    }.toDF("url", "dest", "n_bytes", "fetched")
  }

  private def moveAtomic(tmp: Path, dst: Path): Unit =
    try Files.move(tmp, dst, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    catch { // a concurrent retry won the rename race: its bytes are ours too
      case _: java.nio.file.FileAlreadyExistsException => Files.delete(tmp)
    }
}
