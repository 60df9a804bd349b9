package graft.store

import java.nio.file.{Files, Path, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal versioned table format: an append-only JSON commit log over
  * parquet data files — snapshot isolation, time travel, optimistic
  * concurrency, vacuum. (The same shape as Delta/Iceberg's metadata
  * layer, reduced to the operations this engine needs; cf. the
  * snapshot-diff operator q68 which DIFFS two corpus versions — this
  * store is what makes "version" a first-class read.)
  *
  * Layout: `<root>/_log/v00000.json, v00001.json, ...` each holding the
  * FULL file list of that snapshot (not a delta): reads resolve one
  * file, never a log replay, and a corrupted tail version cannot poison
  * earlier snapshots. At 100 TB the log entry is |files| strings — the
  * metadata:data ratio is ~1:10⁶; full-list entries stay cheap until
  * millions of files, at which point the standard fix (delta entries +
  * periodic checkpoints) slots in without changing the API.
  *
  * Commit protocol: write `v<N>.json.tmp`, then publish via
  * `Files.createLink(v<N>.json, tmp)`. link(2) — NOT rename: POSIX
  * rename silently REPLACES an existing target, so a racing loser would
  * overwrite the winner's commit (caught by CommitLogSpec's 8-way race).
  * Hard-link creation fails with EEXIST if the version exists, giving
  * exactly one winner; the loser gets ConcurrentCommitException and
  * retries against the new head. On object stores without hard links,
  * the documented swap is a conditional PUT (if-none-match) on the
  * version key — same one-winner semantics.
  *
  * Data files are never mutated: writers add new uniquely-named files;
  * `overwrite` just publishes a snapshot that stops listing old ones.
  * `vacuum` deletes files unreferenced by ANY retained version.
  */
final class CommitLog(val root: String) {
  import CommitLog._

  private def logDir: Path = Paths.get(root, "_log")

  /** Highest committed version, or -1 if the table is empty. */
  def headVersion(): Int = {
    if (!Files.isDirectory(logDir)) return -1
    val vs = listVersions()
    if (vs.isEmpty) -1 else vs.max
  }

  private def listVersions(): Seq[Int] = {
    val s = Files.list(logDir)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala
        .map(_.getFileName.toString)
        .collect { case VersionFile(n) => n }
        .toSeq
    } finally s.close()
  }

  /** Files of snapshot `version` (default: head). Paths are
    * root-relative in the log, absolute in the result. */
  def snapshot(version: Int = -1): Seq[String] = {
    val v = if (version >= 0) version else headVersion()
    require(v >= 0, s"no committed version in $root")
    val p = logDir.resolve(f"v$v%05d.json")
    require(Files.exists(p), s"version $v does not exist in $root")
    parseFiles(new String(Files.readAllBytes(p), "UTF-8"))
      .map(rel => Paths.get(root, rel).toString)
  }

  /** Publish a new snapshot whose file list is `files` (root-relative).
    * Returns the committed version. Throws [[ConcurrentCommitException]]
    * if another committer took the target version first. */
  def commitSnapshot(files: Seq[String]): Int = {
    Files.createDirectories(logDir)
    val v = headVersion() + 1
    val body = files.sorted
      .map(f => "\"" + f.replace("\\", "\\\\").replace("\"", "\\\"") + "\"")
      .mkString(s"""{"version":$v,"files":[""", ",", "]}")
    val tmp = logDir.resolve(f"v$v%05d.json.tmp${System.nanoTime()}")
    Files.write(tmp, body.getBytes("UTF-8"))
    try Files.createLink(logDir.resolve(f"v$v%05d.json"), tmp)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new ConcurrentCommitException(v)
    }
    finally Files.deleteIfExists(tmp)
    v
  }

  /** Append `df` as new data files + publish head∪new. */
  def append(df: DataFrame): Int = writeAndCommit(df, keepExisting = true)

  /** Replace the table contents with `df` (old files stay on disk for
    * time travel until vacuumed). */
  def overwrite(df: DataFrame): Int = writeAndCommit(df, keepExisting = false)

  private def writeAndCommit(df: DataFrame, keepExisting: Boolean): Int = {
    val sub = f"data-${System.nanoTime()}%x"
    df.write.parquet(Paths.get(root, sub).toString)
    val added = listParquet(sub)
    val existing =
      if (keepExisting && headVersion() >= 0)
        snapshot().map(abs => Paths.get(root).relativize(Paths.get(abs)).toString)
      else Seq.empty
    commitSnapshot(existing ++ added)
  }

  /** Read snapshot `version` (default head) as a DataFrame. Schema
    * evolution: files written before a column existed surface it as NULL
    * (`mergeSchema` unions the per-file parquet schemas — the snapshot is
    * the schema authority, not whichever file the planner samples
    * first). */
  def read(spark: SparkSession, version: Int = -1): DataFrame = {
    val files = snapshot(version)
    spark.read.option("mergeSchema", "true").parquet(files: _*)
  }

  /** Copy-on-write MERGE (upsert by `key`): rows of `batch` replace
    * same-key rows of the head snapshot; unmatched batch rows insert.
    *
    * Only files that actually CONTAIN a matched key are rewritten —
    * every other head file carries over into the new snapshot untouched
    * (asserted by CommitLogSpec), so write amplification is bounded by
    * the batch's file-level spread, not the table size. The touched-file
    * probe reads just the key column (column-pruned scan + semi-join
    * against the batch keys); with per-file key min/max stats the scan
    * could prune further, but the probe is already distributed and
    * O(|table keys|). Concurrency: optimistic — the final commit throws
    * [[ConcurrentCommitException]] if another writer advanced the head,
    * and the caller retries against the new snapshot (new data files are
    * orphans until vacuum, never corruption). */
  def merge(spark: SparkSession, batch: DataFrame, key: String): Int = {
    import org.apache.spark.sql.functions._
    val head = headVersion()
    require(head >= 0, "merge into empty table: use append")
    val files = snapshot(head)
    val keys = batch.select(col(key)).distinct()
    val touched = spark.read.parquet(files: _*)
      .select(col(key), input_file_name().as("_f"))
      .join(keys, Seq(key), "left_semi")
      .select("_f").distinct().collect().map(_.getString(0))
      .map(stripScheme).toSet
    val untouched = files.filterNot(f => touched.contains(stripScheme(f)))
    // survivors of the touched files (their non-matched rows) + the batch
    val rewritten =
      if (touched.isEmpty) batch
      else spark.read.parquet(touched.toSeq: _*)
        .join(keys, Seq(key), "left_anti")
        .unionByName(batch)
    val sub = f"data-${System.nanoTime()}%x"
    rewritten.write.parquet(Paths.get(root, sub).toString)
    val added = listParquet(sub)
    val rel = untouched.map(abs =>
      Paths.get(root).relativize(Paths.get(abs)).toString)
    commitSnapshot(rel ++ added)
  }

  /** Change feed between two committed versions keyed by `key`: one row
    * per changed key with `change_type` ∈ insert / delete / update
    * (full-row comparison; unchanged keys are absent). The scan is two
    * column-pruned snapshot reads + one shuffle on `key` — no log replay,
    * no driver materialization. */
  def changes(spark: SparkSession, from: Int, to: Int, key: String): DataFrame = {
    import org.apache.spark.sql.functions._
    def hashed(v: Int, as: String) = {
      val df = read(spark, v)
      df.select(col(key), xxhash64(df.columns.sorted.map(col): _*).as(as))
    }
    hashed(from, "_h0").join(hashed(to, "_h1"), Seq(key), "full_outer")
      .withColumn("change_type",
        when(col("_h0").isNull, "insert")
          .when(col("_h1").isNull, "delete")
          .when(col("_h0") =!= col("_h1"), "update"))
      .filter(col("change_type").isNotNull)
      .select(col(key), col("change_type"))
  }

  /** Rewrite the head snapshot into `numFiles` files range-clustered by
    * `clusterBy` (e.g. a Z-order key — [[graft.ops.ZOrder]]): per-file
    * value ranges come out disjoint, so any reader filtering on the
    * cluster key can skip whole files from min/max stats. Content is
    * unchanged (snapshot-level no-op); history keeps the old layout. */
  def compact(spark: SparkSession, numFiles: Int,
              clusterBy: Option[org.apache.spark.sql.Column] = None): Int = {
    val df = read(spark)
    val laid = clusterBy match {
      case Some(c) => df.repartitionByRange(numFiles, c).sortWithinPartitions(c)
      case None => df.repartition(numFiles)
    }
    writeAndCommit(laid, keepExisting = false)
  }

  /** Canonicalize `input_file_name()` URIs (`file:///x`, percent-encoded)
    * and plain paths to one comparable form. */
  private def stripScheme(p: String): String =
    if (p.startsWith("file:")) Paths.get(java.net.URI.create(p)).toString else p

  private def listParquet(sub: String): Seq[String] = {
    val d = Paths.get(root, sub)
    val s = Files.list(d)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.map(_.getFileName.toString)
        .filter(n => n.endsWith(".parquet") && !n.startsWith("."))
        .map(n => s"$sub/$n").toSeq
    } finally s.close()
  }

  /** Delete data files referenced by NO version > `keepAfter` (and drop
    * the log entries ≤ keepAfter except the ones still needed as the
    * base of retained history). Returns deleted file count. */
  def vacuum(keepVersions: Int = 1): Int = {
    val head = headVersion()
    require(head >= 0, "empty table")
    val keepFrom = math.max(0, head - keepVersions + 1)
    val live = (keepFrom to head).flatMap(snapshot(_)).toSet
    var deleted = 0
    // every file any OLD version references but no retained one does
    val old = (0 until keepFrom).flatMap(snapshot(_)).toSet
    (old -- live).foreach { f =>
      if (Files.deleteIfExists(Paths.get(f))) deleted += 1
    }
    (0 until keepFrom).foreach { v =>
      Files.deleteIfExists(logDir.resolve(f"v$v%05d.json")): Unit
    }
    deleted
  }
}

object CommitLog {
  final class ConcurrentCommitException(val version: Int)
    extends RuntimeException(
      s"version $version was committed concurrently; re-read head and retry")

  private object VersionFile {
    private val r = """v(\d{5})\.json""".r
    def unapply(s: String): Option[Int] = s match {
      case r(n) => n.toIntOption
      case _ => None
    }
  }

  /** Tolerant single-purpose parser for the log entry's "files" array
    * (strings with \" and \\ escapes — exactly what commitSnapshot
    * writes). */
  private[store] def parseFiles(json: String): Seq[String] = {
    val key = json.indexOf("\"files\"")
    require(key >= 0, "malformed log entry: no files key")
    val start = json.indexOf('[', key)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = start + 1
    var inStr = false
    val sb = new StringBuilder
    while (i < json.length && (inStr || json(i) != ']')) {
      val c = json(i)
      if (!inStr) {
        if (c == '"') { inStr = true; sb.clear() }
      } else c match {
        case '\\' => sb.append(json(i + 1)); i += 1
        case '"' => inStr = false; out += sb.toString
        case other => sb.append(other)
      }
      i += 1
    }
    out.toSeq
  }
}
