package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.store.CommitLog

class CommitLogSpec extends AnyFunSuite with SparkSpecBase {
  import spark.implicits._

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft-commitlog").toString

  test("append/overwrite produce monotone versions with snapshot isolation") {
    val root = freshRoot()
    val log = new CommitLog(root)
    assert(log.headVersion() == -1)
    val a = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val b = Seq((3L, "c")).toDF("id", "v")
    assert(log.append(a) == 0)
    assert(log.append(b) == 1)
    assert(log.read(spark, 0).count() == 2)     // time travel unaffected
    assert(log.read(spark, 1).count() == 3)
    assert(log.overwrite(b) == 2)
    assert(log.read(spark).count() == 1)        // head = overwritten
    assert(log.read(spark, 1).count() == 3)     // history intact
  }

  test("concurrent committers: exactly one wins a version") {
    val root = freshRoot()
    val log = new CommitLog(root)
    log.commitSnapshot(Seq.empty)
    // both race for version 1 through the SAME protocol (pre-computed
    // target): simulate by two commitSnapshot calls from threads
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Either[Int, Int]]()
    val gate = new java.util.concurrent.CountDownLatch(1)
    val threads = (1 to 8).map { i =>
      val t = new Thread(() => {
        gate.await()
        try results.add(Right(log.commitSnapshot(Seq(s"f$i"))))
        catch { case e: CommitLog.ConcurrentCommitException =>
          results.add(Left(e.version)) }
        ()
      })
      t.start(); t
    }
    gate.countDown()
    threads.foreach(_.join())
    import scala.jdk.CollectionConverters._
    val list = results.asScala.toList
    val wins = list.collect { case Right(v) => v }
    // every committed version distinct; any losers reported a real clash
    assert(wins.distinct.length == wins.length && wins.nonEmpty)
  }

  test("vacuum deletes only files no retained version references") {
    val root = freshRoot()
    val log = new CommitLog(root)
    log.append(Seq((1L, "a")).toDF("id", "v"))        // v0
    log.overwrite(Seq((2L, "b")).toDF("id", "v"))     // v1 (v0 files dead)
    log.append(Seq((3L, "c")).toDF("id", "v"))        // v2
    val deleted = log.vacuum(keepVersions = 2)        // retain v1, v2
    assert(deleted > 0)
    assert(log.read(spark, 1).count() == 1)
    assert(log.read(spark, 2).count() == 2)
    intercept[IllegalArgumentException](log.snapshot(0))
  }

  test("merge rewrites ONLY files containing matched keys") {
    val root = freshRoot()
    val log = new CommitLog(root)
    // two disjoint key populations laid out in separate files
    val left = (1L to 50L).map(i => (i, s"L$i")).toDF("id", "v").coalesce(1)
    val right = (1001L to 1050L).map(i => (i, s"R$i")).toDF("id", "v").coalesce(1)
    log.append(left)
    log.append(right)
    val before = log.snapshot().toSet
    // batch touches only the right-hand population (+ one insert)
    val batch = Seq((1001L, "R1001'"), (9999L, "NEW")).toDF("id", "v")
    log.merge(spark, batch, "id")
    val after = log.snapshot().toSet
    val leftFiles = before.filter(f =>
      spark.read.parquet(f).agg(min(col("id"))).head().getLong(0) == 1L)
    assert(leftFiles.nonEmpty && leftFiles.subsetOf(after),
      "untouched files must carry over by name")
    assert((after -- before).nonEmpty, "merge must add rewritten+batch files")
    // the touched file must NOT survive (its rewrite replaces it)
    assert((before -- after).nonEmpty, "matched file must leave the snapshot")
    // content: update applied once, insert present, everything else
    // intact — count the RAW rows (a keyed map would hide duplicates)
    assert(log.read(spark).count() == 101)
    val got = log.read(spark).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1001L) == "R1001'" && got(9999L) == "NEW" && got(1L) == "L1")
  }

  test("changes classifies insert/delete/update by full-row comparison") {
    val root = freshRoot()
    val log = new CommitLog(root)
    log.append(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"))
    log.overwrite(Seq((1L, "a"), (2L, "B"), (4L, "d")).toDF("id", "v"))
    val got = log.changes(spark, 0, 1, "id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(2L -> "update", 3L -> "delete", 4L -> "insert"))
  }

  test("compact clusters files into disjoint ranges, content unchanged") {
    val root = freshRoot()
    val log = new CommitLog(root)
    val rows = (1L to 4000L).map(i => (i, (i * 2654435761L) % 65536, i % 65536))
      .toDF("id", "a", "b")
    log.append(rows.repartition(8))
    val before = log.read(spark).collect().map(_.getLong(0)).sorted
    val z = graft.ops.ZOrder.interleave16(col("a"), col("b"))
    log.compact(spark, numFiles = 4, clusterBy = Some(z))
    val files = log.snapshot()
    assert(files.length == 4)
    // per-file z ranges disjoint (range partitioning by the cluster key)
    val ranges = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min(graft.ops.ZOrder.interleave16(col("a"), col("b"))),
          max(graft.ops.ZOrder.interleave16(col("a"), col("b")))).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, hi), (lo2, _)) => assert(hi <= lo2, ranges.toString)
      case _ =>
    }
    val after = log.read(spark).collect().map(_.getLong(0)).sorted
    assert(java.util.Arrays.equals(before, after))
    // history keeps the pre-compaction layout
    assert(log.read(spark, 0).count() == 4000)
  }

  test("q89 smoke: versions report monotone counts") {
    val rows = SparkEntry.queries("q89_time_travel")(spark, sfSmoke)
      .orderBy($"version").collect()
    assert(rows.length == 2)
    assert(rows(0).getLong(1) < rows(1).getLong(1))
  }
}
