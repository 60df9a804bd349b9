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

  test("q89 smoke: versions report monotone counts") {
    val rows = SparkEntry.queries("q89_time_travel")(spark, sfSmoke)
      .orderBy($"version").collect()
    assert(rows.length == 2)
    assert(rows(0).getLong(1) < rows(1).getLong(1))
  }
}
