package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.FanOut

/** FanOut.cpu contract: fans small/unsplittable inputs out to the session
  * shuffle width, is the IDENTITY above the byte threshold (the 100 TB
  * guarantee), and never changes results. */
class FanOutSpec extends AnyFunSuite with SparkSpecBase {
  import spark.implicits._

  test("small input gains a repartition to the session shuffle width") {
    val docs = Tables.documents(spark, sfSmoke) // ~60 KB: far below default
    val fanned = FanOut.cpu(docs)
    assert(fanned.rdd.getNumPartitions ==
      spark.sessionState.conf.numShufflePartitions)
    // results unchanged (same rows, any order)
    assert(fanned.select($"doc_id").as[Long].collect().sorted.toSeq ==
      docs.select($"doc_id").as[Long].collect().sorted.toSeq)
  }

  test("above the threshold it is the identity (no exchange at scale)") {
    val docs = Tables.documents(spark, sfSmoke)
    val prev = spark.conf.getOption(FanOut.ConfKey)
    try {
      spark.conf.set(FanOut.ConfKey, "1") // force everything "too big"
      val out = FanOut.cpu(docs)
      // identity: the plan gains no Repartition node
      assert(out.queryExecution.logical eq docs.queryExecution.logical)
    } finally prev match {
      case Some(v) => spark.conf.set(FanOut.ConfKey, v)
      case None => spark.conf.unset(FanOut.ConfKey)
    }
  }

  test("threshold is read per-call from the session conf") {
    val docs = Tables.documents(spark, sfSmoke)
    val prev = spark.conf.getOption(FanOut.ConfKey)
    try {
      spark.conf.set(FanOut.ConfKey, (1L << 40).toString)
      assert(FanOut.cpu(docs).rdd.getNumPartitions ==
        spark.sessionState.conf.numShufflePartitions)
      spark.conf.set(FanOut.ConfKey, "1")
      assert(FanOut.cpu(docs).queryExecution.logical eq
        docs.queryExecution.logical)
    } finally prev match {
      case Some(v) => spark.conf.set(FanOut.ConfKey, v)
      case None => spark.conf.unset(FanOut.ConfKey)
    }
  }
}
