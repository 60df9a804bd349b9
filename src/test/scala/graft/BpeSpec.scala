package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.BpeTrainer

/** BpeTrainer against an independent in-memory reimplementation of the
  * same algorithm (word-freq table → iterative most-frequent-pair merge
  * with the (count DESC, a ASC, b ASC) tie-break): the distributed
  * trainer must reproduce the EXACT merge sequence, and the greedy
  * encoder must be consistent with training (a word fully trained on
  * re-encodes to its trained symbol form). */
class BpeSpec extends AnyFunSuite with SparkSpecBase {
  import spark.implicits._

  /** Straight-line local BPE over a word-frequency map. */
  private def localTrain(freqs: Map[String, Long],
                         n: Int): Seq[(String, String)] = {
    var syms: Map[Seq[String], Long] = freqs.map { case (w, f) =>
      (w.map(_.toString) :+ BpeTrainer.Eow) -> f
    }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (merges.length < n && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      syms.foreach { case (s, f) =>
        s.sliding(2).foreach {
          case Seq(a, b) =>
            counts((a, b)) = counts.getOrElse((a, b), 0L) + f
          case _ =>
        }
      }
      if (counts.isEmpty) done = true
      else {
        val (a, b) = counts.toSeq
          .minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += ((a, b))
        syms = syms.groupMapReduce {
          case (s, _) => BpeTrainer.applyMerge(s, a, b)
        } { case (_, f) => f }(_ + _)
      }
    }
    merges.toSeq
  }

  test("distributed merge sequence equals the local reference (25 merges)") {
    val docs = Tables.documents(spark, sfSmoke)
    val got = BpeTrainer.train(docs, "text", 25)
    val freqs = docs
      .select(org.apache.spark.sql.functions.explode(
        graft.functions.TextFunctions.tokens($"text")).as("w"))
      .groupBy($"w").count().as[(String, Long)].collect().toMap
    val want = localTrain(freqs, 25)
    assert(got == want, s"merge sequences diverge:\n got=$got\nwant=$want")
    assert(got.length == 25, "fixture should support 25 merges")
  }

  test("encoder is train-consistent and covers unseen words") {
    val docs = Tables.documents(spark, sfSmoke)
    val merges = BpeTrainer.train(docs, "text", 40)
    // the most frequent corpus word should encode to few symbols
    val topWord = docs
      .select(org.apache.spark.sql.functions.explode(
        graft.functions.TextFunctions.tokens($"text")).as("w"))
      .groupBy($"w").count().orderBy($"count".desc, $"w")
      .limit(1).as[(String, Long)].head()._1
    val enc = BpeTrainer.encodeWord(topWord, merges)
    assert(enc.mkString == topWord + BpeTrainer.Eow,
      "encoding must reconstruct the word")
    assert(enc.length < topWord.length + 1,
      s"frequent word '$topWord' should compress, got $enc")
    // an unseen word still encodes losslessly (character fallback)
    val unseen = "zzqxv"
    val encU = BpeTrainer.encodeWord(unseen, merges)
    assert(encU.mkString == unseen + BpeTrainer.Eow)
  }
}
