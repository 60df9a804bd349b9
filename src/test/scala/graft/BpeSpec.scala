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

  test("q236 word-unit merge loop: hand-computed rounds incl. overlap + tie-break") {
    import graft.queries.TextQueries
    val docs = Seq(
      ("s1", "x a b a b"), // two disjoint (a,b) occurrences both merge
      ("s1", "a b c"),
      ("s2", "a a a"),     // overlapping (a,a): only the LEFTMOST merges
      ("s2", "c")          // single-token doc: no pairs, still counted in q237
    ).toDF("source", "text")
    val st0 = TextQueries.bpeState0Of(spark, docs)
    val (m, stK) = TextQueries.bpeMerges(spark, st0, 3)
    // round 1: (a,b)=3 wins; round 2: (a,a)=2 (merged leftmost only);
    // round 3: all pairs tied at 1 — '+' (0x2B) < 'a' makes (a+a, a)
    // the lexicographic argmin among {(a+a,a),(a+b,a+b),(a+b,c),(x,a+b)}
    assert(m == Seq((1L, "a", "b", 3L), (2L, "a", "a", 2L),
      (3L, "a+a", "a", 1L)), m)
    val finalUnits = stK
      .select($"source", TextQueries.bpeUnits($"s").as("u"))
      .as[(String, Seq[String])].collect().toSet
    assert(finalUnits == Set(
      ("s1", Seq("x", "a+b", "a+b")), ("s1", Seq("a+b", "c")),
      ("s2", Seq("a+a+a")), ("s2", Seq("c"))), finalUnits)
    graft.ops.ScratchCache.releaseAll()
  }
}
