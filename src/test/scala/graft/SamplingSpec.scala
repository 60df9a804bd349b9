package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Sampling

class SamplingSpec extends AnyFunSuite with SparkSpecBase {
  import spark.implicits._

  test("stratified sample is deterministic and partitioning-independent") {
    val docs = Tables.documents(spark, sfSmoke)
    val rates = Map("en" -> 0.2, "de" -> 0.5, "zh" -> 1.0)
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      Sampling.stratifiedSample(df, "lang", $"text", rates, "mix1")
        .select($"doc_id").as[Long].collect().toSet
    val a = ids(docs)
    val b = ids(docs.repartition(13, $"source")) // different physical layout
    assert(a == b, "sample must not depend on partitioning")
    assert(a.nonEmpty)
  }

  test("per-stratum keep rates track the configured rates; others drop") {
    val docs = Tables.documents(spark, sfSmoke)
    val rates = Map("en" -> 0.2, "de" -> 0.5, "zh" -> 1.0)
    val total = docs.groupBy($"lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = Sampling.stratifiedSample(docs, "lang", $"text", rates, "mix1")
      .groupBy($"lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // zh: rate 1.0 keeps everything; es/fr: unlisted strata drop entirely
    assert(kept.get("zh").contains(total("zh")))
    assert(!kept.contains("es") && !kept.contains("fr"))
    // en/de: within a loose binomial band around rate * n
    for ((lang, rate) <- Seq("en" -> 0.2, "de" -> 0.5)) {
      val n = total(lang).toDouble
      val k = kept.getOrElse(lang, 0L).toDouble
      val sd = math.sqrt(n * rate * (1 - rate))
      assert(math.abs(k - rate * n) <= 4 * sd + 1,
        s"$lang kept $k of $n at rate $rate")
    }
  }

  test("tokenize is stable, salt-sensitive, and join-preserving") {
    val c = Tables.customer(spark, sfSmoke)
    val t1 = c.select($"c_custkey", Sampling.tokenize($"c_name", "s1").as("t"))
      .as[(Long, Long)].collect().toMap
    val t2 = c.select($"c_custkey", Sampling.tokenize($"c_name", "s1").as("t"))
      .as[(Long, Long)].collect().toMap
    val t3 = c.select($"c_custkey", Sampling.tokenize($"c_name", "s2").as("t"))
      .as[(Long, Long)].collect().toMap
    assert(t1 == t2, "same salt => same tokens")
    assert(t1 != t3, "different salt => different tokens")
    // distinct names stay distinct (join-preserving on this fixture)
    assert(t1.values.toSet.size == t1.size)
  }

  test("band generalizes to floor multiples, including negatives") {
    val rows = Seq(-999.99, -1.0, 0.0, 999.99, 1000.0, 2547.4).toDF("x")
      .select(Sampling.band($"x", 1000.0).as("b")).as[Double].collect().toSeq
    assert(rows == Seq(-1000.0, -1000.0, 0.0, 0.0, 1000.0, 2000.0))
  }
}
