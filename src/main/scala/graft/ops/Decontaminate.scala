package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import graft.functions.TextFunctions.roundp

/** Benchmark decontamination at corpus scale: drop training documents
  * that contain eval-benchmark n-grams (the GPT-3/PaLM 13-gram check,
  * run in the direction a 100 TB pipeline needs — benchmark side small,
  * corpus side huge).
  *
  * Scale shape vs the exact join (q44): a gram-hash equi-join shuffles
  * BOTH sides; here the benchmark grams compress into a Bloom sketch
  * (Spark's own BloomFilterAggregate/BloomFilterMightContain runtime-
  * filter expressions) and the corpus is tested MAP-SIDE — zero corpus
  * shuffle, zero corpus join. Only sketch-positive documents (true hits +
  * the fpp tail) enter the exact verification join, which removes every
  * false positive, so the OUTPUT is exactly the join answer: the sketch
  * is invisible to correctness (false negatives are impossible) and the
  * oracle is the plain exact SQL.
  *
  * The sketch rides the plan as a literal like the PQ codebooks: bytes ≈
  * 10·|bench grams|/8 at the default 10 bits/item (~1% fpp) — ~1.2 MB for
  * a 1M-gram benchmark suite; Spark ships task binaries via torrent
  * broadcast, so the transport stays scalable and the driver never holds
  * more than the sketch.
  */
object Decontaminate {

  private def bloomAgg(h: Column, nItems: Long, numBits: Long): Column =
    Bridge.column(new BloomFilterAggregate(Bridge.expression(h),
      Literal(nItems), Literal(numBits)).toAggregateExpression())

  private def mightContain(sketch: Array[Byte], h: Column): Column =
    Bridge.column(new BloomFilterMightContain(Literal(sketch),
      Bridge.expression(h)))

  /** Corpus documents carrying ≥1 verified benchmark k-gram:
    * (doc_id, n_grams, n_contaminated, contamination_frac), gram universe
    * = distinct gram hashes (PolyHash32, the engine's shingle hash).
    * `bitsPerItem` sizes the sketch (10 ≈ 1% fpp). */
  def bloomContaminated(docs: DataFrame, isBench: Column, id: String,
                        text: String, k: Int,
                        bitsPerItem: Int = 10): DataFrame = {
    val toks = ScratchCache.register(docs
      .select(col(id).as("doc_id"), isBench.as("__bench"),
        graft.functions.ShingleExpressions.wordShingleHashes(col(text), k).as("hs"))
      .filter(col("hs").isNotNull)
      .persist())
    val benchH = toks.filter(col("__bench"))
      .select(explode(col("hs")).as("h")).distinct()
    // the benchmark side is the SMALL side by contract — one bounded count
    // sizes the sketch honestly instead of guessing
    val nItems = math.max(benchH.count(), 64L)
    val sketch = benchH
      .agg(bloomAgg(col("h"), nItems, math.max(nItems * bitsPerItem, 512L)))
      .head().getAs[Array[Byte]](0)
    val corpus = toks.filter(!col("__bench"))
    // map-side candidate test: no shuffle, no join — the 100 TB scan path
    val cand = corpus.filter(exists(col("hs"),
      h => mightContain(sketch, h)))
    // exact verification joins ONLY the sketch-positive sliver
    val verified = cand.select(col("doc_id"), explode(col("hs")).as("h"))
      .join(benchH, Seq("h"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_contaminated"))
    // inner join: bloom false positives have no verified row and drop out
    cand.select(col("doc_id"), size(col("hs")).cast("bigint").as("n_grams"))
      .join(verified, Seq("doc_id"))
      .select(col("doc_id"), col("n_grams"), col("n_contaminated"),
        roundp(col("n_contaminated") * lit(1.0) / col("n_grams"), 6)
          .as("contamination_frac"))
  }
}
