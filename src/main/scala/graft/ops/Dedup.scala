package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Deduplication operators over a document table (BASELINE north star:
  * LLM-data-pipeline dedup as first-class engine ops).
  *
  * Scale design (100 TB):
  *  - exact dedup = one hash-partitioned groupBy on the text hash;
  *  - near-dup never compares all pairs: MinHash-LSH / SimHash banding
  *    bound the join to same-bucket candidates, then exact verification
  *    runs only on candidates;
  *  - the shingle-inverted-index join (`jaccardPairs`) is the exhaustive
  *    fallback; `maxDf` drops ubiquitous shingles to cap bucket blowup
  *    (the standard frequency-cap trick for quadratic bucket growth).
  */
object Dedup {

  /** Exact dedup: canonical (min-id) representative per identical text.
    * At scale: group key is the 32-bit content hash, one shuffle. */
  def exactCanonical(df: DataFrame, id: String, text: String): DataFrame =
    df.groupBy(col(text))
      .agg(min(col(id)).as("canonical_id"), count(lit(1)).as("n_copies"))
      .select(polyHash(lower(col(text))).as("content_hash"),
        col("canonical_id"), col("n_copies"))

  /** Per-doc distinct shingle-string sets (the comparison universe for
    * Jaccard), docs with < k words dropped (no shingle exists). Fused
    * native expression — one JVM pass, not the staged tokenize/slice HOFs
    * (which the self-joined consumers would re-evaluate per join side). */
  def shingleSets(df: DataFrame, id: String, text: String, k: Int): DataFrame =
    df.select(col(id).as("doc_id"),
        graft.functions.ShingleExpressions.wordShingles(col(text), k).as("shingles"))
      .filter(col("shingles").isNotNull)

  /** Exhaustive n-gram Jaccard pairs via a shingle inverted index:
    * explode → equi-join on shingle → count = |A∩B|, then |A∪B| from set
    * sizes. One shuffle on the shingle key + one on the pair key.
    *
    * `maxDf` is the scale guard: a shingle appearing in d docs contributes
    * d²/2 rows to the self-join, so one hot shingle ("in the the") makes
    * the plan quadratic. With the cap, over-cap shingles are dropped from
    * the comparison universe — index AND set sizes, so Jaccard stays
    * internally consistent — via a broadcast anti-join (the hot list is
    * small by definition: at most totalPostings/cap entries). */
  def jaccardPairs(df: DataFrame, id: String, text: String, k: Int,
                   threshold: Double, maxDf: Option[Int] = None): DataFrame = {
    val inv0 = shingleSets(df, id, text, k)
      .select(col("doc_id"), explode(col("shingles")).as("s"))
    val inv = (maxDf match {
      case Some(cap) =>
        val hot = inv0.groupBy("s").count().filter(col("count") > cap).select("s")
        inv0.join(broadcast(hot), Seq("s"), "left_anti")
      case None => inv0
    }).cache() // three consumers below (self-join reuses one exchange)
    val inter = inv.as("a").join(inv.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    // |A| over the CAPPED universe (shingles are distinct per doc)
    val sizes = inv.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val jac = col("inter") * lit(1.0) /
      (col("na") + col("nb") - col("inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "id_a").withColumnRenamed("n", "na"), "id_a")
      .join(sizes.withColumnRenamed("doc_id", "id_b").withColumnRenamed("n", "nb"), "id_b")
      .filter(jac >= threshold)
      .select(col("id_a"), col("id_b"), roundp(jac, 6).as("jac"))
  }

  /** MinHash-LSH candidate pairs: n-hash signature, banded r rows/band,
    * docs sharing any band bucket become candidates. With r=2, b=32 the
    * miss probability at J≥0.8 is (1−0.8²)³² ≈ 6·10⁻¹⁵ — recall is
    * effectively 1 at the verification threshold. */
  def minhashCandidates(df: DataFrame, id: String, text: String, k: Int,
                        nHashes: Int, rowsPerBand: Int): DataFrame = {
    val nBands = nHashes / rowsPerBand
    // self-joined below: persist so the signature pipeline runs once, not
    // once per join side
    val sig = stagedHashes(df, id, text, k)
      .select(col("doc_id"), minhashSignature(col("hs"), nHashes).as("sig"))
      .filter(size(col("sig")) > 0)
      .persist()
    val bands = sig.select(col("doc_id"),
      explode(array((0 until nBands).map(b =>
        struct(lit(b).as("band"),
          concat_ws(",", slice(col("sig"), b * rowsPerBand + 1, rowsPerBand))
            .as("key"))): _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))
    bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
  }

  /** MinHash-LSH dedup: candidates exact-verified against true Jaccard on
    * the shingle sets — output identical to brute force at the threshold,
    * cost bounded by the candidate count. */
  def minhashDedupPairs(df: DataFrame, id: String, text: String, k: Int,
                        threshold: Double, nHashes: Int = 64,
                        rowsPerBand: Int = 2): DataFrame = {
    val cands = minhashCandidates(df, id, text, k, nHashes, rowsPerBand)
    val sets = shingleSets(df, id, text, k).persist() // joined on both pair sides
    val withSets = cands
      .join(sets.select(col("doc_id").as("id_a"), col("shingles").as("sa")), Seq("id_a"))
      .join(sets.select(col("doc_id").as("id_b"), col("shingles").as("sb")), Seq("id_b"))
    val inter = size(array_intersect(col("sa"), col("sb")))
    val jac = inter * lit(1.0) / (size(col("sa")) + size(col("sb")) - inter)
    withSets.filter(jac >= threshold)
      .select(col("id_a"), col("id_b"), roundp(jac, 6).as("jac"))
  }

  /** Per-doc distinct shingle hashes — fused native expression (tokenize →
    * shingle → PolyHash32 → distinct in one JVM pass; hash values identical
    * to the staged `array_distinct(transform(shingles(tokens(..))))`). */
  private def stagedHashes(df: DataFrame, id: String, text: String, k: Int): DataFrame =
    df.select(col(id).as("doc_id"),
      graft.functions.ShingleExpressions.wordShingleHashes(col(text), k).as("hs"))

  def simhashFingerprints(df: DataFrame, id: String, text: String, k: Int): DataFrame =
    stagedHashes(df, id, text, k)
      .select(col("doc_id"), simhash48(col("hs")).as("simhash"))

  /** SimHash near-dup pairs: 4×12-bit band candidates (hamming ≤ maxHamming
    * guarantees ≥1 identical band when maxHamming < 4 by pigeonhole over 48
    * bits), verified by exact hamming distance. */
  def simhashPairs(df: DataFrame, id: String, text: String, k: Int,
                   maxHamming: Int): DataFrame = {
    require(maxHamming < 4, "4-band pigeonhole only covers hamming <= 3")
    val fp = simhashFingerprints(df, id, text, k).persist() // self-joined
    val bands = fp.select(col("doc_id"), col("simhash"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("simhash"), b * 12).bitwiseAND(lit(0xFFFL)).as("key"))): _*))
        .as("bk"))
      .select(col("doc_id"), col("simhash"),
        col("bk.band").as("band"), col("bk.key").as("key"))
    bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        col("a.simhash").as("fp_a"), col("b.simhash").as("fp_b"))
      .distinct()
      .withColumn("hamming", bit_count(col("fp_a").bitwiseXOR(col("fp_b"))).cast("bigint"))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }
}
