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
    // NOT fanned out (cf. FanOut in substringPairs): measured at sf0.1,
    // inserting the redistribution exchange here REGRESSED every consumer
    // (q28 0.96→1.56 s, q52 1.6→2.9 s) — shingle pipelines reference this
    // frame from several join/agg consumers, so the extra exchange runs
    // once per consumer while the kernel-in-one-task cost it removes is
    // only ~0.2 s
    df.select(col(id).as("doc_id"),
        graft.functions.ShingleExpressions.wordShingles(col(text), k).as("shingles"))
      .filter(col("shingles").isNotNull)

  /** Exhaustive n-gram Jaccard pairs via a shingle inverted index:
    * explode → equi-join on shingle → count = |A∩B|, |A∪B| from set sizes.
    * Exactly two shuffles: the shingle-key self-join and the pair-key
    * aggregation.
    *
    * Plan notes (this is the engine's hottest dedup path):
    *  - per-doc capped set sizes are computed PRE-explode (`size(shingles)`
    *    is free on the array) and ride along each posting, so |A| and |B|
    *    fall out of the pair aggregation itself — no separate sizes
    *    aggregation and no post-agg joins back to the pair table;
    *  - the (id_a, id_b) pair is packed into one 64-bit key
    *    (`id_a << 32 | id_b`, PackedPair) for the count aggregation — half
    *    the grouping-key bytes and one hash per row instead of two.
    *    Requires ids in [0, 2³²) — enforced at runtime by PackedPair, and
    *    that range also bounds the pair space itself (an exhaustive-pairs
    *    output over more ids than that is not a plan anyone should run —
    *    use the LSH paths).
    *
    * `maxDf` is the scale guard: a shingle appearing in d docs contributes
    * d²/2 rows to the self-join, so one hot shingle ("in the the") makes
    * the plan quadratic. Over-cap shingles are dropped from the comparison
    * universe — index AND set sizes, so Jaccard stays internally
    * consistent. The hot list stays a DATAFRAME at any size (an anti-join
    * drops its postings; the planner broadcasts it when small): a
    * driver-collected literal would bound the operator by hot-list size,
    * which at corpus scale is totalPostings/cap — not driver-material.
    * When no shingle exceeds the cap (one cheap aggregation to check, the
    * common case for sane caps), set sizes stay the free pre-explode
    * `size(shingles)`; only an ENGAGED cap pays the post-filter size
    * re-aggregation. */
  def jaccardPairs(df: DataFrame, id: String, text: String, k: Int,
                   threshold: Double, maxDf: Option[Int] = None): DataFrame = {
    val jac = col("inter") * lit(1.0) /
      (col("na") + col("nb") - col("inter"))
    shinglePairCounts(df, id, text, k, maxDf, _.filter(jac >= threshold))
      .select(PackedPair.idA(col("pair")).as("id_a"),
        PackedPair.idB(col("pair")).as("id_b"),
        roundp(jac, 6).as("jac"))
  }

  /** Overlap-coefficient (Jaccard-containment) near-dup pairs:
    * score = |A∩B| / min(|A|,|B|) — the asymmetric-size criterion that
    * catches a document EMBEDDED in a larger one (quote-plus-commentary,
    * boilerplate-wrapped reposts), which plain Jaccard misses because the
    * union is dominated by the larger side. Same inverted-index plan and
    * `maxDf` scale guard as [[jaccardPairs]]; only the scoring differs. */
  def containmentPairs(df: DataFrame, id: String, text: String, k: Int,
                       threshold: Double, maxDf: Option[Int] = None): DataFrame = {
    val ov = col("inter") * lit(1.0) / least(col("na"), col("nb"))
    shinglePairCounts(df, id, text, k, maxDf, _.filter(ov >= threshold))
      .select(PackedPair.idA(col("pair")).as("id_a"),
        PackedPair.idB(col("pair")).as("id_b"),
        roundp(ov, 6).as("containment"))
  }

  /** Shared pair-intersection engine for the exhaustive shingle scorers:
    * builds the size-carrying inverted index (df-capped), self-joins it,
    * and returns one row per SURVIVING pair — (packed pair, |A∩B|, |A|,
    * |B|), where `keep` is the caller's score filter. Plan/persist notes
    * below apply to every consumer.
    *
    * EXACT-DUPLICATE COLLAPSE: byte-identical texts have identical
    * shingle sets, so a g-way duplicate group would cost the postings
    * self-join g² candidate rows PER SHARED SHINGLE; instead the index
    * is built over one representative per distinct text and members
    * expand back afterwards. `keep` runs at REP level (scores depend
    * only on (inter, na, nb), identical across a group), so the
    * expansion joins are strictly OUTPUT-bound; intra-group pairs carry
    * the group's post-cap set size (score ≡ 1 under both scorers, same
    * arithmetic). Web corpora are duplicate-heavy — this is the same
    * collapse-first discipline as Similarity.nearDupPairs, and the SQL
    * oracles (which replay brute pairs over ALL docs) pin its
    * exactness. */
  private def shinglePairCounts(df: DataFrame, id: String, text: String,
                                k: Int, maxDf: Option[Int],
                                keep: DataFrame => DataFrame): DataFrame = {
    val (grouped, members) = dupCollapse(df, id, text)
    // _m rides along so the hot-shingle check can weight by group size
    // (df is defined over DOCS, not distinct texts — a shingle made
    // ubiquitous by duplicated texts must still trip the cap exactly as
    // it does in the uncollapsed form and the SQL oracles)
    val sets0 = grouped.select(col("_gid").as("doc_id"), col("_m"),
        graft.functions.ShingleExpressions.wordShingles(col("_t"), k).as("shingles"))
      .filter(col("shingles").isNotNull)
    def preSizedInv(sets: DataFrame): DataFrame = sets
      .withColumn("n", size(col("shingles")))
      .filter(col("n") > 0)
      .select(col("doc_id"), col("n"), explode(col("shingles")).as("s"))
    // upstream persists feeding only the postings build — dead (and
    // eagerly unpersisted) once `inv` below is materialized
    val upstream = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    // CACHE PARTITIONED ON THE JOIN KEY: the postings self-join below is
    // the plan's heavy shuffle, and an unpartitioned cache makes the join
    // exchange BOTH sides (the same bytes, twice). Repartitioning on `s`
    // before the cache fill moves the postings through one exchange once;
    // the self-join then reuses the cached partitioning on both sides —
    // plan-verified 2 Exchange → 0 at the join (guide §2.4 shape).
    val inv = ScratchCache.register((maxDf match {
      case Some(cap) =>
        upstream += sets0.cache() // hot-check job + index build share the shingle pass
        val inv0 = sets0.select(col("doc_id"), explode(col("shingles")).as("s"))
        val hot = sets0.select(col("_m"), explode(col("shingles")).as("s"))
          .groupBy("s").agg(sum(col("_m")).as("_df"))
          .filter(col("_df") > cap).select("s")
        if (hot.isEmpty) preSizedInv(sets0) // cap is a no-op: sizes stay free
        else {
          // consumed by the sizes aggregation AND the join back: one
          // materialization instead of two anti-join recomputes
          val inv1 = inv0.join(hot, Seq("s"), "left_anti").persist()
          upstream += inv1
          val sizes = inv1.groupBy("doc_id").agg(count(lit(1)).as("n"))
          inv1.join(sizes, "doc_id").select(col("doc_id"), col("n"), col("s"))
        }
      case None => preSizedInv(sets0)
    }).transform(FanOut.byKey(_, col("s"))).cache()) // self-joined: materialize the postings once, pre-partitioned
    // fill the postings cache now (the self-join's first side would anyway)
    // so the upstream frames can be released before the heavy join runs
    inv.count()
    upstream.foreach(_.unpersist())
    // SHUFFLE_HASH: the equi-key is a string — a sort-merge join would sort
    // every posting twice just to stream them; hashing one (per-partition
    // bounded) side is strictly cheaper and AQE still handles skew splits
    val gPairs = inv.as("a").join(inv.as("b").hint("SHUFFLE_HASH"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .select(
        PackedPair.pack(col("a.doc_id"), col("b.doc_id")).as("pair"),
        col("a.n").as("na0"), col("b.n").as("nb0"))
      .groupBy(col("pair"))
      .agg(count(lit(1)).as("inter"),
        first(col("na0")).as("na"), first(col("nb0")).as("nb"))
    // cross-group expansion of the SURVIVORS: each member pair inherits
    // the rep pair's (inter, na, nb); na/nb swap with the id order so
    // "na = |set of id_a|" stays true
    val cross = keep(gPairs)
      .select(PackedPair.idA(col("pair")).as("_ga"),
        PackedPair.idB(col("pair")).as("_gb"),
        col("inter"), col("na"), col("nb"))
      .join(members.select(col("_gid").as("_ga"), col("doc_id").as("_ia")),
        Seq("_ga"))
      .join(members.select(col("_gid").as("_gb"), col("doc_id").as("_ib")),
        Seq("_gb"))
      .select(
        PackedPair.pack(least(col("_ia"), col("_ib")),
          greatest(col("_ia"), col("_ib"))).as("pair"),
        col("inter"),
        when(col("_ia") < col("_ib"), col("na")).otherwise(col("nb")).as("na"),
        when(col("_ia") < col("_ib"), col("nb")).otherwise(col("na")).as("nb"))
    // intra-group pairs: every member pair of a ≥2-way group whose
    // POST-CAP shingle set is non-empty (a group absent from the index —
    // all shingles hot or text too short — emits nothing, exactly like
    // the brute join). inter = na = nb = the group's post-cap size.
    val invSizes = inv.groupBy(col("doc_id")).agg(first(col("n")).as("n"))
    val intra = keep(grouped.filter(col("_m") >= 2L)
        .join(invSizes.withColumnRenamed("doc_id", "_gid"), Seq("_gid"))
        .select(col("_gid"), col("n").as("inter"),
          col("n").as("na"), col("n").as("nb")))
      .join(members.select(col("_gid"), col("doc_id").as("_ia")), Seq("_gid"))
      .join(members.select(col("_gid"), col("doc_id").as("_ib")), Seq("_gid"))
      .filter(col("_ia") < col("_ib"))
      .select(PackedPair.pack(col("_ia"), col("_ib")).as("pair"),
        col("inter"), col("na"), col("nb"))
    cross.unionByName(intra)
  }

  /** MinHash-LSH candidate pairs: n-hash signature, banded r rows/band,
    * docs sharing any band bucket become candidates. With r=2, b=32 the
    * miss probability at J≥0.8 is (1−0.8²)³² ≈ 6·10⁻¹⁵ — recall is
    * effectively 1 at the verification threshold. */
  def minhashCandidates(df: DataFrame, id: String, text: String, k: Int,
                        nHashes: Int, rowsPerBand: Int): DataFrame =
    minhashCandidatesFromSets(
      shingleSets(df, id, text, k), nHashes, rowsPerBand)

  /** Signature frame from a shingle-set frame (one fused ArrayPolyHash
    * pass over the set elements; MinHash's min-fold is order- and
    * multiplicity-insensitive, so the signature equals the
    * wordShingleHashes form exactly), threading `carry` columns through. */
  private[ops] def signatures(sets: DataFrame, nHashes: Int,
                         carry: Seq[String] = Nil): DataFrame =
    sets.select((col("doc_id") +: carry.map(col)) :+ minhashSignature(
        graft.functions.ShingleExpressions.arrayPolyHash(col("shingles")),
        nHashes).as("sig"): _*)
      .filter(size(col("sig")) > 0)

  /** Banded keys from a signature frame. Band bucket = ONE long: xxhash64
    * over (band index, the band's rows) — same (band, rows) always hashes
    * equal, so recall is untouched; a 64-bit collision can only ADD a
    * candidate, and every candidate is exact-verified downstream. */
  private[ops] def bandKeys(sig: DataFrame, nHashes: Int, rowsPerBand: Int,
                       carry: Seq[String] = Nil): DataFrame = {
    val nBands = nHashes / rowsPerBand
    sig.select((col("doc_id") +: carry.map(col)) :+
      explode(array((0 until nBands).map(b =>
        xxhash64(lit(b), slice(col("sig"), b * rowsPerBand + 1, rowsPerBand))): _*))
        .as("key"): _*)
  }

  /** Exact verification: candidate id pairs rejoin their shingle sets and
    * keep true Jaccard ≥ threshold — shared by the full and incremental
    * forms so the verification semantics cannot drift. */
  private[ops] def verifyJaccard(cands: DataFrame, sets: DataFrame,
                            threshold: Double): DataFrame = {
    // SHUFFLE_HASH measured, kept (r16 A/B at sf1, 32 cores, min-of-two
    // bench pairs): unhinted the pre-AQE plan degrades to SortMergeJoin
    // over the sets frames and every consumer pays the sort — q28 3.9 →
    // 10.8 s, q115 6.0 → 14.4 s, q128 7.1 → 19.0 s, q52 8.0 → 15.5 s;
    // AQE does NOT rescue it (the cached sets side plans under a persist,
    // where adaptive join re-planning is unavailable to the consumers).
    val withSets = cands
      .join(sets.select(col("doc_id").as("id_a"), col("shingles").as("sa"))
        .hint("SHUFFLE_HASH"), Seq("id_a"))
      .join(sets.select(col("doc_id").as("id_b"), col("shingles").as("sb"))
        .hint("SHUFFLE_HASH"), Seq("id_b"))
    val inter = size(array_intersect(col("sa"), col("sb")))
    val jac = inter * lit(1.0) / (size(col("sa")) + size(col("sb")) - inter)
    withSets.filter(jac >= threshold)
      .select(col("id_a"), col("id_b"), roundp(jac, 6).as("jac"))
  }

  /** Hot-band guard for the LSH band self-joins (guide §2.5 skew). The
    * band caches are pinned HashPartitioning(key) so the self-joins plan
    * with ZERO exchanges — which also removes the exchanges AQE's skew
    * split would need: one viral band bucket (near-identical boilerplate
    * cluster) of g rows lands g²/2 candidate generation in a SINGLE task
    * with no rescue. Buckets above this cap run through a salted join
    * instead (the maxDf-discipline analogue for buckets that cannot be
    * DROPPED: a df-cap may shrink the comparison universe, but dropping
    * an LSH candidate would break the pairs-above-threshold contract, so
    * the guard reshapes the layout and keeps the row multiset identical).
    * Conf-overridable; 8192² /2 ≈ 33M candidate rows is a seconds-scale
    * task, far above any bench-SF bucket (≤ |docs| = 5000 at sf0.1), so
    * the cold path — the exact pre-guard plan — is what every bench and
    * oracle run executes. */
  val HotBandCapKey = "graft.lsh.hotBandCap"
  val DefaultHotBandCap = 8192L

  /** Skew-guarded candidate SELF-join over a cached band frame: pairs of
    * rows sharing `keys` with a.doc_id < b.doc_id, `sel` projecting from
    * the joined (a, b) aliases. `bands` must already be persisted and
    * hash-partitioned on `keys` (FanOut.byKey). The cache fill runs HERE
    * as a per-key count aggregation — ONE action like the plain `.count()`
    * fill it replaces (the aggregation reuses the cached partitioning, so
    * no new exchange), and its max bucket size picks the regime:
    *  - every bucket ≤ hotCap: EXACTLY the plain self-join — same plan,
    *    same jobs, zero overhead;
    *  - else: over-cap keys split out (broadcast semi/anti — the cold
    *    sliver keeps the cached partitioning and the plain join); hot
    *    rows join salted — side a carries salt = xxhash64(doc_id) mod s,
    *    side b replicates s×, both explicitly repartitioned on
    *    (keys, salt) so a hot bucket spreads over s tasks. Each qualifying
    *    pair meets exactly once (on a's salt), so the output multiset is
    *    identical to the plain join — DedupSpec pins this. */
  private def bandSelfJoinSkewGuarded(bands: DataFrame, keys: Seq[String])
                                     (sel: DataFrame => DataFrame): DataFrame = {
    val spark = bands.sparkSession
    val hotCap = spark.conf.getOption(HotBandCapKey).map(_.toLong)
      .getOrElse(DefaultHotBandCap)
    val eq = (keys.map(k => col(s"a.$k") === col(s"b.$k")) :+
      (col("a.doc_id") < col("b.doc_id"))).reduce(_ && _)
    val counts = bands.groupBy(keys.map(col): _*).count()
    val maxRow = counts.agg(max(col("count"))).head() // fill + max, one action
    val maxBucket = if (maxRow.isNullAt(0)) 0L else maxRow.getLong(0)
    if (maxBucket <= hotCap)
      return sel(bands.as("a").join(bands.as("b").hint("SHUFFLE_HASH"), eq))
    val hotKeys = broadcast(
      counts.filter(col("count") > hotCap).select(keys.map(col): _*))
    val cold = bands.join(hotKeys, keys, "left_anti")
    val hot = bands.join(hotKeys, keys, "left_semi")
    // linear salt count: bounds the per-task BUILD side at ~hotCap rows;
    // per-task probe work is g·hotCap — a bucket so hot that even that
    // staggers is emitting O(g²) candidates and is mis-parameterized
    // upstream (raise rowsPerBand / tighten the collapse), not a layout
    // problem this guard can absorb
    val salts = math.min(64L, (maxBucket + hotCap - 1L) / hotCap).toInt
    val aS = FanOut.byKey(
      hot.withColumn("_salt",
        pmod(xxhash64(col("doc_id")), lit(salts.toLong))),
      (keys :+ "_salt").map(col): _*)
    val bS = FanOut.byKey(
      hot.withColumn("_salt",
        explode(array((0 until salts).map(i => lit(i.toLong)): _*))),
      (keys :+ "_salt").map(col): _*)
    sel(cold.as("a").join(cold.as("b").hint("SHUFFLE_HASH"), eq))
      .unionByName(sel(aS.as("a").join(bS.as("b").hint("SHUFFLE_HASH"),
        eq && col("a._salt") === col("b._salt"))))
  }

  /** Candidates from an ALREADY-SHINGLED (doc_id, shingles) table — lets a
    * caller that also needs the string sets (exact verification) pay the
    * tokenize+shingle pass once. */
  private def minhashCandidatesFromSets(sets: DataFrame, nHashes: Int,
                                        rowsPerBand: Int): DataFrame = {
    // the BAND frame is what the self-join reads — cache it directly,
    // PARTITIONED ON THE JOIN KEY, instead of caching the signature frame
    // and recomputing the band explode per join side: one cache instead
    // of two, and the self-join reuses the cached hash partitioning on
    // both sides (plan-verified 2 Exchange → 0 at the join; the single
    // fill exchange moves (doc_id, key) longs once). Lives until the
    // caller materializes the result (ScratchCache.releaseAll between
    // session jobs).
    val bands = ScratchCache.register(
      bandKeys(signatures(sets, nHashes), nHashes, rowsPerBand)
        .transform(FanOut.byKey(_, col("key"))).persist())
    // the skew-guarded join runs the eager fill (the inv.count()
    // discipline): an unfilled cache plans as UnknownPartitioning (its
    // AdaptiveSparkPlan has no final plan yet), which re-inserts both
    // self-join exchanges; a filled one reports HashPartitioning(key, N)
    // and the join reuses it on both sides. The fill also materializes
    // the upstream sets cache, whose own doc_id partitioning the verify
    // joins reuse the same way. SHUFFLE_HASH inside: long-key self-join,
    // no point sorting.
    bandSelfJoinSkewGuarded(bands, Seq("key"))(
      _.select(PackedPair.pack(col("a.doc_id"), col("b.doc_id")).as("pair")))
      .distinct() // one long per pair for the dedupe shuffle
      .select(PackedPair.idA(col("pair")).as("id_a"),
        PackedPair.idB(col("pair")).as("id_b"))
  }

  /** MinHash FIDELITY audit: for every near-dup pair at `threshold` (LSH
    * candidates, exact-verified — identical pair set to
    * [[minhashDedupPairs]]), the SIGNATURE-estimated Jaccard (matching
    * components / nHashes) next to the exact one. This is the estimator a
    * 100 TB deployment would trust INSTEAD of exact verification (exact
    * set intersection needs the shingle sets shipped to the pair; the
    * estimate needs only the fixed-width signature), so the per-pair
    * error table is the evidence for making that trade. Estimates are
    * exact rationals k/64 (dyadic — bit-identical across engines); the
    * error column subtracts the ROUNDED exact Jaccard so both engines
    * round identically. */
  def minhashFidelity(df: DataFrame, id: String, text: String, k: Int,
                      threshold: Double, nHashes: Int = 64,
                      rowsPerBand: Int = 2): DataFrame = {
    val sets = ScratchCache.register(
      FanOut.byKey(shingleSets(df, id, text, k), col("doc_id")).persist())
    val verified = verifyJaccard(
      minhashCandidatesFromSets(sets, nHashes, rowsPerBand), sets, threshold)
    val sig = signatures(sets, nHashes)
    val matches = aggregate(
      zip_with(col("siga"), col("sigb"),
        (a, b) => when(a === b, 1L).otherwise(0L)),
      lit(0L), (acc, v) => acc + v)
    verified
      .join(sig.select(col("doc_id").as("id_a"), col("sig").as("siga"))
        .hint("SHUFFLE_HASH"), Seq("id_a"))
      .join(sig.select(col("doc_id").as("id_b"), col("sig").as("sigb"))
        .hint("SHUFFLE_HASH"), Seq("id_b"))
      .select(col("id_a"), col("id_b"), col("jac"),
        roundp(matches / lit(nHashes.toDouble), 6).as("est_jac"),
        roundp(abs(matches / lit(nHashes.toDouble) - col("jac")), 6)
          .as("abs_err"))
  }

  /** LSH BANDING-EFFICIENCY curve: for nested band budgets (first 8, 16,
    * all 32 bands), the candidate-pair count and how many candidates are
    * true near-dups at `threshold` — the (cost, recall) tuning table for
    * picking a banding scheme. ONE banded self-join computes the MINIMUM
    * colliding band per pair; per-budget numbers are conditional sums
    * over that frame (prefix property: the candidate set of b bands is
    * exactly {min_band < b}), so the curve costs one LSH pass, not one
    * per budget. A 64-bit band-key collision could add a spurious
    * candidate (probability ≈ 2⁻⁶⁴ per band pair — the same accepted
    * class as every banded path here); true-pair flags use the exact
    * verified Jaccard. */
  def bandingEfficiency(df: DataFrame, id: String, text: String, k: Int,
                        threshold: Double, nHashes: Int = 64,
                        rowsPerBand: Int = 2,
                        bandCounts: Seq[Int] = Seq(8, 16, 32)): DataFrame = {
    val sets = ScratchCache.register(
      FanOut.byKey(shingleSets(df, id, text, k), col("doc_id")).persist())
    val nBands = nHashes / rowsPerBand
    // band frame cached pre-partitioned on the join key (not the signature
    // frame + per-side re-explode): self-join reuses the partitioning on
    // both sides — same shape as minhashCandidatesFromSets
    val bands = ScratchCache.register(signatures(sets, nHashes)
      .select(col("doc_id"),
        posexplode(array((0 until nBands).map(b =>
          xxhash64(lit(b), slice(col("sig"), b * rowsPerBand + 1, rowsPerBand))): _*))
          .as(Seq("b", "key")))
      .transform(FanOut.byKey(_, col("key"))).persist())
    // skew-guarded join runs the fill (expose HashPartitioning; hot-band
    // salting at scale — see bandSelfJoinSkewGuarded)
    val cand = bandSelfJoinSkewGuarded(bands, Seq("key"))(
      _.select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        col("a.b").as("ab")))
      .groupBy(col("id_a"), col("id_b"))
      .agg(min(col("ab")).as("min_band"))
    val withJac = ScratchCache.register(
      verifyJaccard(cand.select(col("id_a"), col("id_b")), sets, 0.0)
        .join(cand, Seq("id_a", "id_b"))
        .persist())
    bandCounts.map { bb =>
      withJac.agg(
        sum(when(col("min_band") < bb, 1L).otherwise(0L)).as("n_candidates"),
        sum(when(col("min_band") < bb && col("jac") >= threshold, 1L)
          .otherwise(0L)).as("n_true"))
        .select(lit(bb.toLong).as("bands_used"),
          col("n_candidates"), col("n_true"),
          roundp(col("n_true") * lit(1.0) / col("n_candidates"), 6)
            .as("precision"))
    }.reduce(_ unionByName _)
  }

  /** MinHash-LSH dedup: candidates exact-verified against true Jaccard on
    * the shingle sets — output identical to brute force at the threshold,
    * cost bounded by the candidate count. */
  /** `assumeDistinct`: callers whose input is PROVABLY duplicate-free
    * (e.g. the stage right after an exact-dedup pass) skip the collapse
    * — the grouping/expansion shuffles buy nothing there. */
  def minhashDedupPairs(df: DataFrame, id: String, text: String, k: Int,
                        threshold: Double, nHashes: Int = 64,
                        rowsPerBand: Int = 2,
                        assumeDistinct: Boolean = false): DataFrame = {
    if (assumeDistinct) {
      // ONE tokenize+shingle pass serves candidates AND verification
      val sets = ScratchCache.register(
      FanOut.byKey(shingleSets(df, id, text, k), col("doc_id")).persist())
      return verifyJaccard(
        minhashCandidatesFromSets(sets, nHashes, rowsPerBand), sets, threshold)
    }
    // EXACT-DUPLICATE COLLAPSE (see shinglePairCounts): identical texts
    // have identical signatures, so a g-way group floods every band
    // bucket with g copies; signatures/bands/verification run over one
    // representative per distinct text and members expand back
    // output-bound. Intra-group pairs exist in the uncollapsed join iff
    // the group's shingle set is non-empty (the signature filter) and
    // verify at exactly jac = 1.0.
    val (grouped, members) = dupCollapse(df, id, text)
    // ONE tokenize+shingle pass serves candidates AND exact verification
    val sets = ScratchCache.register(shingleSets(
      grouped.select(col("_gid").as("doc_id"), col("_t").as("_text")),
      "doc_id", "_text", k).transform(FanOut.byKey(_, col("doc_id"))).persist())
    val gp = verifyJaccard(minhashCandidatesFromSets(sets, nHashes, rowsPerBand),
      sets, threshold)
    val cross = expandMemberPairs(gp, members, "jac")
    val intra = grouped.filter(col("_m") >= 2L)
      .join(sets.filter(size(col("shingles")) > 0)
        .select(col("doc_id").as("_gid")), Seq("_gid"))
      .join(members.select(col("_gid"), col("doc_id").as("_ia")), Seq("_gid"))
      .join(members.select(col("_gid"), col("doc_id").as("_ib")), Seq("_gid"))
      .filter(col("_ia") < col("_ib"))
      .select(col("_ia").as("id_a"), col("_ib").as("id_b"),
        lit(1.0).as("jac"))
    cross.unionByName(if (threshold <= 1.0) intra else intra.limit(0))
  }

  /** Duplicate-collapse frames shared by the pair generators: `grouped`
    * has one row per DISTINCT text (`_t`, `_gid` = min member id, `_m` =
    * member count); `members` maps `_gid` → every member `doc_id`.
    *
    * SURVIVOR-SLIVER GATE (the `substringPairs` discipline): duplicates
    * can only live inside a 64-bit text-hash group of size ≥ 2, so the
    * hot-hash set is aggregated FIRST — an 8-byte-key, map-side-combined
    * shuffle, the only cost the collapse adds on a duplicate-free corpus
    * (where the hot set is empty and every doc is trivially its own
    * group: zero text shuffles, zero caches, no Window in the plan). Only
    * the sliver of docs whose hash group repeats pays the text-keyed
    * window that proves byte-equality; a hash collision can only ADD a
    * doc to the sliver (the window still partitions on true bytes, so
    * colliding distinct texts stay distinct groups), never merge texts —
    * byte-exactness is preserved unconditionally. On duplicate-heavy
    * corpora the sliver is the corpus and cost converges to the plain
    * window (WindowExec spills oversized partitions — an adversarial
    * all-identical corpus degrades to disk, never to a driver buffer). */
  /** Hot-group broadcast bound: 1M 8-byte keys ≈ 8 MB — comfortably
    * broadcastable, and a corpus with more repeated-hash groups than
    * that is duplicate-HEAVY, where the ungated full collapse is the
    * right plan anyway. */
  private val HotBroadcastMax = 1000000L

  /** Driver-collect bound for the hot set (2^16 8-byte keys ≈ 512 KB —
    * bounded by construction, the PercentileCut discipline): below it the
    * membership test is a codegen'd InSet FILTER, adding zero join or
    * exchange stages to the plan — measured, the two broadcast-join
    * stages otherwise cost more in AQE planning rounds than the sliver
    * work itself on rare-duplicate corpora. */
  private val HotCollectMax = 65536L

  private def dupCollapse(df: DataFrame, id: String,
                          text: String): (DataFrame, DataFrame) =
    dupCollapseWithBounds(df, id, text, HotCollectMax, HotBroadcastMax)

  /** Test seam: the regime bounds injectable, so DedupSpec can force the
    * broadcast-semi and degenerate full-window regimes on fixtures small
    * enough for a unit test (production callers always go through
    * [[dupCollapse]] with the real constants). */
  private[graft] def dupCollapseWithBounds(
      df: DataFrame, id: String, text: String,
      hotCollectMax: Long, hotBroadcastMax: Long): (DataFrame, DataFrame) = {
    val base = df.select(col(id).as("doc_id"), col(text).as("_t"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("_t"))
    val counts = ScratchCache.register(base
      .groupBy(xxhash64(col("_t")).as("_h"))
      .agg(count(lit(1)).as("_hc"))
      .persist())
    // ONE gate job yields all three regime inputs: hot-group count, docs
    // covered by hot groups, total docs
    val statsRow = counts.agg(
      coalesce(sum(when(col("_hc") >= 2L, 1L)), lit(0L)),
      coalesce(sum(when(col("_hc") >= 2L, col("_hc"))), lit(0L)),
      coalesce(sum(col("_hc")), lit(0L))).head()
    val (nHot, nDocsHot, nDocs) =
      (statsRow.getLong(0), statsRow.getLong(1), statsRow.getLong(2))
    val hot = counts.filter(col("_hc") >= 2L).select("_h") // cached parent
    if (nHot == 0L) {
      (base.select(col("_t"), col("doc_id").as("_gid"), lit(1L).as("_m")),
        base.select(col("doc_id").as("_gid"), col("doc_id")))
    } else if (nDocsHot * 2L >= nDocs) {
      // duplicate-heavy regime (sliver is the majority of the corpus):
      // the semi/anti split would shuffle the text twice for nothing —
      // run the single full-corpus window (one text shuffle, spill-safe)
      val tagged = ScratchCache.register(base
        .select(col("doc_id"), col("_t"),
          min(col("doc_id")).over(w).as("_gid"),
          count(lit(1)).over(w).as("_m"))
        .persist())
      val grouped = tagged.filter(col("doc_id") === col("_gid"))
        .select(col("_t"), col("_gid"), col("_m"))
      val members = tagged.select(col("_gid"), col("doc_id"))
      (grouped, members)
    } else if (nHot <= hotCollectMax) {
      // rare-duplicate regime, bounded collect: the sliver membership
      // test is an InSet filter — no join, no exchange; only the sliver
      // pays the text window
      val hotSet = hot.collect().map(_.getLong(0)).toSeq
      val withH = base.withColumn("_h", xxhash64(col("_t")))
      val sliver = withH.filter(col("_h").isin(hotSet: _*))
        .select(col("doc_id"), col("_t"),
          min(col("doc_id")).over(w).as("_gid"),
          count(lit(1)).over(w).as("_m"))
      val uniq = withH.filter(!col("_h").isin(hotSet: _*))
        .select(col("doc_id"), col("_t"),
          col("doc_id").as("_gid"), lit(1L).as("_m"))
      val tagged = ScratchCache.register(
        sliver.unionByName(uniq).persist())
      val grouped = tagged.filter(col("doc_id") === col("_gid"))
        .select(col("_t"), col("_gid"), col("_m"))
      val members = tagged.select(col("_gid"), col("doc_id"))
      (grouped, members)
    } else if (nHot <= hotBroadcastMax) {
      // mid regime: too many hot groups to collect — the hot set
      // broadcasts EXPLICITLY (the hint must not depend on AQE, because
      // consumers routinely materialize this plan under a .persist(),
      // components' edge cache, where adaptive join re-planning is
      // unavailable and an unhinted join would degrade to two full text
      // shuffles). Both joins are map-side; the sliver pays the window.
      val bHot = broadcast(hot)
      val withH = base.withColumn("_h", xxhash64(col("_t")))
      val sliver = withH.join(bHot, Seq("_h"), "left_semi")
        .select(col("doc_id"), col("_t"),
          min(col("doc_id")).over(w).as("_gid"),
          count(lit(1)).over(w).as("_m"))
      val uniq = withH.join(bHot, Seq("_h"), "left_anti")
        .select(col("doc_id"), col("_t"),
          col("doc_id").as("_gid"), lit(1L).as("_m"))
      val tagged = ScratchCache.register(
        sliver.unionByName(uniq).persist())
      val grouped = tagged.filter(col("doc_id") === col("_gid"))
        .select(col("_t"), col("_gid"), col("_m"))
      val members = tagged.select(col("_gid"), col("doc_id"))
      (grouped, members)
    } else {
      // degenerate corner (> 1M hot groups yet a minority sliver —
      // billions of docs with scattered small duplicate groups): an
      // unbroadcastable hot set would make the semi/anti split shuffle
      // the text TWICE on _h; the single full-corpus window (one text
      // shuffle, spill-safe) is strictly cheaper
      val tagged = ScratchCache.register(base
        .select(col("doc_id"), col("_t"),
          min(col("doc_id")).over(w).as("_gid"),
          count(lit(1)).over(w).as("_m"))
        .persist())
      val grouped = tagged.filter(col("doc_id") === col("_gid"))
        .select(col("_t"), col("_gid"), col("_m"))
      val members = tagged.select(col("_gid"), col("doc_id"))
      (grouped, members)
    }
  }

  /** Expand rep-level scored pairs (id_a, id_b, `score`) to member pairs:
    * every (member-of-a, member-of-b) pair inherits the rep pair's score
    * (identical bytes ⇒ identical score), re-canonicalized a < b. */
  private def expandMemberPairs(gp: DataFrame, members: DataFrame,
                                score: String): DataFrame =
    gp.select(col("id_a").as("_ga"), col("id_b").as("_gb"), col(score))
      .join(members.select(col("_gid").as("_ga"), col("doc_id").as("_ia")),
        Seq("_ga"))
      .join(members.select(col("_gid").as("_gb"), col("doc_id").as("_ib")),
        Seq("_gb"))
      .select(least(col("_ia"), col("_ib")).as("id_a"),
        greatest(col("_ia"), col("_ib")).as("id_b"), col(score))

  /** INCREMENTAL MinHash dedup: near-dup pairs where at least one side
    * belongs to the NEW batch (`isNew`) — the corpus-growth flow: old-old
    * pairs were already found when the old docs arrived, so a batch
    * ingest only needs new-new and new-old pairs.
    *
    * Scale shape vs the full form: the candidate join is new-bands ×
    * all-bands instead of the corpus band SELF-join — for a batch of B
    * docs against a corpus of N, candidate work drops from O(N²·p) to
    * O(B·N·p) band-collision pairs, and the planner can broadcast the
    * (small) new side outright. Output equals `minhashDedupPairs`
    * filtered to pairs touching the batch (spec-asserted). */
  def minhashDedupPairsIncremental(df: DataFrame, id: String, text: String,
                                   k: Int, threshold: Double, isNew: Column,
                                   nHashes: Int = 64, rowsPerBand: Int = 2): DataFrame = {
    val sets = ScratchCache.register(
      df.select(col(id).as("doc_id"), isNew.as("__new"),
          graft.functions.ShingleExpressions.wordShingles(col(text), k).as("shingles"))
        .filter(col("shingles").isNotNull)
        .transform(FanOut.byKey(_, col("doc_id")))
        .persist())
    // both candidate-join sides read the band frame: persist so the
    // signature pipeline runs once (same guarantee as the full form)
    val sig = ScratchCache.register(
      signatures(sets, nHashes, carry = Seq("__new")).persist())
    val bands = bandKeys(sig, nHashes, rowsPerBand, carry = Seq("__new"))
    // every candidate has a new side by construction; canonical (a<b)
    // packing dedupes the new-new pairs that both sides generate
    val newSide = bands.filter(col("__new"))
      .select(col("doc_id").as("nid"), col("key"))
    val cands = bands.select(col("doc_id").as("oid"), col("key"))
      .join(newSide.hint("SHUFFLE_HASH"), Seq("key"))
      .filter(col("nid") =!= col("oid"))
      .select(PackedPair.pack(least(col("nid"), col("oid")),
        greatest(col("nid"), col("oid"))).as("pair"))
      .distinct()
      .select(PackedPair.idA(col("pair")).as("id_a"),
        PackedPair.idB(col("pair")).as("id_b"))
    verifyJaccard(cands, sets, threshold)
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

  /** Connected components over an undirected pair table — the step that
    * turns near-dup PAIRS into dedup GROUPS (one canonical survivor per
    * component), which every pair generator above feeds at pipeline scale.
    * Returns (id, component_id) for every id appearing in a pair, where
    * component_id = min id reachable.
    *
    * Algorithm: iterative min-label propagation — each round every node
    * takes the min of its own and its neighbors' labels; one
    * neighbor-label equi-join + one min-aggregation shuffle per round,
    * fully distributed (no driver-side union-find). Converges in
    * O(component diameter) rounds; near-dup components are
    * short-diameter in practice, and `maxIter` bounds adversarial
    * chains.
    *
    * Latency shape: exactly ONE Spark action per round — the round's
    * aggregation carries an `observe` metric counting labels that
    * DECREASED this round (exact, overflow-free, unlike a label-sum
    * compare), so materializing the new generation and detecting the
    * fixpoint are the same job. Round 1 is folded into initialization:
    * the seed label is already min(id, neighbors) from a single
    * aggregation over the edge list, so a diameter-d component needs
    * d-1 loop rounds, and pair tables with no chains (the common
    * near-dup case: every component a clique around one survivor)
    * converge with a single loop pass. */
  def connectedComponents(pairs: DataFrame, a: String, b: String,
                          maxIter: Int = 25): DataFrame =
    connectedComponentsWithBounds(pairs, a, b, maxIter, -1L)

  /** Test seam: `labelBroadcastMax` overrides the session's
    * autoBroadcastJoinThreshold as the labels-fit-a-broadcast bound (-1 =
    * use the session conf), so a unit test can force the scale regime
    * (dst-partitioned edge cache + pointer jump) on a fixture small enough
    * to assert on. Production callers go through [[connectedComponents]]. */
  private[graft] def connectedComponentsWithBounds(
      pairs: DataFrame, a: String, b: String,
      maxIter: Int, labelBroadcastMax: Long): DataFrame = {
    // both edge directions from ONE pass over the pair plan (a union of
    // two selects would evaluate the upstream pair generator twice).
    // Cached UNPARTITIONED: in the common regime (labels fit a broadcast
    // — every bench SF, and any corpus whose near-dup graph converges at
    // the seed) the per-round neighbor join broadcasts labels and never
    // shuffles the edges, so a dst repartition before the fill would be a
    // pure extra exchange (measured r15: q133 5.9→9.7 s, q128 6.7→10.0 s
    // from exactly that). The scale regime re-caches on dst below, gated
    // on the OBSERVED label count — never speculatively.
    val edges0 = ScratchCache.register(
      pairs.select(explode(array(
          struct(col(a).cast("long").as("src"), col(b).cast("long").as("dst")),
          struct(col(b).cast("long").as("src"), col(a).cast("long").as("dst"))))
          .as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
        .persist())
    var edges = edges0
    // seed = round 1: label(id) = min(id, all neighbors) in one shuffle
    // (edges carry both directions, so min(least(src,dst)) grouped by src
    // IS the first propagation step)
    var labels = edges.groupBy(col("src").as("id"))
      .agg(min(least(col("src"), col("dst"))).as("label"))
      .persist()
    // Plan view each round BUILDS on. Round 0 uses the seed plan directly
    // (the common single-round case keeps the r14 plan shape exactly);
    // later rounds use a LINEAGE-CUT view of the materialized generation
    // (LogicalRDD over the persisted rows) — without the cut, each round's
    // logical plan embeds the previous round's 3-4 times (own + neighbor +
    // jump sides), so analysis cost and plan strings grow as 4^rounds and
    // a ~10-round chain OOMs the driver before any data moves. The cut
    // costs one Row conversion per round read and only exists off the
    // seed-convergent fast path.
    var labelsView = labels
    var it = 0
    var nLabels = -1L
    var converged = false
    while (!converged && it < maxIter) {
      // SCALE GATE, decided by round 0's own materialization (zero extra
      // jobs): round 0 IS the r14 plan — star/clique components (the
      // near-dup common case) converge there and never reach this block.
      // A round-0 non-convergence means real chains; from round 1 on,
      // (a) when the label table (nLabels rows of two longs) outgrows a
      // broadcast, the per-round join would shuffle the edges EVERY round
      // — re-cache them hash-partitioned on dst once (one pass over the
      // already-cached edges) so the join reuses the cached layout (the
      // PageRank edge-cache discipline);
      if (it == 1) {
        val bcMax =
          if (labelBroadcastMax >= 0L) labelBroadcastMax
          else pairs.sparkSession.sessionState.conf.autoBroadcastJoinThreshold
        if (bcMax >= 0L && nLabels * 16L > bcMax) {
          val e = ScratchCache.register(
            FanOut.byKey(edges0, col("dst")).persist())
          e.count() // fill from the cached unpartitioned edges, then drop them
          edges0.unpersist()
          edges = e
        }
      }
      val obs = org.apache.spark.sql.Observation(s"cc_round_$it")
      val own = labelsView.select(col("id"), col("label"), lit(true).as("own"))
      val nbr = edges.join(labelsView.withColumnRenamed("id", "dst"), Seq("dst"))
        .select(col("src").as("id"), col("label"), lit(false).as("own"))
      // (b) POINTER-JUMP SHORTCUT, same gate: each id also adopts its
      // label's label (labels form a monotone forest — label(id) ≤ id and
      // both are in id's component, so label(label(id)) is too).
      // Propagation alone needs O(diameter) rounds on a chain; the jump
      // doubles covered distance per round, so convergence is
      // O(log diameter). Deferring it to round 1 costs nothing
      // asymptotically and keeps the seed-convergent case (every bench
      // query) free of the labels⋈labels join r15 paid per round.
      val withJump =
        if (it == 0) own.union(nbr)
        else {
          val jump = labelsView.select(col("id"), col("label").as("_l"))
            .join(labelsView.select(col("id").as("_l"), col("label").as("_ll")),
              Seq("_l"))
            .select(col("id"), col("_ll").as("label"), lit(false).as("own"))
          own.union(nbr).union(jump)
        }
      // the old label rides the aggregation (each id has exactly ONE own
      // row), so "did anything change" is measured inside the same pass
      val next = withJump
        .groupBy(col("id"))
        .agg(min(col("label")).as("label"),
          max(when(col("own"), col("label"))).as("__old"))
        .observe(obs,
          coalesce(sum(when(col("label") < col("__old"), 1L).otherwise(0L)),
            lit(0L)).as("changed"))
        .select(col("id"), col("label"))
        .persist()
      nLabels = next.count() // the ONE action: materializes next + the metric
      labels.unpersist()     // superseded generation frees NOW
      labels = next
      // lineage cut (see labelsView note above): rounds > 0 build on the
      // materialized rows, not the nested logical plan
      labelsView = next.sparkSession.createDataFrame(next.rdd, next.schema)
      converged = obs.get("changed").asInstanceOf[Long] == 0L
      it += 1
    }
    if (sys.env.contains("GRAFT_CC_DEBUG"))
      System.err.println(s"connectedComponents: $it rounds")
    // (an empty graph needs no special case: the seed aggregation is
    // empty, the first loop pass observes 0 changes and exits converged)
    // a silent partial propagation would hand dedup several "canonical"
    // survivors per true component — refuse instead; callers with known
    // long chains raise maxIter
    if (!converged) {
      labels.unpersist()
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds " +
          "(component diameter exceeds maxIter?)")
    }
    ScratchCache.register(labels) // final generation: released by the sweep
    labels.select(col("id"), col("label").as("component_id"))
  }

  /** Connected components when every edge is CONFINED to a block — the
    * record-linkage invariant: candidate pairs come from a blocking key
    * (prefix, LSH bucket, sort-neighborhood window), so no edge ever
    * crosses blocks and each component lives inside exactly one block.
    *
    * That invariant collapses the iterative min-label propagation
    * ([[connectedComponents]]: one shuffle + one driver action PER
    * diameter round) to ONE shuffle total: hash-partition the pairs by
    * block key, then run union-find locally per block inside
    * `flatMapGroups`. Memory is bounded by the largest block — the same
    * bound blocking itself promises (an unbounded block would already
    * have blown up the pair join quadratically upstream), so this is
    * scale-safe wherever blocked matching is.
    *
    * Returns (id BIGINT, component_id BIGINT) — component_id = min id of
    * the component, matching [[connectedComponents]] exactly. Ids may
    * repeat across blocks only if the caller's blocking is non-disjoint;
    * with disjoint blocks (one block per record) each id appears once. */
  def blockLocalComponents(pairs: DataFrame, block: String, a: String,
                           b: String): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    pairs
      .select(col(block).cast("string"), col(a).cast("long"),
        col(b).cast("long"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (_, it) =>
        val parent = scala.collection.mutable.HashMap.empty[Long, Long]
        def find(x: Long): Long = {
          var r = x
          while (parent(r) != r) r = parent(r)
          var c = x // path compression
          while (parent(c) != c) { val n = parent(c); parent(c) = r; c = n }
          r
        }
        it.foreach { case (_, x, y) =>
          parent.getOrElseUpdate(x, x)
          parent.getOrElseUpdate(y, y)
          val rx = find(x); val ry = find(y)
          if (rx != ry) { if (rx < ry) parent(ry) = rx else parent(rx) = ry }
        }
        // roots are unioned min-first, so find(id) IS the component min
        parent.keysIterator.map(idv => (idv, find(idv))).toArray.iterator
      }
      .toDF("id", "component_id")
  }

  /** SimHash near-dup pairs: 4×12-bit band candidates (hamming ≤ maxHamming
    * guarantees ≥1 identical band when maxHamming < 4 by pigeonhole over 48
    * bits), verified by exact hamming distance.
    *
    * FINGERPRINT-level duplicate collapse — strictly coarser (and
    * cheaper) than [[shinglePairCounts]]'s text collapse: hamming
    * depends ONLY on the 48-bit fingerprint, so ANY docs sharing one
    * (byte-identical texts included, but also distinct texts that
    * fingerprint equal — e.g. every sub-k-token doc at fp 0) are
    * interchangeable in the band join. Fingerprints are computed once
    * over the full corpus as before; the collapse window then shuffles
    * 16-byte (id, fp) rows, never text — and only for the sliver of
    * docs whose fingerprint actually repeats (sliver gate below). Cross
    * pairs inherit the rep pair's hamming; intra-group pairs are
    * hamming-0 by definition and emitted unconditionally (simhash48 is
    * total). */
  def simhashPairs(df: DataFrame, id: String, text: String, k: Int,
                   maxHamming: Int): DataFrame = {
    require(maxHamming < 4, "4-band pigeonhole only covers hamming <= 3")
    // Single-pass collapse: ONE fingerprint-partitioned window over the
    // fingerprint frame yields the rep frame (`grouped`), the expansion
    // map (`members`), and the group sizes from the SAME shuffle —
    // measured faster than both the sliver-gated regime (the gate's job
    // barriers outweigh the skipped expansions: sf1 3.6 s vs 1.9 s) and
    // the agg + fingerprint-keyed join-back (whose join RESHUFFLES the
    // full frame a second time: sf1 3.0 s vs 1.9 s; sf0.1 flat). The
    // window is simhash-partitioned — never global — and spill-safe at
    // any duplicate-group skew, unlike a collect_list-style expansion
    // buffer (the q211 plan audit pins the partitioning).
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("simhash"))
    val tagged = ScratchCache.register(
      simhashFingerprints(df, id, text, k)
        .select(col("doc_id"), col("simhash"),
          min(col("doc_id")).over(w).as("_gid"),
          count(lit(1)).over(w).as("_m"))
        .persist())
    val grouped = tagged.filter(col("doc_id") === col("_gid"))
    val members = tagged.select(col("_gid"), col("doc_id"))
    val fp = grouped.select(col("doc_id"), col("simhash")) // rep frame, self-joined
    val gp = simhashBandPairsPacked(fp, maxHamming)
    val cross = expandMemberPairs(
      gp.select(PackedPair.idA(col("pair")).as("id_a"),
        PackedPair.idB(col("pair")).as("id_b"), col("hamming")),
      members, "hamming")
    val intra = grouped.filter(col("_m") >= 2L)
      .join(members.select(col("_gid"), col("doc_id").as("_ia")), Seq("_gid"))
      .join(members.select(col("_gid"), col("doc_id").as("_ib")), Seq("_gid"))
      .filter(col("_ia") < col("_ib"))
      .select(col("_ia").as("id_a"), col("_ib").as("id_b"),
        lit(0L).as("hamming"))
    cross.unionByName(intra)
  }

  /** Banded candidate self-join + exact hamming verification over a
    * (doc_id, simhash) frame — the scoring core of [[simhashPairs]],
    * run over the collapsed rep frame. */
  private def simhashBandPairsPacked(fp: DataFrame,
                                     maxHamming: Int): DataFrame = {
    // cached pre-partitioned on the join key so the self-join reuses the
    // partitioning on both sides instead of exchanging the band frame
    // twice (same shape as the minhash/postings caches above)
    val bands = ScratchCache.register(fp.select(col("doc_id"), col("simhash"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("simhash"), b * 12).bitwiseAND(lit(0xFFFL)).as("key"))): _*))
        .as("bk"))
      .select(col("doc_id"), col("simhash"),
        col("bk.band").as("band"), col("bk.key").as("key"))
      .transform(FanOut.byKey(_, col("band"), col("key"))).persist())
    // skew-guarded join runs the fill (expose HashPartitioning; hot-band
    // salting at scale — see bandSelfJoinSkewGuarded). hamming is per-pair
    // constant, so verify BEFORE the dedupe: only surviving near-dups
    // enter the distinct, and the shuffle carries one packed long + the
    // distance instead of two ids + two fingerprints
    bandSelfJoinSkewGuarded(bands, Seq("band", "key"))(
      _.select(
        PackedPair.pack(col("a.doc_id"), col("b.doc_id")).as("pair"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash")))
          .cast("bigint").as("hamming"))
        .filter(col("hamming") <= maxHamming))
      .distinct()
  }

  /** Exact-substring overlap pairs: documents sharing ≥1 identical
    * character window of length `winLen` — the k-gram fingerprint
    * formulation of suffix-based exact-substring dedup (the "50-token
    * exact match" criterion of Lee et al., "Deduplicating Training Data
    * Makes Language Models Better", ACL '22, which builds a suffix array;
    * the distributed equivalent indexes every length-L window and joins).
    *
    * Plan — linear aggregations only, no self-join, one heavy shuffle:
    *  1. per-doc distinct windows from the fused CharWindows kernel (the
    *     staged `array_distinct∘transform∘sequence` form pays an
    *     interpreted lambda dispatch per window — it was the dominant
    *     cost before fusing);
    *  2. df per 64-bit window HASH (xxhash64): the heavy shuffle moves
    *     16-byte (hash, count-partial) rows through a codegen'd long-key
    *     hash aggregate instead of 40+-byte strings. Only hashes seen in
    *     2..maxDf docs survive — shared windows are a sliver of the index
    *     (most windows are unique);
    *  3. the window stream regenerates (rescanning the corpus is ~30×
    *     cheaper than materializing the window index) and semi-joins the
    *     surviving hashes — AQE broadcasts the sliver, so no second
    *     full shuffle — then groups by the actual WINDOW: pair emission
    *     compares true characters, so a hash collision can only ADMIT a
    *     candidate that then forms no pair (count ≥ 2 is re-proven per
    *     window), never corrupt a pair.
    *  4. each surviving window's C(d,2) pairs come from its sorted doc
    *     set (bounded: a survivor's hash-group had ≤ maxDf rows, and the
    *     true group is a subset), counted per pair.
    * `maxDf` is the boilerplate guard (a license-header window in d docs
    * would emit d²/2 pairs). Applying it to hash-groups can only drop an
    * innocent window if it 64-bit-collides with a hot one (~d·2⁻⁶⁴ —
    * negligible at any realizable corpus size, and collisions only
    * REMOVE candidate windows from the comparison universe, mirroring
    * the cap's own semantics). A naive window self-join instead of 2+3
    * shuffles the full string index twice and risks quadratic join rows;
    * measured 4× slower at sf0.1.
    *
    * Round-7 tuning pass (ProfQ58, quiet host, sf0.1): persisting the
    * exploded window frame across the passes costs MORE than the rescan
    * (270 MB cache write); a typed single-scan groupBy(h) that shuffles
    * window STRINGS is 1.3-2× slower; replacing pass 1's hash aggregate
    * with an exchange + per-partition sort-run count wins pass 1 ~15%
    * but loses it back in the full plan — the mapPartitions boundary
    * hides `keep`'s size from AQE, so the semi-join stops broadcasting.
    * This plan is the measured optimum; the remaining gap to the DuckDB
    * twin is Spark's per-stage fixed overhead, not data cost. */
  def substringPairs(df0: DataFrame, id: String, text: String, winLen: Int,
                     maxDf: Option[Int] = None): DataFrame = {
    require(winLen >= 2)
    // the window kernels below explode each doc ~|text| ways: fan the
    // COMPACT doc rows out first when the scan alone can't parallelize
    // (single-row-group input) — identity on any real-size corpus
    val df = FanOut.cpu(df0)
    val hp = graft.functions.ShingleExpressions.charWindowHashPos(col(text), winLen)
    // Pass 1 — df count over window HASHES only (12-byte structs, no
    // window-string allocation or shuffle; the kernel hashes straight off
    // the documents' UTF-8 bytes). Partial agg collapses each map side to
    // its distinct hashes, so the shuffle is ~|distinct windows| longs.
    // (An explicit-width repartition on h used to hold the reduce side
    // wide against AQE coalescing; with the fan-out above making the map
    // side parallel, the extra exchange measures strictly slower —
    // ProfQ58b: pass-1 0.92 s with it, 0.65 s without.)
    val keep = df.select(explode(hp).as("w"))
      .select(col("w.h").as("h"))
      .groupBy(col("h")).count()
      .filter(col("count") >= 2 &&
        col("count") <= lit(maxDf.getOrElse(Int.MaxValue)))
      .select("h")
    // Pass 2 — re-derive (h, pos) and materialize the window STRING for
    // surviving hashes only (one substr per survivor, in the same codegen
    // stage as the explode: dropped windows never allocate). `keep` is
    // runtime-broadcast by AQE, so nothing here shuffles window text
    // except the few duplicated windows entering the sets agg.
    val sets = df.select(col(id).cast("long").as("doc_id"),
        col(text).as("t"), explode(hp).as("w"))
      .withColumn("h", col("w.h"))
      .join(keep, Seq("h"), "left_semi")
      .select(col("doc_id"), col("t").substr(col("w.pos"), lit(winLen)).as("sub"))
      .groupBy("sub").agg(sort_array(collect_set(col("doc_id"))).as("ds"))
      .filter(size(col("ds")) >= 2) // collision-admitted singletons drop here
    sets.select(col("sub"), explode(expr(
        // all i<j pairs of the sorted doc set
        "flatten(transform(ds, (a, i) -> " +
        "transform(slice(ds, i + 2, size(ds)), b -> struct(a, b))))")).as("pr"))
      .groupBy(col("pr.a").as("id_a"), col("pr.b").as("id_b"))
      .agg(count(lit(1)).as("shared"), min(col("sub")).as("example"))
  }
}
