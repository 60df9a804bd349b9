package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic fixed-point PageRank over an edge list.
  *
  * Ranks are BIGINT fixed-point (`scale` = 10¹² mass total), every step
  * integer arithmetic: share = r DIV out-degree, damping = ×85 DIV 100.
  * Floating-point PageRank is order-sensitive — a distributed sum's
  * reduction tree changes the low bits run to run, so two engines (or two
  * cluster layouts!) disagree in the last ulp and a hash-exact comparison
  * is impossible. Integer division loses the same remainder mass on every
  * engine, making the iteration bit-reproducible: the DuckDB oracle twin
  * runs the identical `//` cascade and matches exactly (q93).
  *
  * Scale shape: per iteration one shuffle for the contribution sum (edges
  * join ranks on src — both sides hash-partitioned on the join key), one
  * broadcast of the 1-row dangling-mass aggregate, one co-partitioned
  * left join to carry rankless nodes. Iteration count is FIXED (the
  * caller picks it), so the whole run is one lazy Catalyst plan — no
  * per-round driver actions (the q51 lesson). The node frame carries the
  * static out-degree, so no per-iteration rank⋈degree join exists. It is
  * persisted via [[ScratchCache]] because every iteration re-reads it,
  * and so is each iteration's rank generation: it feeds BOTH the
  * dangling-mass broadcast and the
  * linked-contribution path, and without a cache boundary every
  * generation's consumers would re-evaluate the whole chain below it —
  * the broadcast subjobs double the subtree per iteration, ~2^iters
  * total work (measured 2.2× on 3 iterations at sf0.1). The edge frame
  * is hash-repartitioned on `src` BEFORE caching so the per-iteration
  * contribution join reuses that layout (InMemoryTableScan reports the
  * child partitioning) instead of re-shuffling the edges every round —
  * the same pay-the-shuffle-once layout Bucketing gives on disk.
  */
object PageRank {

  /** Estimated driver bytes per rank-vector entry under the broadcast
    * regime (two Long→Long maps + the sorted id array, amortized). */
  private val BytesPerNode = 40L

  /** Last strategy [[rank]] chose — observable by specs so the switch
    * itself is testable, not just the (identical) numeric output. */
  @volatile private[graft] var lastChoice: String = ""

  /** Strategy predicate, split out so the threshold arithmetic is
    * unit-testable without running a job. */
  private[graft] def broadcastFits(nNodes: Long, maxBroadcastBytes: Long): Boolean =
    nNodes * BytesPerNode <= maxBroadcastBytes

  /** Single entry point: MEASURES the vertex count (one
    * approx_count_distinct pre-job over the edge frame — the same
    * size-probe spirit as `spark.sql.autoBroadcastJoinThreshold`) and
    * picks the regime, so callers never hand-pick the scale-sensitive
    * variant. Under `maxBroadcastBytes` of estimated driver rank-vector
    * footprint → [[rankIntBroadcast]]; past it → the fully distributed
    * [[rankInt]]. Both produce bit-identical ranks (integer fixed-point),
    * so the switch can never change results — only plan shape. */
  def rank(spark: SparkSession, edges: DataFrame, iters: Int,
           scale: Long = 1000000000000L,
           maxBroadcastBytes: Long = 64L << 20): DataFrame = {
    // persist BEFORE the probe: the probe job fills the cache, so the
    // (possibly expensive — q93's edges are a distinct over lineitem)
    // edge derivation runs once, not once for the probe and again for
    // the ranking variant (the variants see storageLevel set and skip
    // their own re-persist)
    val e = ScratchCache.register(
      edges.select(col("src").cast("long"), col("dst").cast("long")).persist())
    val nNodes = e.select(explode(array(col("src"), col("dst"))).as("id"))
      .agg(approx_count_distinct(col("id")).as("n"))
      .head().getLong(0)
    if (broadcastFits(nNodes, maxBroadcastBytes)) {
      lastChoice = "broadcast"
      rankIntBroadcast(spark, e, iters, scale)
    } else {
      lastChoice = "distributed"
      rankInt(spark, e, iters, scale)
    }
  }

  /** `edges`: distinct (src: BIGINT, dst: BIGINT). Returns (id, rank). */
  def rankInt(spark: SparkSession, edges: DataFrame, iters: Int,
              scale: Long = 1000000000000L): DataFrame = {
    require(iters >= 1 && iters <= 20, "fixed small iteration count")
    val pre = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .repartition(col("src"))
    // an already-cached input (rank()'s probe) feeds the repartition from
    // memory; only persist the co-partitioned layout itself
    val e = ScratchCache.register(pre.persist())
    // node frame CARRIES the (static) out-degree: the rank generation is
    // (id, d, r) throughout, so no per-iteration rank⋈degree join exists —
    // dangling/linked are mere filters on the cached generation, and the
    // recombination join contrib⋈nd is co-partitioned (both hash(id)).
    val nd = ScratchCache.register(
      e.select(col("src").as("id")).union(e.select(col("dst").as("id")))
        .distinct()
        .join(e.groupBy(col("src").as("id")).agg(count(lit(1)).as("d")),
          Seq("id"), "left")
        .persist())
    val n = nd.count()
    require(n > 0, "empty graph")
    val r0 = scale / n                     // integer base rank
    val base = 15L * r0 / 100              // (1-α) term, α = 85/100
    var r = nd.withColumn("r", lit(r0))
    for (_ <- 1 to iters) {
      val cur = ScratchCache.register(r.persist())
      // 1-row dangling mass, joined in lazily (broadcast, no action)
      val dang = cur.filter(col("d").isNull)
        .agg(coalesce(sum(col("r")), lit(0L)).as("dm"))
      val linked = cur.filter(col("d").isNotNull)
      val contrib = e.join(linked, e("src") === linked("id"))
        .select(col("dst").as("id"), expr("r div d").as("share"))
        .groupBy("id").agg(sum(col("share")).as("c"))
      r = nd.join(contrib, Seq("id"), "left").crossJoin(broadcast(dang))
        .select(col("id"), col("d"),
          (lit(base) + expr(s"85 * (coalesce(c, 0L) + dm div ${n}L) div 100"))
            .as("r"))
    }
    r.select(col("id"), col("r").as("rank"))
  }

  /** [[rankInt]] when the VERTEX SET fits in a broadcast (the bounded-
    * vertex regime: bipartite catalog graphs, entity graphs — here ~21k
    * nodes vs ~600k edges). Bit-identical output to [[rankInt]] (every
    * step the same integer cascade; integer sums are reduction-order-
    * free), but the rank vector lives on the driver between iterations —
    * the same boundedness contract as a broadcast join side or the PQ
    * codebooks — so each iteration is ONE distributed job: a broadcast
    * share-lookup join over the cached edges + a partial-combined sum by
    * dst, collecting |nodes| longs. No per-iteration wide join, no rank
    * generation caching, no dangling-mass subjob (driver arithmetic).
    * Past broadcastable |nodes|, [[rankInt]] is the any-scale path. */
  def rankIntBroadcast(spark: SparkSession, edges: DataFrame, iters: Int,
                       scale: Long = 1000000000000L): DataFrame = {
    import spark.implicits._
    require(iters >= 1 && iters <= 20, "fixed small iteration count")
    // rank()'s probe hands the frame in already cached — don't write a
    // second identical cache copy for the cast projection
    val e =
      if (edges.storageLevel.useMemory)
        edges.select(col("src").cast("long"), col("dst").cast("long"))
      else ScratchCache.register(
        edges.select(col("src").cast("long"), col("dst").cast("long")).persist())
    // ONE setup job: every node id with its out-degree (out-degree 0 =
    // dangling) from a single explode + aggregate — not separate deg and
    // distinct-ids jobs (per-job fixed cost dominates at gate SF; at
    // scale it is one shuffle either way). |nodes| bounded by contract.
    val nodeDeg: Array[(Long, Long)] = e.select(explode(array(
        struct(col("src").as("id"), lit(1L).as("c")),
        struct(col("dst").as("id"), lit(0L).as("c")))).as("x"))
      .groupBy($"x.id".as("id")).agg(sum($"x.c").as("d"))
      .as[(Long, Long)].collect()
    val deg: Map[Long, Long] = nodeDeg.iterator
      .filter(_._2 > 0).toMap
    val ids: Array[Long] = nodeDeg.map(_._1).sorted
    val n = ids.length.toLong
    require(n > 0, "empty graph")
    val r0 = scale / n
    val base = 15L * r0 / 100
    var rank: Map[Long, Long] = ids.iterator.map(_ -> r0).toMap
    for (_ <- 1 to iters) {
      // driver: per-source share = r div d; dangling mass = rankless sum
      val share = deg.iterator.map { case (id, d) => (id, rank(id) / d) }.toSeq
      val dm = ids.iterator.filterNot(deg.contains).map(rank).sum
      val contrib: Map[Long, Long] = e
        .join(broadcast(share.toDF("src", "share")), Seq("src"))
        .groupBy($"dst").agg(sum($"share").as("c"))
        .as[(Long, Long)].collect().toMap
      rank = ids.iterator.map { id =>
        id -> (base + 85L * (contrib.getOrElse(id, 0L) + dm / n) / 100L)
      }.toMap
    }
    rank.toSeq.toDF("id", "rank")
  }
}
