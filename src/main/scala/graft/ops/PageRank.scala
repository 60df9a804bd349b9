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
  *
  * Setup is ONE aggregate for both regimes: the (id, out-degree) node
  * frame (out-degree 0 = dangling) doubles as the exact vertex-count
  * probe for the strategy switch — there is no separate
  * approx_count_distinct pre-job (it redid the same explode+agg work the
  * node frame needs anyway; folding it cut two setup jobs at gate SF).
  */
object PageRank {

  /** Estimated driver bytes per rank-vector entry under the broadcast
    * regime (two Long→Long maps + the sorted id array, amortized). */
  private val BytesPerNode = 40L

  /** Driver bytes per collected distinct edge under the driver-local
    * regime — the WORKING footprint, not the raw payload: the collected
    * Array[(Long,Long)] boxes each edge in a Tuple2 (~48 B with object
    * headers + array ref), plus the two Int index arrays (8 B/edge) and
    * the per-node long arrays (amortized small: |V| ≤ 2|E|). 16 B/edge
    * (the serialized size) would admit graphs whose transient heap is
    * 4-5× the budget. */
  private val BytesPerEdge = 64L

  /** Last strategy [[rank]] chose — observable by specs so the switch
    * itself is testable, not just the (identical) numeric output. */
  @volatile private[graft] var lastChoice: String = ""

  /** Strategy predicate, split out so the threshold arithmetic is
    * unit-testable without running a job. */
  private[graft] def broadcastFits(nNodes: Long, maxBroadcastBytes: Long): Boolean =
    nNodes * BytesPerNode <= maxBroadcastBytes

  /** Shared setup: cached cast edge frame + cached (id, d) node frame
    * (d = out-degree, 0 ⇒ dangling) from a single explode + aggregate. */
  private def nodeDegFrame(e: DataFrame): DataFrame =
    ScratchCache.register(
      e.select(explode(array(
          struct(col("src").as("id"), lit(1L).as("c")),
          struct(col("dst").as("id"), lit(0L).as("c")))).as("x"))
        .groupBy(col("x.id").as("id")).agg(sum(col("x.c")).as("d"))
        .persist())

  /** Single entry point with THREE measured regimes (the
    * Triangles.metrics pattern), picked automatically so callers never
    * hand-pick the scale-sensitive variant; every regime produces
    * bit-identical ranks (integer fixed-point — sums are
    * reduction-order-free), so the switch can never change results,
    * only plan shape:
    *
    *  1. driver-local — the DISTINCT EDGE LIST fits
    *     `maxDriverEdgeBytes` (64 B/edge of WORKING footprint —
    *     boxed collect + index arrays, see [[BytesPerEdge]]): collect
    *     it once and iterate
    *     in driver arrays. Zero per-iteration jobs; the whole rank is
    *     one collect + O(iters·|E|) driver arithmetic — catalog-sized
    *     graphs shouldn't pay distributed iteration overhead.
    *  2. broadcast — the VERTEX SET fits `maxBroadcastBytes`: rank
    *     vector driver-resident, one broadcast-join job per iteration
    *     over the cached edges.
    *  3. distributed — the any-scale path: rank generations stay
    *     distributed, one lazy Catalyst plan.
    */
  def rank(spark: SparkSession, edges: DataFrame, iters: Int,
           scale: Long = 1000000000000L,
           maxBroadcastBytes: Long = 64L << 20,
           maxDriverEdgeBytes: Long = 64L << 20): DataFrame = {
    // persist BEFORE the probe actions, which fill the cache, so the
    // (possibly expensive — q93's edges are a distinct over lineitem)
    // edge derivation runs once
    val e = ScratchCache.register(
      edges.select(col("src").cast("long"), col("dst").cast("long")).persist())
    val nEdges = e.count()
    if (nEdges == 0L) {
      // an empty graph has an empty ranking — the regime loops' ≥1-node
      // contracts are for real graphs
      lastChoice = "empty"
      import spark.implicits._
      Seq.empty[(Long, Long)].toDF("id", "rank")
    } else if (nEdges * BytesPerEdge <= maxDriverEdgeBytes) {
      lastChoice = "driver-local"
      driverLocalLoop(spark, e, iters, scale)
    } else {
      val nd = nodeDegFrame(e)
      val n = nd.count()
      if (broadcastFits(n, maxBroadcastBytes)) {
        lastChoice = "broadcast"
        broadcastLoop(spark, e, nd, n, iters, scale)
      } else {
        lastChoice = "distributed"
        distributedLoop(spark, e, nd, n, iters, scale)
      }
    }
  }

  /** `edges`: distinct (src: BIGINT, dst: BIGINT). Returns (id, rank).
    * Any-scale path — rank generations stay distributed. */
  def rankInt(spark: SparkSession, edges: DataFrame, iters: Int,
              scale: Long = 1000000000000L): DataFrame = {
    val e = ScratchCache.register(
      edges.select(col("src").cast("long"), col("dst").cast("long")).persist())
    val nd = nodeDegFrame(e)
    distributedLoop(spark, e, nd, nd.count(), iters, scale)
  }

  /** [[rankInt]] when the VERTEX SET fits in a broadcast (the bounded-
    * vertex regime: bipartite catalog graphs, entity graphs — here ~21k
    * nodes vs ~600k edges). Bit-identical output to [[rankInt]]. */
  def rankIntBroadcast(spark: SparkSession, edges: DataFrame, iters: Int,
                       scale: Long = 1000000000000L): DataFrame = {
    val e = ScratchCache.register(
      edges.select(col("src").cast("long"), col("dst").cast("long")).persist())
    val nd = nodeDegFrame(e)
    broadcastLoop(spark, e, nd, nd.count(), iters, scale)
  }

  /** Driver-local regime: ONE collect of the distinct edge list (bounded
    * by `maxDriverEdgeBytes` — the same boundedness contract as
    * Triangles.graphMetrics' edge array), then pure array arithmetic.
    * Node ids resolve by binary search over the sorted distinct-id
    * array; contributions accumulate in a long array (order-free integer
    * sums), so the output is bit-identical to the distributed loops. */
  private def driverLocalLoop(spark: SparkSession, e: DataFrame,
                              iters: Int, scale: Long): DataFrame = {
    import spark.implicits._
    require(iters >= 1 && iters <= 20, "fixed small iteration count")
    val pairs = e.as[(Long, Long)].collect()
    val ids: Array[Long] = {
      val all = new Array[Long](pairs.length * 2)
      var i = 0
      while (i < pairs.length) {
        all(2 * i) = pairs(i)._1; all(2 * i + 1) = pairs(i)._2; i += 1
      }
      java.util.Arrays.sort(all)
      var m = 0; var k = 0
      while (k < all.length) {
        if (m == 0 || all(m - 1) != all(k)) { all(m) = all(k); m += 1 }
        k += 1
      }
      java.util.Arrays.copyOf(all, m)
    }
    val n = ids.length.toLong
    require(n > 0, "empty graph")
    def idx(v: Long): Int = java.util.Arrays.binarySearch(ids, v)
    val srcIdx = pairs.map(p => idx(p._1))
    val dstIdx = pairs.map(p => idx(p._2))
    val deg = new Array[Long](ids.length)
    srcIdx.foreach(deg(_) += 1L)
    val r0 = scale / n
    val base = 15L * r0 / 100
    var r = Array.fill(ids.length)(r0)
    for (_ <- 1 to iters) {
      val contrib = new Array[Long](ids.length)
      var i = 0
      while (i < srcIdx.length) {
        contrib(dstIdx(i)) += r(srcIdx(i)) / deg(srcIdx(i))
        i += 1
      }
      var dm = 0L
      i = 0
      while (i < ids.length) { if (deg(i) == 0L) dm += r(i); i += 1 }
      val next = new Array[Long](ids.length)
      i = 0
      while (i < ids.length) {
        next(i) = base + 85L * (contrib(i) + dm / n) / 100L
        i += 1
      }
      r = next
    }
    ids.indices.map(i => (ids(i), r(i))).toDF("id", "rank")
  }

  private def distributedLoop(spark: SparkSession, edges: DataFrame,
                              ndIn: DataFrame, n: Long, iters: Int,
                              scale: Long): DataFrame = {
    require(iters >= 1 && iters <= 20, "fixed small iteration count")
    require(n > 0, "empty graph")
    // co-partition the (cached) edges on src so every iteration's
    // contribution join is exchange-free against the hash(id) rank
    // generations; the repartitioned layout itself is what iterations
    // re-read, so it gets its own cache entry
    val e = ScratchCache.register(
      edges.repartition(col("src")).persist())
    // node frame CARRIES the (static) out-degree: the rank generation is
    // (id, d, r) throughout, so no per-iteration rank⋈degree join exists —
    // dangling (d = 0) / linked are mere filters on the cached generation,
    // and the recombination join contrib⋈nd is co-partitioned (both
    // hash(id), the node frame's own groupBy layout).
    val nd = ndIn
    val r0 = scale / n                     // integer base rank
    val base = 15L * r0 / 100              // (1-α) term, α = 85/100
    var r = nd.withColumn("r", lit(r0))
    for (_ <- 1 to iters) {
      val cur = ScratchCache.register(r.persist())
      // 1-row dangling mass, joined in lazily (broadcast, no action)
      val dang = cur.filter(col("d") === 0L)
        .agg(coalesce(sum(col("r")), lit(0L)).as("dm"))
      val linked = cur.filter(col("d") > 0L)
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

  /** PERSONALIZED PageRank (TrustRank, Gyöngyi et al. 2004): teleport
    * mass returns to the SEED set instead of all nodes — rank becomes
    * "closeness to anything trusted", the quality prior a crawl curation
    * pipeline seeds from vetted domains. Same integer fixed-point
    * contract as [[rank]] (every step exact, reduction-order-free,
    * oracle-replayable): seeds start with scale/|S| each, the (1−α) base
    * and the dangling redistribution go ONLY to seeds. Same
    * driver-local/distributed auto-switch as [[rank]] (bit-identical
    * either way — integer sums are order-free), so catalog-sized graphs
    * skip distributed iteration overhead (measured 4.2 → 1.7 s at
    * sf0.1). */
  def rankSeeded(spark: SparkSession, edges: DataFrame, seeds: DataFrame,
                 iters: Int, scale: Long = 1000000000000L,
                 maxDriverEdgeBytes: Long = 64L << 20): DataFrame = {
    require(iters >= 1 && iters <= 20, "fixed small iteration count")
    val e0 = ScratchCache.register(
      edges.select(col("src").cast("long"), col("dst").cast("long")).persist())
    val sd = ScratchCache.register(
      seeds.select(col("id").cast("long")).distinct().persist())
    val nS = sd.count()
    require(nS > 0, "empty seed set")
    val nEdges = e0.count()
    if (nEdges * BytesPerEdge <= maxDriverEdgeBytes) {
      lastChoice = "driver-local"
      return seededDriverLoop(spark, e0, sd, iters, scale)
    }
    lastChoice = "distributed"
    val e = ScratchCache.register(e0.repartition(col("src")).persist())
    val nd = ScratchCache.register(
      nodeDegFrame(e0)
        .join(sd.select(col("id"), lit(true).as("is_seed")), Seq("id"), "left")
        .select(col("id"), col("d"),
          coalesce(col("is_seed"), lit(false)).as("is_seed"))
        .persist())
    val r0s = scale / nS
    val base = 15L * r0s / 100
    var r = nd.withColumn("r",
      when(col("is_seed"), lit(r0s)).otherwise(lit(0L)))
    for (_ <- 1 to iters) {
      val cur = ScratchCache.register(r.persist())
      val dang = cur.filter(col("d") === 0L)
        .agg(coalesce(sum(col("r")), lit(0L)).as("dm"))
      val linked = cur.filter(col("d") > 0L)
      val contrib = e.join(linked, e("src") === linked("id"))
        .select(col("dst").as("id"), expr("r div d").as("share"))
        .groupBy("id").agg(sum(col("share")).as("c"))
      r = nd.join(contrib, Seq("id"), "left").crossJoin(broadcast(dang))
        .select(col("id"), col("d"), col("is_seed"),
          expr(s"(case when is_seed then ${base}L else 0L end) + " +
            s"85 * (coalesce(c, 0L) + (case when is_seed then dm div ${nS}L " +
            "else 0L end)) div 100").as("r"))
    }
    r.select(col("id"), col("r").as("rank"))
  }

  /** Driver-local seeded loop — [[driverLocalLoop]] with the teleport
    * vector restricted to the seed set. Bit-identical to the seeded
    * distributed loop (GraphSpec pins the toy trace; the q190 oracle
    * pins the full cascade). */
  private def seededDriverLoop(spark: SparkSession, e: DataFrame,
                               sd: DataFrame, iters: Int,
                               scale: Long): DataFrame = {
    import spark.implicits._
    val pairs = e.as[(Long, Long)].collect()
    val seedIds = sd.as[Long].collect().toSet
    // node universe = edge endpoints, matching the distributed loop and
    // the oracle's nodes CTE: a seed with no incident edges drops out
    val ids: Array[Long] =
      pairs.iterator.flatMap(p => Iterator(p._1, p._2)).toArray.distinct.sorted
    val n = ids.length.toLong
    require(n > 0, "empty graph")
    def idx(v: Long): Int = java.util.Arrays.binarySearch(ids, v)
    val srcIdx = pairs.map(p => idx(p._1))
    val dstIdx = pairs.map(p => idx(p._2))
    val isSeed = ids.map(seedIds.contains)
    val deg = new Array[Long](ids.length)
    srcIdx.foreach(deg(_) += 1L)
    val nS = seedIds.size.toLong
    val r0s = scale / nS
    val base = 15L * r0s / 100
    var r = Array.tabulate(ids.length)(i => if (isSeed(i)) r0s else 0L)
    for (_ <- 1 to iters) {
      val contrib = new Array[Long](ids.length)
      var i = 0
      while (i < srcIdx.length) {
        contrib(dstIdx(i)) += r(srcIdx(i)) / deg(srcIdx(i))
        i += 1
      }
      var dm = 0L
      i = 0
      while (i < ids.length) { if (deg(i) == 0L) dm += r(i); i += 1 }
      val next = new Array[Long](ids.length)
      i = 0
      while (i < ids.length) {
        next(i) = (if (isSeed(i)) base + 85L * (contrib(i) + dm / nS) / 100L
                   else 85L * contrib(i) / 100L)
        i += 1
      }
      r = next
    }
    ids.indices.map(i => (ids(i), r(i))).toDF("id", "rank")
  }

  /** Broadcast-regime loop: the rank vector lives on the driver between
    * iterations — the same boundedness contract as a broadcast join side
    * or the PQ codebooks — so each iteration is ONE distributed job: a
    * broadcast share-lookup join over the cached edges + a
    * partial-combined sum by dst, collecting |nodes| longs. No
    * per-iteration wide join, no rank generation caching, no
    * dangling-mass subjob (driver arithmetic). Integer sums are
    * reduction-order-free, so output is bit-identical to the
    * distributed loop. */
  private def broadcastLoop(spark: SparkSession, e: DataFrame,
                            nd: DataFrame, n: Long, iters: Int,
                            scale: Long): DataFrame = {
    import spark.implicits._
    require(iters >= 1 && iters <= 20, "fixed small iteration count")
    require(n > 0, "empty graph")
    val nodeDeg: Array[(Long, Long)] = nd.as[(Long, Long)].collect()
    val deg: Map[Long, Long] = nodeDeg.iterator.filter(_._2 > 0).toMap
    val ids: Array[Long] = nodeDeg.map(_._1).sorted
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
