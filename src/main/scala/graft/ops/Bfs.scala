package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Level-synchronous BFS over an edge table — min-hop distance from a
  * seed set, the primitive under TrustRank-style quality propagation
  * ("how far is this page/doc from the trusted seeds"), contamination
  * blast-radius walks, and entity-graph neighborhoods.
  *
  * Scale shape: each level is ONE hash equi-join (frontier ⋈ edges) plus
  * one anti-join against the visited set, and state is (id, hop) — the
  * FRONTIER, never paths (a path-enumerating walk is exponential in
  * depth; the oracle's recursive CTE stays polynomial only because its
  * UNION dedups the same (id, hop) state). Deterministic: first reach
  * wins via the anti-join, so ties need no ordering. Depth is bounded by
  * the caller; one isEmpty action per level gives early exit on
  * exhausted frontiers — ≤ maxDepth driver round-trips total, each
  * level's frontier persisted and released through [[ScratchCache]].
  */
object Bfs {

  /** Min-hop table (id, hop) for every node within `maxDepth` of `seeds`
    * over directed `edges(src, dst)` (pass both directions for an
    * undirected walk). Seeds are hop 0; a seed id absent from the edge
    * table still reports.
    *
    * The per-level frontier count (already paid as the early-exit probe)
    * picks the join regime: a frontier under `broadcastRows` broadcasts
    * into a map-side join — the edge table never shuffles — and a larger
    * one falls back to a shuffled hash join (the PageRank/Triangles
    * auto-regime pattern: the scale-sensitive choice is measured, not
    * assumed). */
  def distances(edges: DataFrame, seeds: DataFrame, maxDepth: Int,
                broadcastRows: Long = 2000000L): DataFrame = {
    require(maxDepth >= 0)
    // every level joins the edge table; without a persist the edge
    // lineage (often a distinct over a fact scan) recomputes 2x per
    // level (measured at sf0.1 on q189's 1.1M edges)
    val e = ScratchCache.register(
      edges.select(col("src"), col("dst")).persist())
    // only the per-level frontiers persist; the visited view stays a
    // LAZY union of those cached frames (persisting each union costs a
    // cache-fill per level that the final read then re-pays — measured
    // 1.5 s of the 4.4 s q189 total)
    val levels = scala.collection.mutable.ArrayBuffer(
      ScratchCache.register(
        seeds.select(col("id"), lit(0L).as("hop")).distinct().persist()))
    def visited: DataFrame = levels.reduce(_ unionByName _)
    var frontier = levels.head
    // the early-exit probe doubles as the regime input
    var fcount = frontier.count()
    var depth = 0
    var done = maxDepth == 0
    while (!done) {
      // rename before joining: after round 1 the frontier's lineage
      // includes the edge table, so attribute-id resolution is ambiguous
      val fr = frontier.select(col("id").as("fid"))
      val joined =
        if (fcount > broadcastRows)
          e.hint("SHUFFLE_HASH").join(fr, col("fid") === col("src"))
        else e.join(broadcast(fr), col("fid") === col("src"))
      val next = ScratchCache.register(
        joined.select(col("dst").as("id")).distinct()
          .join(visited, Seq("id"), "left_anti")
          .select(col("id"), lit(depth + 1L).as("hop"))
          .persist())
      depth += 1
      fcount = next.count()
      if (fcount == 0L || depth >= maxDepth) done = true
      levels += next
      frontier = next
    }
    visited
  }

  /** Which regime [[auto]] picked last — spec-observable, mirroring
    * [[PageRank.lastChoice]]. */
  @volatile var lastChoice: String = ""

  /** Driver bytes per collected distinct edge under the driver-local
    * regime — WORKING footprint (boxed Tuple2 collect + adjacency
    * arrays), the [[PageRank.BytesPerEdge]] accounting. */
  private val BytesPerEdge = 64L

  /** Regime auto-switch (the [[PageRank.rank]] ladder): when the edge
    * list fits `maxDriverEdgeBytes` (probed by a raw count on the
    * persisted edge frame — an overestimate of the distinct count, so
    * the switch errs toward the distributed path), the walk runs
    * DRIVER-LOCAL: one distinct+collect, O(|E|) in-memory BFS, zero
    * per-level jobs — catalog-sized graphs shouldn't pay 4 levels of
    * distributed join overhead (measured 3.3 s → ~1.3 s on q189 at
    * sf0.1; a fused one-job Catalyst variant was also measured and is
    * NOT faster — 3.8 s — because the per-level distincts dominate, not
    * job count). Past the budget: [[distances]], whose per-level count
    * keeps early exit and picks broadcast vs shuffle per frontier.
    * Exact min-hop is reduction-order-free, so both regimes are
    * bit-identical (BfsSpec pins them equal on graph fixtures).
    *
    * `edges` is directed; pass `undirected = true` to walk both ways
    * (cheaper than materializing the reversed union when the
    * driver-local regime wins — the reversal is two ints in the
    * adjacency build). */
  def auto(edges: DataFrame, seeds: DataFrame, maxDepth: Int,
           undirected: Boolean = false,
           broadcastRows: Long = 2000000L,
           maxDriverEdgeBytes: Long = 64L << 20): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val e0 = edges.select(col("src").cast("long"), col("dst").cast("long"))
    // probe + load in ONE bounded action: collect at most cap+1 rows
    // (memory bounded by the budget either way); overflow ⇒ the big-graph
    // path, and the ≤cap prefix scanned here is noise at that scale. A
    // separate count() probe would pay a full extra scan job. RAW rows,
    // no distinct: duplicate edges only duplicate adjacency entries the
    // BFS hop-check absorbs (the distinct's |E| shuffle measured 0.4 s
    // of q189's 1.8 s)
    val cap = (maxDriverEdgeBytes / BytesPerEdge).min(Int.MaxValue - 1L).toInt
    val probe = e0.limit(cap + 1).as[(Long, Long)].collect()
    if (probe.length <= cap) {
      lastChoice = "driver-local"
      val seedIds = seeds.select(col("id").cast("long")).distinct()
        .as[Long].collect()
      driverLocal(spark, probe, seedIds, maxDepth, undirected)
    } else {
      lastChoice = "per-level"
      val e = ScratchCache.register(e0.persist())
      val dir =
        if (undirected)
          e.unionByName(e.select(col("dst").as("src"), col("src").as("dst")))
        else e
      distances(dir, seeds, maxDepth, broadcastRows)
    }
  }

  /** In-memory exact BFS over a collected edge list — the driver-local
    * regime's compute. O(|E| + |V|·depth); adjacency is primitive long
    * arrays, visited is the hop map itself. */
  private def driverLocal(spark: org.apache.spark.sql.SparkSession,
                          pairs: Array[(Long, Long)], seeds: Array[Long],
                          maxDepth: Int, undirected: Boolean): DataFrame = {
    import scala.collection.mutable
    val adjB = mutable.HashMap.empty[Long, mutable.ArrayBuilder.ofLong]
    def add(a: Long, b: Long): Unit =
      adjB.getOrElseUpdate(a, new mutable.ArrayBuilder.ofLong) += b
    pairs.foreach { case (a, b) => add(a, b); if (undirected) add(b, a) }
    val adj: Map[Long, Array[Long]] =
      adjB.iterator.map { case (k, v) => k -> v.result() }.toMap
    val hop = mutable.HashMap.empty[Long, Long]
    var frontier: Array[Long] = seeds.distinct
    frontier.foreach(hop(_) = 0L)
    var d = 0L
    while (d < maxDepth && frontier.nonEmpty) {
      val next = new mutable.ArrayBuilder.ofLong
      for (u <- frontier; vs <- adj.get(u); v <- vs)
        if (!hop.contains(v)) { hop(v) = d + 1L; next += v }
      frontier = next.result()
      d += 1L
    }
    import spark.implicits._
    hop.toSeq.toDF("id", "hop")
  }

  /** Same contract as [[distances]] but composed as ONE lazy plan with
    * no per-level actions: each level's distinct is an Exchange that
    * Spark's ReusedExchange dedupes across its consumers (next frontier
    * + every later anti-join), so the whole walk is a single job. For
    * SMALL fixed depths this trades `distances`'s ~4 jobs/level of
    * fixed overhead for one submission (measured ~3x at sf0.1); it
    * loses early exit and the per-level join-regime switch, so prefer
    * [[distances]] when depth is large or frontiers can outgrow a
    * broadcast. */
  def distancesFused(edges: DataFrame, seeds: DataFrame,
                     maxDepth: Int): DataFrame = {
    require(maxDepth >= 0)
    val e = edges.select(col("src"), col("dst"))
    var visited = seeds.select(col("id"), lit(0L).as("hop")).distinct()
    var frontier = visited
    for (depth <- 1 to maxDepth) {
      val fr = frontier.select(col("id").as("fid"))
      val next = e.join(broadcast(fr), col("fid") === col("src"))
        .select(col("dst").as("id")).distinct()
        .join(broadcast(visited), Seq("id"), "left_anti")
        .select(col("id"), lit(depth.toLong).as("hop"))
      visited = visited.unionByName(next)
      frontier = next
    }
    visited
  }
}
