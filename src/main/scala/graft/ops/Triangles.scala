package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{array, coalesce, col, count => fcount, count_distinct, explode, lit, shiftrightunsigned, sum}

/** Triangle counting over an undirected edge list oriented low→high
  * (u < v on every row, deduplicated; ids in [0, 2³²) — the
  * [[PackedPair]] contract). Each triangle a<b<c is counted exactly once
  * via its unique orientation — the standard node-ordering trick.
  *
  * Two physical strategies, both exact:
  *
  *  - [[countViaJoins]] — e1(a,b) ⋈ e2(b,c) ⋈ e3(a,c) as hash equi-joins
  *    (SHUFFLE_HASH hinted: the wedge stream is 10-100× the edge list and
  *    must never be SORTED — Catalyst's default falls back to sort-merge
  *    past the broadcast threshold, which cost 33.7 s vs 1.7 s at sf0.1).
  *    The closing edge probes on ONE packed long so the join hits Spark's
  *    LongHashedRelation fast path. This is the any-scale plan: both
  *    joins shuffle on vertex/pair keys, nothing is collected.
  *
  *  - [[countViaBroadcastSet]] — when the edge list fits in a broadcast
  *    (the same precondition as broadcasting a join side; ~8 bytes/edge),
  *    ship ONE sorted long array of packed edges and stream the adjacency
  *    lists: each of the Σ C(outdeg,2) wedges is a binary search instead
  *    of a join-machinery probe, and the wedge stream never exists as
  *    rows at all. The driver holds the packed edge array exactly as a
  *    BroadcastExchange would — bounded by the broadcast precondition,
  *    not a scale leak.
  */
object Triangles {

  /** General join-based count; input columns (u, v). */
  def countViaJoins(e: DataFrame): DataFrame = {
    val e1 = e.select(col("u").as("a"), col("v").as("b"))
    val e2 = e.select(col("u").as("b"), col("v").as("c")).hint("SHUFFLE_HASH")
    val e3 = e.select(PackedPair.pack(col("u"), col("v")).as("uv"))
      .hint("SHUFFLE_HASH")
    e1.join(e2, "b")
      .join(e3, PackedPair.pack(col("a"), col("c")) === col("uv"))
      .agg(fcount(lit(1)).as("value"))
  }

  /** Broadcast-set count; input columns (u, v), edge list must fit in a
    * broadcast. ZERO extra shuffles: the broadcast carries the sorted
    * packed edges as a CSR adjacency (distinct-u index + offsets), and a
    * map-only pass over the edge partitions merge-intersects N(u) ∩ N(v)
    * per edge. Cost is Σ_edges (deg(u)+deg(v)) sequential longs — on
    * skewed graphs far below the Σ C(deg,2)·log|E| of wedge
    * enumeration + binary-search membership (hubs contribute deg, not
    * deg²), and every access pattern is a linear scan, not a random
    * probe. Orientation makes the intersection count exact: N(·) holds
    * only higher ids, so any common w closes u<v<w exactly once. */
  def countViaBroadcastSet(e: DataFrame): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val packed: Array[Long] = e
      .select(PackedPair.pack(col("u"), col("v")).as("uv")).as[Long]
      .collect()
    java.util.Arrays.sort(packed)
    // CSR over the sorted packed list: us(i) owns packed[starts(i), starts(i+1))
    val us = Array.newBuilder[Long]
    val starts = Array.newBuilder[Int]
    var i = 0
    var last = -1L
    while (i < packed.length) {
      val u = packed(i) >>> 32
      if (u != last) { us += u; starts += i; last = u }
      i += 1
    }
    starts += packed.length
    val bc = spark.sparkContext.broadcast((packed, us.result(), starts.result()))
    e.select(col("u"), col("v")).as[(Long, Long)]
      .mapPartitions { it =>
        val (es, uIdx, off) = bc.value
        var cnt = 0L
        it.foreach { case (u, v) =>
          val pu = java.util.Arrays.binarySearch(uIdx, u)
          val pv = java.util.Arrays.binarySearch(uIdx, v)
          if (pu >= 0 && pv >= 0) {
            var a = off(pu); val a1 = off(pu + 1)
            var b = off(pv); val b1 = off(pv + 1)
            while (a < a1 && b < b1) {
              val wa = es(a) & 0xffffffffL
              val wb = es(b) & 0xffffffffL
              if (wa < wb) a += 1
              else if (wb < wa) b += 1
              else { cnt += 1; a += 1; b += 1 }
            }
          }
        }
        Iterator.single(cnt)
      }
      .toDF("c")
      .agg(coalesce(sum(col("c")), lit(0L)).as("value"))
  }

  /** Strategy switch mirroring Spark's own broadcast-vs-shuffle choice. */
  def count(e: DataFrame, broadcastEdges: Boolean): DataFrame =
    if (broadcastEdges) countViaBroadcastSet(e) else countViaJoins(e)

  /** Last strategy [[metrics]] chose — observable by specs. */
  @volatile private[graft] var lastChoice: String = ""

  /** 8 bytes per packed edge on the driver/broadcast. */
  private[graft] def broadcastFits(nEdges: Long, maxBroadcastBytes: Long): Boolean =
    nEdges * 8L <= maxBroadcastBytes

  /** Auto-switching metrics entry: measures the PACKED stream length
    * (a count on the cache-filling scan — no extra aggregation job; the
    * count is a hard upper bound on the distinct edge count AND on the
    * driver collect payload, duplicates included, so the contract never
    * depends on the dedupe ratio) and picks [[graphMetrics]]
    * (driver/broadcast regime) when that bound fits `maxBroadcastBytes`,
    * else the fully distributed [[graphMetricsDistributed]] — the
    * human-judgment scale call made automatic, like
    * `autoBroadcastJoinThreshold`. (A stream whose duplicated length
    * exceeds the budget but whose distinct set would fit goes
    * distributed — conservative, still exact.) */
  def metrics(packed: org.apache.spark.sql.Dataset[Long],
              maxBroadcastBytes: Long = 64L << 20): DataFrame = {
    val spark = packed.sparkSession
    import spark.implicits._
    // normalize the single column's name (callers pack under any alias)
    val cached = ScratchCache.register(packed.toDF("value").as[Long].persist())
    val nPacked = cached.count()
    if (broadcastFits(nPacked, maxBroadcastBytes)) {
      lastChoice = "broadcast"
      graphMetrics(cached)
    } else {
      lastChoice = "distributed"
      graphMetricsDistributed(cached)
    }
  }

  /** Any-scale twin of [[graphMetrics]]: distributed distinct + count
    * aggregations for the edge/node metrics, [[countViaJoins]] for the
    * triangles — three shuffling jobs, nothing driver-resident. */
  def graphMetricsDistributed(
      packed: org.apache.spark.sql.Dataset[Long]): DataFrame = {
    val spark = packed.sparkSession
    val e = ScratchCache.register(packed.toDF("value").distinct()
      .select(shiftrightunsigned(col("value"), 32).as("u"),
        col("value").bitwiseAND(lit(0xffffffffL)).as("v"))
      .persist())
    val nEdges = e.count()
    val nNodes = e.select(explode(array(col("u"), col("v"))).as("id"))
      .agg(count_distinct(col("id")).as("n"))
      .head().getLong(0)
    import spark.implicits._
    Seq(("edges", nEdges), ("nodes", nNodes)).toDF("metric", "value")
      .union(countViaJoins(e)
        .select(lit("triangles").as("metric"), col("value")))
  }

  /** All three co-occurrence-graph metrics (edges, nodes, triangles) from
    * a packed u<v edge stream that may still carry duplicates — the
    * broadcast-precondition fast path behind q103.
    *
    * Under the broadcast strategy the packed edge list is driver-resident
    * anyway (that IS the broadcast payload), so running `distinct` +
    * count + countDistinct as three separate shuffling jobs first pays
    * three cluster round-trips for answers the driver array yields in
    * milliseconds: sort once, dedupe in place (edges metric = deduped
    * length), count distinct endpoints off the sorted array (nodes
    * metric), and keep ONLY the triangle intersection distributed — a
    * map-only pass over driver-sliced CSR ranges, no edge DataFrame, no
    * shuffle at all beyond the caller's pair aggregation.
    *
    * Scale contract: identical to [[countViaBroadcastSet]] — valid
    * exactly when the DISTINCT edge list fits in a broadcast. The
    * incoming stream may carry co-occurrence multiplicity well beyond
    * that, so each partition sorts and dedupes its slice BEFORE the
    * collect: the driver payload is bounded by
    * min(|stream|, nPartitions × |distinct edges|) ≈ |distinct edges|,
    * not by the raw multiset. Past the broadcast bound,
    * [[countViaJoins]] plus distributed distinct/count aggregations is
    * the any-scale plan. */
  def graphMetrics(packed: org.apache.spark.sql.Dataset[Long]): DataFrame = {
    val spark = packed.sparkSession
    import spark.implicits._
    val raw = packed.mapPartitions { it =>
      // partition-local sort+dedupe: collapses pair multiplicity where it
      // is produced, so the driver never sees the duplicated stream
      val a = it.toArray
      java.util.Arrays.sort(a)
      var m = 0
      var k = 0
      while (k < a.length) {
        if (m == 0 || a(m - 1) != a(k)) { a(m) = a(k); m += 1 }
        k += 1
      }
      java.util.Arrays.copyOf(a, m).iterator
    }.collect()
    java.util.Arrays.sort(raw)
    var n = 0
    var i = 0
    while (i < raw.length) { // in-place dedupe of the sorted array
      if (n == 0 || raw(n - 1) != raw(i)) { raw(n) = raw(i); n += 1 }
      i += 1
    }
    val es = java.util.Arrays.copyOf(raw, n)
    val nEdges = n.toLong
    // distinct endpoints: sources are distinct runs of the sorted packed
    // array; destinations need one more sort over the low halves
    val us = Array.newBuilder[Long]
    val starts = Array.newBuilder[Int]
    val vs = new Array[Long](n)
    var last = -1L
    i = 0
    while (i < n) {
      val u = es(i) >>> 32
      if (u != last) { us += u; starts += i; last = u }
      vs(i) = es(i) & 0xffffffffL
      i += 1
    }
    starts += n
    val uArr = us.result()
    val offs = starts.result()
    java.util.Arrays.sort(vs)
    var nNodes = uArr.length.toLong
    var j = 0 // count vs not already among the (sorted) us
    while (j < n) {
      if ((j == 0 || vs(j) != vs(j - 1)) &&
          java.util.Arrays.binarySearch(uArr, vs(j)) < 0) nNodes += 1
      j += 1
    }
    val bc = spark.sparkContext.broadcast((es, uArr, offs))
    val slices = math.max(1, spark.sparkContext.defaultParallelism)
    val per = (n + slices - 1) / math.max(1, slices)
    val tri = spark.range(0, slices.toLong).as[Long]
      .mapPartitions { it =>
        val (edges, uIdx, off) = bc.value
        var cnt = 0L
        it.foreach { s =>
          var k = (s * per).toInt
          val hi = math.min(edges.length, ((s + 1) * per).toInt)
          while (k < hi) { // merge-intersect N(u) ∩ N(v) for edge k
            val u = edges(k) >>> 32
            val v = edges(k) & 0xffffffffL
            val pu = java.util.Arrays.binarySearch(uIdx, u)
            val pv = java.util.Arrays.binarySearch(uIdx, v)
            if (pu >= 0 && pv >= 0) {
              var a = off(pu); val a1 = off(pu + 1)
              var b = off(pv); val b1 = off(pv + 1)
              while (a < a1 && b < b1) {
                val wa = edges(a) & 0xffffffffL
                val wb = edges(b) & 0xffffffffL
                if (wa < wb) a += 1
                else if (wb < wa) b += 1
                else { cnt += 1; a += 1; b += 1 }
              }
            }
            k += 1
          }
        }
        Iterator.single(cnt)
      }
      .toDF("c")
      .agg(coalesce(sum(col("c")), lit(0L)).as("value"))
      .select(lit("triangles").as("metric"), col("value"))
    spark.createDataFrame(Seq(("edges", nEdges), ("nodes", nNodes)))
      .toDF("metric", "value")
      .union(tri)
  }
}
