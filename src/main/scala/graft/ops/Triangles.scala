package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{coalesce, col, collect_list, count => fcount, lit, sort_array, sum}

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
    * broadcast. One shuffle (the adjacency groupBy), then a map-only pass. */
  def countViaBroadcastSet(e: DataFrame): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val packed: Array[Long] = e
      .select(PackedPair.pack(col("u"), col("v")).as("uv")).as[Long]
      .collect()
    java.util.Arrays.sort(packed)
    val bc = spark.sparkContext.broadcast(packed)
    e.groupBy(col("u")).agg(sort_array(collect_list(col("v"))).as("vs"))
      .select(col("vs")).as[Array[Long]]
      .mapPartitions { it =>
        val es = bc.value
        var cnt = 0L
        it.foreach { vs =>
          var i = 0
          while (i < vs.length - 1) {
            val hi = vs(i) << 32
            var j = i + 1
            while (j < vs.length) {
              if (java.util.Arrays.binarySearch(es, hi | vs(j)) >= 0) cnt += 1
              j += 1
            }
            i += 1
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
}
