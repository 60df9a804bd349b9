package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.{documents, events, lineitem}
import graft.functions.TextFunctions.roundp

/** Graph + ranking analytics: deterministic PageRank (q93), bounded
  * top-k-per-group (q94), per-group z-score outliers (q95).
  */
object GraphQueries {

  /** q93: PageRank over the supplier→part bipartite graph (distinct
    * lineitem (l_suppkey, l_partkey) edges; part ids offset into their
    * own namespace). 3 iterations of [[graft.ops.PageRank.rankInt]] —
    * integer fixed-point, so the DuckDB twin running the same `//`
    * cascade hash-matches exactly. Top 100 nodes. */
  def q93PageRank(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val edges = lineitem(s, d)
      .select($"l_suppkey".cast("long").as("src"),
        ($"l_partkey".cast("long") + 1000000L).as("dst"))
      .distinct()
    // PageRank.rank MEASURES the vertex count and picks the regime
    // itself (broadcast rank vector here: supplier+part ≈ 3% of the
    // edge count; past the byte threshold it flips to the fully
    // distributed rankInt — bit-identical either way)
    val r = graft.ops.PageRank.rank(s, edges, iters = 3)
      .orderBy(desc("rank"), $"id").limit(100)
    r
  }

  private def prIterSql(k: Int): String = {
    val p = if (k == 1) "r0" else s"r${k - 1}"
    s"""dang$k AS (SELECT coalesce(sum(r), 0) AS dm
       |  FROM $p LEFT JOIN deg USING (id) WHERE d IS NULL),
       |c$k AS (SELECT e.dst AS id, sum(p.r // deg.d) AS c
       |  FROM edges e JOIN $p p ON e.src = p.id JOIN deg ON deg.id = e.src
       |  GROUP BY e.dst),
       |r$k AS (SELECT nodes.id,
       |    (SELECT base FROM consts)
       |    + (85 * (coalesce(c$k.c, 0) + (SELECT dm FROM dang$k) // (SELECT n FROM nn))) // 100 AS r
       |  FROM nodes LEFT JOIN c$k USING (id))""".stripMargin
  }

  val q93Sql: String =
    s"""WITH edges AS (SELECT DISTINCT l_suppkey::BIGINT AS src,
       |    l_partkey::BIGINT + 1000000 AS dst FROM lineitem),
       |nodes AS (SELECT src AS id FROM edges UNION SELECT dst FROM edges),
       |deg AS (SELECT src AS id, count(*) AS d FROM edges GROUP BY 1),
       |nn AS (SELECT count(*) AS n FROM nodes),
       |consts AS (SELECT (15 * (1000000000000 // n)) // 100 AS base, n FROM nn),
       |r0 AS (SELECT id, (SELECT 1000000000000 // n FROM nn) AS r FROM nodes),
       |${prIterSql(1)},
       |${prIterSql(2)},
       |${prIterSql(3)}
       |SELECT id, CAST(r AS BIGINT) AS rank FROM r3 ORDER BY rank DESC, id LIMIT 100""".stripMargin

  /** q94: top-5 documents per source by n_chars (doc_id tiebreak) through
    * the bounded TopKAgg — partial combine ships ≤ k rows per group per
    * map task instead of windowing the whole corpus to one reducer per
    * group. Oracle = the row_number window form (orders identical). */
  def q94TopKPerGroup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    documents(s, d)
      .select($"source", $"doc_id", $"n_chars")
      .as[(String, Long, Long)]
      .groupByKey(_._1).mapValues(r => (r._2, r._3.toDouble))
      .agg(new graft.agg.TopKAgg(5).toColumn.name("top"))
      .flatMap { case (src, top) =>
        top.iterator.zipWithIndex.map { case ((id, ch), i) =>
          (src, (i + 1).toLong, id, ch.toLong)
        }
      }
      .toDF("source", "rank", "doc_id", "n_chars")
      .orderBy($"source", $"rank")
  }

  val q94Sql: String =
    """SELECT source, row_number() OVER w AS rank, doc_id, n_chars
      |FROM documents
      |WINDOW w AS (PARTITION BY source ORDER BY n_chars DESC, doc_id)
      |QUALIFY rank <= 5
      |ORDER BY source, rank""".stripMargin

  /** q95: per-group z-score outliers — events whose value sits more than
    * 3 population standard deviations from their event_type's mean. The
    * stats join is a broadcast (|event types| rows), so the detection is
    * one scan + one tiny aggregate: no window, no second shuffle of the
    * event stream. */
  def q95Outliers(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = events(s, d)
    val stats = ev.groupBy($"event_type")
      .agg(avg($"value").as("mu"), stddev_pop($"value").as("sd"),
        count(lit(1)).as("n"))
      .filter($"sd" > 0)
    ev.join(broadcast(stats), Seq("event_type"))
      .withColumn("z", ($"value" - $"mu") / $"sd")
      .filter(abs($"z") > 3.0)
      .select($"event_type", $"event_id", roundp($"z", 4).as("z"))
      .orderBy($"event_type", $"event_id")
  }

  val q95Sql: String =
    s"""WITH stats AS (
       |  SELECT event_type, avg(value) AS mu, stddev_pop(value) AS sd
       |  FROM events GROUP BY event_type HAVING stddev_pop(value) > 0)
       |SELECT e.event_type, e.event_id,
       |  ${DuckSql.roundpSql("(e.value - s.mu) / s.sd", 4)} AS z
       |FROM events e JOIN stats s USING (event_type)
       |WHERE abs((e.value - s.mu) / s.sd) > 3.0
       |ORDER BY event_type, event_id""".stripMargin

  /** q175: ROBUST outlier census — the median/MAD twin of q95 (mean/std
    * breaks down when the contamination itself inflates the std; MAD has
    * a 50% breakdown point). Per event_type: exact median, MAD (median
    * absolute deviation from the ROUNDED median), and how many events
    * sit beyond the 3σ-equivalent robust fence 3·1.4826·MAD. Both
    * medians are exact interpolated percentiles over values both engines
    * read from the same parquet; median and MAD are rounded to 6dp
    * BEFORE the fence comparison, so the flag inputs are bit-identical
    * cross-engine. Scale shape: two per-group exact-percentile
    * aggregations (the sort-based exact path — approx_percentile is the
    * deployment swap, same as q173) + one broadcast-join scan. */
  def q175RobustOutliers(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // both median rounds run through PercentileCut.groupedCuts (grouped
    // bounded radix selection): the builtin percentile over a
    // CONTINUOUS value domain buffers one value->count entry per
    // distinct value per group — ~|events| entries in one reduce task,
    // the 100 TB single-buffer hazard. The 2-column frame persists
    // (eagerly) because each radix level and the final census re-read it.
    val ev = graft.ops.ScratchCache.register(
      events(s, d).select($"event_type", $"value").persist())
    ev.count()
    val medMap = graft.ops.PercentileCut
      .groupedCuts(ev, "event_type", "value", Seq(0.5))
    val med = broadcast(medMap.toSeq.map { case (g, cs) => (g, cs.head) }
      .toDF("event_type", "m")
      .select($"event_type", roundp($"m", 6).as("med")))
    val dev = ev.join(med, Seq("event_type"))
      .select($"event_type", abs($"value" - $"med").as("adev"))
    val madMap = graft.ops.PercentileCut
      .groupedCuts(dev, "event_type", "adev", Seq(0.5))
    val mad = broadcast(madMap.toSeq.map { case (g, cs) => (g, cs.head) }
      .toDF("event_type", "d")
      .select($"event_type", roundp($"d", 6).as("mad")))
    val n = ev.groupBy($"event_type").agg(count(lit(1)).as("n"))
    ev.join(med, Seq("event_type"))
      .join(mad, Seq("event_type"))
      .join(broadcast(n), Seq("event_type"))
      .groupBy($"event_type")
      .agg(first($"n").as("n"), first($"med").as("med"),
        first($"mad").as("mad"),
        // 3·1.4826 pre-folded to ONE literal: 4.4478 parses to the same
        // double here and in DuckDB, where 3.0*1.4826 would be decimal math
        sum(when(abs($"value" - $"med") > lit(4.4478) * $"mad",
          1L).otherwise(0L)).as("n_outliers"))
      .select($"event_type", $"n", $"med", $"mad", $"n_outliers")
      .orderBy($"event_type")
  }

  val q175Sql: String =
    s"""WITH med AS (SELECT event_type,
       |    ${DuckSql.roundpSql("quantile_cont(value, 0.5)", 6)} AS med,
       |    count(*)::BIGINT AS n
       |  FROM events GROUP BY 1),
       |mad AS (SELECT e.event_type,
       |    ${DuckSql.roundpSql("quantile_cont(abs(e.value - m.med), 0.5)", 6)}
       |      AS mad
       |  FROM events e JOIN med m USING (event_type) GROUP BY 1)
       |SELECT e.event_type, any_value(m.n) AS n, any_value(m.med) AS med,
       |  any_value(d.mad) AS mad,
       |  sum(CASE WHEN abs(e.value - m.med) > 4.4478 * d.mad
       |    THEN 1 ELSE 0 END)::BIGINT AS n_outliers
       |FROM events e JOIN med m USING (event_type)
       |JOIN mad d ON d.event_type = e.event_type
       |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin

  /** Triangle count — see [[graft.ops.Triangles]] for the two physical
    * strategies (join-based any-scale vs broadcast-edge-set). */
  def triangleCount(e: DataFrame, broadcastEdges: Boolean = false): DataFrame =
    graft.ops.Triangles.count(e, broadcastEdges)

  /** q103: graph metrics of the part co-purchase graph — parts appearing
    * in the same order are linked (distinct pairs, oriented u<v; the pair
    * fan-out per order is C(k,2) with k bounded by order size, ≤7 in
    * TPC-H-shaped data — skew-safe by construction). Output rows: edge,
    * node, and triangle counts.
    *
    * Edge build: NO self-join — group each order's parts and emit packed
    * ordered pairs with the fused [[graft.functions.GraphFunctions
    * .packedPairs]] kernel (sort+dedup+pack in one codegen pass; the
    * interpreted `flatten(transform(slice(...)))` HOF form paid a lambda
    * dispatch per element). Dedup then shuffles ONE long per pair. At
    * 100×, orientation by DEGREE instead of id is the drop-in upgrade for
    * power-law graphs; co-order data is near-uniform so id orientation
    * suffices. */
  def q103Triangles(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // ~1.2M co-order edges ≈ 10 MB packed — Triangles.metrics MEASURES
    // the distinct edge count and picks the strategy itself: under the
    // byte threshold the edge list is driver-resident (one collect + a
    // map-only triangle pass, the only shuffle being the per-order pair
    // aggregation); past it, countViaJoins + distributed distinct/count
    // aggregations engage automatically (the any-scale plan).
    val packed = lineitem(s, d)
      .select($"l_orderkey".as("o"), $"l_partkey".cast("long").as("p"))
      .groupBy($"o").agg(collect_list($"p").as("ps"))
      .select(explode(graft.functions.GraphFunctions.packedPairs($"ps")).as("uv"))
      .as[Long]
    graft.ops.Triangles.metrics(packed).orderBy($"metric")
  }

  val q103Sql: String =
    """WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey::BIGINT AS p
      |  FROM lineitem),
      |e AS (SELECT DISTINCT x.p AS u, y.p AS v
      |  FROM op x JOIN op y ON x.o = y.o AND x.p < y.p),
      |ne AS (SELECT count(*) AS value FROM e),
      |nn AS (SELECT count(DISTINCT id) AS value
      |  FROM (SELECT u AS id FROM e UNION ALL SELECT v FROM e)),
      |tri AS (SELECT count(*) AS value
      |  FROM e e1 JOIN e e2 ON e1.v = e2.u
      |  JOIN e e3 ON e1.u = e3.u AND e2.v = e3.v)
      |SELECT 'edges' AS metric, value FROM ne
      |UNION ALL SELECT 'nodes', value FROM nn
      |UNION ALL SELECT 'triangles', value FROM tri
      |ORDER BY metric""".stripMargin

  // ---------------------------------------------------------------- q189

  /** q189: SEED-HOP distance — min hops from a trusted seed set over the
    * undirected supplier↔part graph (q93's edge set, both directions):
    * the TrustRank-style propagation primitive ("how far does this node
    * sit from anything we trust") that seeds quality priors and bounds
    * contamination blast radii. [[graft.ops.Bfs.distances]] runs
    * level-synchronous frontier expansion — (id, hop) state only, one
    * equi-join + one anti-join per level, never paths (the oracle's
    * recursive UNION dedups to the same state, which is the only reason
    * a CTE replay stays polynomial). Depth-capped at 4. */
  def q189SeedDistance(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val base = lineitem(s, d)
      .select($"l_suppkey".cast("long").as("src"),
        ($"l_partkey".cast("long") + 1000000L).as("dst"))
    val seeds = lineitem(s, d).filter($"l_suppkey" < 10)
      .select($"l_suppkey".cast("long").as("id")).distinct()
    // single-direction edges + undirected=true: the driver-local regime
    // reverses in the adjacency build (two ints), and the distributed
    // fallback materializes the reversed union only when it actually
    // runs; duplicate edges are absorbed by the regime's own distinct
    // (driver-local) or per-level frontier distinct (distributed)
    graft.ops.Bfs.auto(base, seeds, maxDepth = 4, undirected = true)
      .orderBy($"id")
  }

  val q189Sql: String =
    s"""WITH RECURSIVE e AS (SELECT DISTINCT l_suppkey::BIGINT AS src,
       |    l_partkey::BIGINT + 1000000 AS dst FROM lineitem),
       |ed AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
       |walk(id, hop) AS (
       |  SELECT DISTINCT l_suppkey::BIGINT, 0::BIGINT FROM lineitem
       |    WHERE l_suppkey < 10
       |  UNION
       |  SELECT ed.dst, w.hop + 1 FROM walk w JOIN ed ON ed.src = w.id
       |    WHERE w.hop < 4)
       |SELECT id, min(hop)::BIGINT AS hop FROM walk
       |GROUP BY id ORDER BY id""".stripMargin

  // ---------------------------------------------------------------- q190

  /** q190: PERSONALIZED PageRank (TrustRank) — q93's graph, but teleport
    * mass returns only to the trusted seed suppliers (q189's seed set):
    * rank becomes closeness-to-trust, the propagation prior a curation
    * pipeline uses to score unvetted sources from a vetted few. Same
    * integer fixed-point discipline as q93 (exact, order-free), so the
    * DuckDB twin replays the full seed-aware `//` cascade and
    * hash-matches bit-for-bit. Top 100. */
  def q190TrustRank(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val edges = lineitem(s, d)
      .select($"l_suppkey".cast("long").as("src"),
        ($"l_partkey".cast("long") + 1000000L).as("dst"))
      .distinct()
    val seeds = lineitem(s, d).filter($"l_suppkey" < 10)
      .select($"l_suppkey".cast("long").as("id")).distinct()
    // empty fact table → empty seed set: TrustRank over no seeds is an
    // empty ranking, not a contract violation (rankSeeded's ≥1-seed
    // require is for real seeded runs)
    if (seeds.isEmpty) return Seq.empty[(Long, Long)].toDF("id", "rank")
    graft.ops.PageRank.rankSeeded(s, edges, seeds, iters = 3)
      .orderBy(desc("rank"), $"id").limit(100)
  }

  private def pprIterSql(k: Int): String = {
    val p = if (k == 1) "r0" else s"r${k - 1}"
    s"""dang$k AS (SELECT coalesce(sum(r), 0) AS dm
       |  FROM $p LEFT JOIN deg USING (id) WHERE d IS NULL),
       |c$k AS (SELECT e.dst AS id, sum(p.r // deg.d) AS c
       |  FROM edges e JOIN $p p ON e.src = p.id JOIN deg ON deg.id = e.src
       |  GROUP BY e.dst),
       |r$k AS (SELECT nf.id, nf.is_seed,
       |    (CASE WHEN nf.is_seed THEN (SELECT base FROM consts) ELSE 0 END)
       |    + (85 * (coalesce(c$k.c, 0)
       |        + (CASE WHEN nf.is_seed
       |           THEN (SELECT dm FROM dang$k) // (SELECT s FROM ns)
       |           ELSE 0 END))) // 100 AS r
       |  FROM nf LEFT JOIN c$k USING (id))""".stripMargin
  }

  val q190Sql: String =
    s"""WITH edges AS (SELECT DISTINCT l_suppkey::BIGINT AS src,
       |    l_partkey::BIGINT + 1000000 AS dst FROM lineitem),
       |nodes AS (SELECT src AS id FROM edges UNION SELECT dst FROM edges),
       |deg AS (SELECT src AS id, count(*) AS d FROM edges GROUP BY 1),
       |seeds AS (SELECT DISTINCT l_suppkey::BIGINT AS id FROM lineitem
       |  WHERE l_suppkey < 10),
       |ns AS (SELECT count(*) AS s FROM seeds),
       |consts AS (SELECT (15 * (1000000000000 // s)) // 100 AS base FROM ns),
       |nf AS (SELECT nodes.id, seeds.id IS NOT NULL AS is_seed
       |  FROM nodes LEFT JOIN seeds USING (id)),
       |r0 AS (SELECT id, is_seed,
       |    CASE WHEN is_seed THEN (SELECT 1000000000000 // s FROM ns)
       |         ELSE 0 END AS r
       |  FROM nf),
       |${pprIterSql(1)},
       |${pprIterSql(2)},
       |${pprIterSql(3)}
       |SELECT id, CAST(r AS BIGINT) AS rank FROM r3
       |ORDER BY rank DESC, id LIMIT 100""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q190_trustrank"      -> (q190TrustRank _),
    "q189_seed_distance"  -> (q189SeedDistance _),
    "q93_pagerank"        -> (q93PageRank _),
    "q94_topk_per_group"  -> (q94TopKPerGroup _),
    "q95_outliers"        -> (q95Outliers _),
    "q175_robust_outliers" -> (q175RobustOutliers _),
    "q103_triangles"      -> (q103Triangles _),
  )

  val oracles: Map[String, String] = Map(
    "q190_trustrank"      -> q190Sql,
    "q189_seed_distance"  -> q189Sql,
    "q93_pagerank"        -> q93Sql,
    "q94_topk_per_group"  -> q94Sql,
    "q95_outliers"        -> q95Sql,
    "q175_robust_outliers" -> q175Sql,
    "q103_triangles"      -> q103Sql,
  )
}
