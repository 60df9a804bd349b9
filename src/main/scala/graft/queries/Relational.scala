package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Core relational operator coverage (SURVEY §2.2-§2.6) expressed as
  * oracle-checkable queries over the driver's TPC-H-ish tables.
  *
  * Scale notes (100 TB design stance):
  *  - every dimension-side join is explicitly `broadcast()` (tile-grid-style
  *    dims in the reference are ≤19k rows — SURVEY J1/J2); fact-fact joins
  *    rely on shuffle hash/sort-merge + AQE.
  *  - all aggregates are algebraic (partial+final map-side combine) except
  *    where the reference itself is holistic (median, §2.4 A4).
  *  - filters/projections stay on base columns so parquet gets
  *    PushedFilters + pruned ReadSchema.
  *
  * Double-typed outputs are rounded to 2dp on BOTH sides (data has 2dp, so
  * true sums sit 0.005 away from any rounding boundary — engine-order float
  * error ~1e-7 cannot flip the rounded value).
  */
object Relational {
  import graft.Tables.{lineitem, orders, customer, supplier, nation, region, part}

  /** Q1-style pricing summary: A2 groupBy + algebraic aggs (SURVEY A2/A3/F9,
    * reference groupby at flyte/build.py:37-42). */
  def q01PricingSummary(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    lineitem(s, d)
      .filter($"l_shipdate" <= to_timestamp(lit("1998-09-02")))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        QueryUtil.safeSum($"l_quantity", 2).as("sum_qty"),
        QueryUtil.safeSum($"l_extendedprice", 2).as("sum_base_price"),
        QueryUtil.safeSum($"l_extendedprice" * (lit(1.0) - $"l_discount"), 2).as("sum_disc_price"),
        QueryUtil.safeAvg($"l_quantity", 2).as("avg_qty"),
        QueryUtil.safeAvg($"l_discount", 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val q01Sql: String =
    s"""SELECT l_returnflag, l_linestatus,
      |  ${QueryUtil.safeSumSql("l_quantity", 2)} AS sum_qty,
      |  ${QueryUtil.safeSumSql("l_extendedprice", 2)} AS sum_base_price,
      |  ${QueryUtil.safeSumSql("l_extendedprice * (1.0 - l_discount)", 2)} AS sum_disc_price,
      |  ${QueryUtil.safeAvgSql("l_quantity", 2)} AS avg_qty,
      |  ${QueryUtil.safeAvgSql("l_discount", 4)} AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Projection + filter pushdown (SURVEY P1/P2): predicate and column set
    * must reach the parquet scan (PushedFilters / pruned ReadSchema). */
  def q02FilterProject(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    lineitem(s, d)
      .filter($"l_shipdate" >= to_timestamp(lit("1995-01-01")) &&
              $"l_shipdate" <  to_timestamp(lit("1995-07-01")) &&
              $"l_quantity" > 45.0)
      .select($"l_orderkey", $"l_linenumber", $"l_quantity",
              round($"l_extendedprice", 2).as("price"))
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  val q02Sql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity,
      |  round(l_extendedprice, 2) AS price
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1995-01-01'
      |  AND l_shipdate < TIMESTAMP '1995-07-01' AND l_quantity > 45.0
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** Broadcast dim join chain (SURVEY J2: key-lookup joins are always
    * broadcast — dims here play the 19k-row tile grid's role). */
  def q03BroadcastJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    orders(s, d)
      .join(broadcast(customer(s, d)), $"o_custkey" === $"c_custkey")
      .join(broadcast(nation(s, d)), $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(QueryUtil.safeSum($"o_totalprice", 2).as("revenue"),
           count(lit(1)).as("n_orders"))
      .orderBy($"n_name")
  }

  val q03Sql: String =
    s"""SELECT n_name, ${QueryUtil.safeSumSql("o_totalprice", 2)} AS revenue,
      |  count(*) AS n_orders
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** Existence anti-join — the reference's core incremental-compute pattern
    * (SURVEY J3, scenes.py:115-138): rows whose counterpart does NOT exist. */
  def q04AntiJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    customer(s, d)
      .join(orders(s, d).filter($"o_totalprice" > 300000.0),
            $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey", $"c_name")
      .orderBy($"c_custkey")
  }

  val q04Sql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |  WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
      |ORDER BY c_custkey""".stripMargin

  /** Semi-join (SURVEY J1 shape: keep dims that intersect the fact set). */
  def q05SemiJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    supplier(s, d)
      .join(lineitem(s, d).filter($"l_shipdate" >= to_timestamp(lit("1998-01-01"))),
            $"s_suppkey" === $"l_suppkey", "left_semi")
      .select($"s_suppkey", $"s_name")
      .orderBy($"s_suppkey")
  }

  val q05Sql: String =
    """SELECT s_suppkey, s_name FROM supplier
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |  WHERE l_suppkey = s_suppkey AND l_shipdate >= TIMESTAMP '1998-01-01')
      |ORDER BY s_suppkey""".stripMargin

  /** Cross join (SURVEY J4: tiles × snapped-times enumeration). */
  def q06CrossJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    region(s, d).crossJoin(nation(s, d))
      .select($"r_name", $"n_name")
      .orderBy($"r_name", $"n_name")
  }

  val q06Sql: String =
    "SELECT r_name, n_name FROM region CROSS JOIN nation ORDER BY r_name, n_name"

  /** Interval/range-membership join (SURVEY J6): generated band dim,
    * broadcast nested-loop on the range predicate — dim side is tiny by
    * construction, matching the reference's period-window membership. */
  def q07RangeJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val bands = s.range(0, 25).toDF("band")
      .select($"band",
        ($"band" * 3000.0).as("lo"),
        (($"band" + 1) * 3000.0).as("hi"))
    lineitem(s, d)
      .join(broadcast(bands),
            $"l_extendedprice" >= $"lo" && $"l_extendedprice" < $"hi")
      .groupBy($"band")
      .agg(count(lit(1)).as("n"), QueryUtil.safeSum($"l_quantity", 2).as("qty"))
      .orderBy($"band")
  }

  val q07Sql: String =
    s"""SELECT band, count(*) AS n, ${QueryUtil.safeSumSql("l_quantity", 2)} AS qty
      |FROM (SELECT range AS band, range * 3000.0 AS lo,
      |             (range + 1) * 3000.0 AS hi FROM range(0, 25)) b
      |JOIN lineitem ON l_extendedprice >= lo AND l_extendedprice < hi
      |GROUP BY band ORDER BY band""".stripMargin

  /** Analytic window functions (row_number / lag / running sum — SURVEY F8's
    * cumulative-offset idiom done relationally). */
  def q08WindowFuncs(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
    orders(s, d)
      .select($"o_custkey", $"o_orderkey",
        row_number().over(w).as("rn"),
        round(coalesce(lag($"o_totalprice", 1).over(w), lit(0.0)), 2).as("prev_price"),
        // decimal running sum: exact regardless of the engine's frame
        // accumulation strategy (incremental vs segment tree)
        (round(sum($"o_totalprice".cast("decimal(28,6)"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double") * 100) / 100)
          .as("running_total"))
      .orderBy($"o_custkey", $"rn")
  }

  val q08Sql: String =
    """SELECT o_custkey, o_orderkey,
      |  row_number() OVER w AS rn,
      |  round(coalesce(lag(o_totalprice, 1) OVER w, 0.0), 2) AS prev_price,
      |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) OVER (PARTITION BY o_custkey
      |    ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) * 100) / 100 AS running_total
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, rn""".stripMargin

  /** Distinct by key (SURVEY A5/A6: drop_duplicates / unique()). */
  def q09Distinct(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    customer(s, d)
      .select($"c_mktsegment", $"c_nationkey".cast("bigint").as("c_nationkey"))
      .distinct()
      .orderBy($"c_mktsegment", $"c_nationkey")
  }

  val q09Sql: String =
    """SELECT DISTINCT c_mktsegment, CAST(c_nationkey AS BIGINT) AS c_nationkey
      |FROM customer ORDER BY c_mktsegment, c_nationkey""".stripMargin

  /** Union-all + aggregate (SURVEY O3: pd.concat idiom). */
  def q10Union(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val c = customer(s, d).select($"c_nationkey".cast("bigint").as("nkey"))
    val p = supplier(s, d).select($"s_nationkey".cast("bigint").as("nkey"))
    c.unionByName(p).groupBy($"nkey").agg(count(lit(1)).as("n")).orderBy($"nkey")
  }

  val q10Sql: String =
    """SELECT nkey, count(*) AS n FROM (
      |  SELECT CAST(c_nationkey AS BIGINT) AS nkey FROM customer
      |  UNION ALL SELECT CAST(s_nationkey AS BIGINT) FROM supplier) u
      |GROUP BY nkey ORDER BY nkey""".stripMargin

  /** Top-k with deterministic tie-break (SURVEY §2.6; TakeOrderedAndProject
    * physical op — no full sort at scale). */
  def q11TopK(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    orders(s, d)
      .select($"o_orderkey", round($"o_totalprice", 2).as("price"))
      .orderBy($"price".desc, $"o_orderkey")
      .limit(10)
  }

  val q11Sql: String =
    """SELECT o_orderkey, round(o_totalprice, 2) AS price FROM orders
      |ORDER BY price DESC, o_orderkey LIMIT 10""".stripMargin

  /** First/min/max-of-group (SURVEY O5: unique()[0] + assert-single). */
  def q12FirstOfGroup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    orders(s, d)
      .groupBy($"o_custkey")
      .agg(min($"o_orderdate").cast("date").as("first_order"),
           max($"o_orderdate").cast("date").as("last_order"),
           count(lit(1)).as("n_orders"))
      .orderBy($"o_custkey")
  }

  val q12Sql: String =
    """SELECT o_custkey, CAST(min(o_orderdate) AS DATE) AS first_order,
      |  CAST(max(o_orderdate) AS DATE) AS last_order, count(*) AS n_orders
      |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin

  /** q70: hierarchical rollup — (source, lang) totals plus per-source and
    * grand-total superaggregates in ONE pass (Spark `rollup` = the Expand
    * operator feeding a single hash aggregation, not N passes).
    * `grouping_id` disambiguates real NULLs from rollup rows. */
  def q70Rollup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    graft.Tables.documents(s, d)
      .rollup($"source", $"lang")
      .agg(grouping_id().cast("long").as("gid"), // must live IN the agg list
        count(lit(1)).as("n_docs"), sum($"n_chars").as("chars"))
      .select(coalesce($"source", lit("ALL")).as("source"),
        coalesce($"lang", lit("ALL")).as("lang"), $"gid", $"n_docs", $"chars")
      .orderBy($"gid", $"source", $"lang")
  }

  val q70Sql: String =
    """SELECT coalesce(source, 'ALL') AS source, coalesce(lang, 'ALL') AS lang,
      |  CAST(grouping(source) * 2 + grouping(lang) AS BIGINT) AS gid,
      |  count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS chars
      |FROM documents GROUP BY ROLLUP (source, lang)
      |ORDER BY gid, source, lang""".stripMargin

  /** q71: pivot — language mix per source as columns (conditional
    * aggregation under the hood: one scan, one aggregation; the explicit
    * value list keeps the schema static, which is what a 100 TB pivot
    * needs — value discovery would be a separate distinct pass). */
  def q71Pivot(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    graft.Tables.documents(s, d)
      .groupBy($"source")
      .pivot("lang", Seq("en", "de", "es", "fr", "zh"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy($"source")
  }

  val q71Sql: String =
    """SELECT source,
      |  CAST(count(*) FILTER (lang = 'en') AS BIGINT) AS en,
      |  CAST(count(*) FILTER (lang = 'de') AS BIGINT) AS de,
      |  CAST(count(*) FILTER (lang = 'es') AS BIGINT) AS es,
      |  CAST(count(*) FILTER (lang = 'fr') AS BIGINT) AS fr,
      |  CAST(count(*) FILTER (lang = 'zh') AS BIGINT) AS zh
      |FROM documents GROUP BY source ORDER BY source""".stripMargin

  /** q76: CUBE — all 2³ grouping-set combinations of (returnflag,
    * linestatus, ship-year) in one pass. Like q70's rollup this compiles
    * to a single Expand→hash-aggregate, so the cost is one scan + an
    * 8×-expanded shuffle of PARTIAL aggregates (map-side combine first) —
    * not 8 scans. `grouping_id` separates superaggregate rows from real
    * NULL groups, which the ALL-placeholder rendering then keys off. */
  def q76Cube(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // NOT fanned out: a redistribution shuffle of 600k fact rows costs
    // more than the single-task Expand it would parallelize (measured
    // 1.21 s fanned vs 0.65 s direct at sf0.1 — row serialization
    // dominates when per-row downstream work is one Expand + hash-agg
    // probe; contrast q58/q73, where explode/levenshtein per row is
    // 100×). At scale the scan's own splits parallelize this for free.
    lineitem(s, d)
      .withColumn("ship_year", year($"l_shipdate").cast("long"))
      .cube($"l_returnflag", $"l_linestatus", $"ship_year")
      .agg(grouping_id().cast("long").as("gid"),
        count(lit(1)).as("n"),
        QueryUtil.safeSum($"l_quantity", 2).as("sum_qty"))
      .select(coalesce($"l_returnflag", lit("ALL")).as("rf"),
        coalesce($"l_linestatus", lit("ALL")).as("ls"),
        coalesce($"ship_year", lit(-1L)).as("ship_year"),
        $"gid", $"n", $"sum_qty")
      .orderBy($"gid", $"rf", $"ls", $"ship_year")
  }

  val q76Sql: String =
    s"""SELECT coalesce(l_returnflag, 'ALL') AS rf,
      |  coalesce(l_linestatus, 'ALL') AS ls,
      |  coalesce(CAST(year(l_shipdate) AS BIGINT), -1) AS ship_year,
      |  CAST(grouping(l_returnflag) * 4 + grouping(l_linestatus) * 2 +
      |    grouping(year(l_shipdate)) AS BIGINT) AS gid,
      |  count(*) AS n, ${QueryUtil.safeSumSql("l_quantity", 2)} AS sum_qty
      |FROM lineitem
      |GROUP BY CUBE (l_returnflag, l_linestatus, year(l_shipdate))
      |ORDER BY gid, rf, ls, ship_year""".stripMargin

  /** q87: correlated scalar subquery — orders priced over 1.5× their own
    * customer's average. Written AS a correlated subquery (not a manual
    * join) so Catalyst's decorrelation does the rewrite: the optimized
    * plan is one aggregate on o_custkey joined back to the fact —
    * verified in PlanAuditSpec-style by the absence of any per-row
    * subquery execution. The comparison threshold is rounded to 4dp on
    * both engines: a 2dp price can sit within float-sum noise of the
    * unrounded 1.5·avg boundary. */
  def q87CorrelatedSubquery(s: SparkSession, d: String): DataFrame = {
    orders(s, d).createOrReplaceTempView("orders_q87")
    s.sql(
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price
        |FROM orders_q87 o
        |WHERE o_totalprice > (
        |  SELECT round(1.5 * avg(i.o_totalprice) * 10000) / 10000
        |  FROM orders_q87 i WHERE i.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin)
  }

  val q87Sql: String =
    """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price
      |FROM orders o
      |WHERE o_totalprice > (
      |  SELECT round(1.5 * avg(i.o_totalprice) * 10000) / 10000
      |  FROM orders i WHERE i.o_custkey = o.o_custkey)
      |ORDER BY o_orderkey""".stripMargin

  /** q88: RANGE-framed window — 30-day trailing revenue per customer.
    * Unlike q08's ROWS frames, the frame is VALUE-based (all orders
    * within 29 days before the current one), which is also what makes it
    * tie-safe: same-day orders share one frame regardless of row order.
    * One shuffle on o_custkey; the in-partition range scan is the
    * standard streaming-frame sort pass. */
  def q88RangeFrame(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    // o_orderdate arrives TIMESTAMP_NTZ; session TZ is UTC so the cast is
    // identity on the instant (matches the oracle's CAST AS TIMESTAMP)
    val day = (unix_micros($"o_orderdate".cast("timestamp")) /
      lit(86400000000L)).cast("long")
    val w = Window.partitionBy($"o_custkey").orderBy($"day")
      .rangeBetween(-29, Window.currentRow)
    orders(s, d)
      .select($"o_orderkey", $"o_custkey", day.as("day"),
        $"o_totalprice")
      .withColumn("trail30",
        round(sum($"o_totalprice".cast("decimal(28,6)")).over(w)
          .cast("double") * 100) / 100)
      .select($"o_orderkey", $"o_custkey", $"day",
        round($"o_totalprice", 2).as("price"), $"trail30")
      .orderBy($"o_orderkey")
  }

  val q88Sql: String =
    """WITH o AS (SELECT o_orderkey, o_custkey,
      |    epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000 AS day,
      |    o_totalprice FROM orders)
      |SELECT o_orderkey, o_custkey, day, round(o_totalprice, 2) AS price,
      |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) OVER (PARTITION BY o_custkey ORDER BY day
      |    RANGE BETWEEN 29 PRECEDING AND CURRENT ROW) AS DOUBLE) * 100) / 100 AS trail30
      |FROM o ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q193

  /** q193: six-table STAR join (TPC-H Q5's local-supplier revenue) —
    * the join-ordering/broadcast showcase: region→nation→supplier are
    * descending-size dims Catalyst broadcasts, customer⋈orders⋈lineitem
    * is the fact spine, and the c_nationkey = s_nationkey "local
    * supplier" constraint closes the star into a cycle the optimizer
    * must place correctly. Declarative — no hints except broadcast on
    * the two smallest dims; AQE handles the rest. Revenue sums in exact
    * DECIMAL (safeSum) so reduction order can't flip the rounded
    * digit. */
  def q193StarJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val li = lineitem(s, d)
    val o = orders(s, d)
      .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1997-01-01").cast("timestamp"))
    val c = customer(s, d)
    val su = supplier(s, d)
    val n = nation(s, d)
    val r = region(s, d).filter($"r_name" === "ASIA")
    li.join(o, $"l_orderkey" === $"o_orderkey")
      .join(c, $"o_custkey" === $"c_custkey")
      .join(su, $"l_suppkey" === $"s_suppkey" &&
        $"c_nationkey" === $"s_nationkey")
      .join(broadcast(n), $"s_nationkey" === $"n_nationkey")
      .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
      .groupBy($"n_name")
      .agg(QueryUtil.safeSum($"l_extendedprice" * (lit(1.0) - $"l_discount"), 2)
        .as("revenue"), count(lit(1)).as("n_items"))
      .orderBy($"revenue".desc, $"n_name")
  }

  val q193Sql: String =
    s"""SELECT n_name,
       |  ${QueryUtil.safeSumSql("l_extendedprice * (1.0 - l_discount)", 2)}
       |    AS revenue,
       |  count(*)::BIGINT AS n_items
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |  AND c_nationkey = s_nationkey
       |JOIN nation ON s_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |WHERE r_name = 'ASIA'
       |  AND o_orderdate >= TIMESTAMP '1996-01-01'
       |  AND o_orderdate < TIMESTAMP '1997-01-01'
       |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin

  // ---------------------------------------------------------------- q194

  /** q194: customer-distribution (TPC-H Q13) — the null-preserving
    * double aggregation: customers LEFT OUTER JOIN their qualifying
    * orders (zero-order customers MUST survive as count 0 — an inner
    * join silently drops the most interesting bucket), per-customer
    * order counts, then the histogram of those counts. The two
    * aggregations chain on different keys, so the plan is two hash
    * shuffles; the outer join keeps the fact side from filtering the
    * dim. */
  def q194CustDist(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val o = orders(s, d).filter($"o_orderpriority" =!= "1-URGENT")
    customer(s, d)
      .join(o, $"c_custkey" === $"o_custkey", "left_outer")
      .groupBy($"c_custkey")
      .agg(count($"o_orderkey").as("c_count")) // count(col) skips nulls
      .groupBy($"c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy($"custdist".desc, $"c_count".desc)
  }

  val q194Sql: String =
    """SELECT c_count, count(*)::BIGINT AS custdist
      |FROM (SELECT c_custkey, count(o_orderkey)::BIGINT AS c_count
      |  FROM customer LEFT OUTER JOIN orders
      |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      |  GROUP BY c_custkey) c_orders
      |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin

  // ---------------------------------------------------------------- q195

  /** q195: blame-the-supplier (TPC-H Q21's shape adapted to this schema:
    * returned lines stand in for late receipts) — orders involving ≥2
    * suppliers where EXACTLY ONE supplier had a returned line; that
    * supplier takes the blame. The textbook form is two correlated
    * self-joins on the fact table (EXISTS another-supplier /
    * NOT EXISTS another-flagged-supplier — the oracle runs exactly
    * that); at 100 TB each self-join re-shuffles the fact, so the
    * engine instead folds BOTH existence tests into a per-order
    * aggregation (distinct-supplier count, distinct-flagged count,
    * and the unique flagged suppkey via min — exact because n_bad = 1
    * is enforced in the filter). One fact shuffle total, then a
    * semi-join against finalized orders and a supplier dim join. */
  def q195BlameSupplier(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // ONE fact shuffle, no multi-distinct aggregate: two `countDistinct`s
    // in a single agg trigger Spark's Expand (every fact row triples
    // BEFORE the shuffle — measured 12x the oracle twin), and even the
    // Expand-free (orderkey, suppkey) pre-aggregate pays a second
    // shuffle. Instead each line packs (suppkey << 1 | returned-flag)
    // into one long and the native SuppBlame aggregate dedups in-agg
    // into a primitive sorted array (set size bounded by the order's
    // supplier count, ~4 — never data-scaled), deriving the distinct
    // supplier/flagged counts and the unique flagged suppkey once per
    // GROUP at eval. Measured at sf1: 2.9 s (two-agg) -> 2.2 s
    // (collect_set + in-row array kernels, ProfQ195) -> 1.8 s (native
    // SuppBlame, no per-row boxing or post-agg array kernels).
    val perOrder = lineitem(s, d)
      .select($"l_orderkey",
        (shiftleft($"l_suppkey".cast("long"), 1)
          .bitwiseOR(when($"l_returnflag" === "R", 1L).otherwise(0L))).as("pk"))
      .groupBy($"l_orderkey")
      .agg(graft.functions.SuppBlame($"pk").as("sb"))
      .filter($"sb.n_supp" >= 2 && $"sb.n_bad" === 1)
      .select($"l_orderkey", $"sb.bad_supp".as("bad_supp"))
    val finalized = orders(s, d)
      .filter($"o_orderstatus" === "F").select($"o_orderkey")
    perOrder
      .join(finalized, $"l_orderkey" === $"o_orderkey", "left_semi")
      .join(supplier(s, d), $"bad_supp" === $"s_suppkey")
      .groupBy($"s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy($"numwait".desc, $"s_name")
      .limit(100)
  }

  val q195Sql: String =
    """SELECT s_name, count(DISTINCT l1.l_orderkey)::BIGINT AS numwait
      |FROM supplier
      |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      |JOIN orders ON o_orderkey = l1.l_orderkey
      |WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |    WHERE l2.l_orderkey = l1.l_orderkey
      |      AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |    WHERE l3.l_orderkey = l1.l_orderkey
      |      AND l3.l_suppkey <> l1.l_suppkey AND l3.l_returnflag = 'R')
      |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin

  // ---------------------------------------------------------------- q196

  /** q196: dormant high-balance customers (TPC-H Q22's shape) — customers
    * above the GLOBAL average positive account balance with no order
    * since 2000-01-01 (this synthetic corpus gives every customer SOME
    * order, so Q22's "never ordered" literal is vacuous; dormancy-since
    * keeps the identical plan shape non-degenerate), bucketed by nation.
    * Exercises the global-scalar-subquery + anti-join pair: the scalar
    * is a 1-row aggregate broadcast into the filter, the dormancy test
    * is a shuffle anti-join against the date-filtered fact (the custkey
    * set is |customers|-sized at scale — never broadcast, never
    * collected; the date predicate pushes to the parquet scan). The
    * threshold compare is exact: `bal * n_pos > sum_pos` in DECIMAL —
    * no double division whose last ulp could flip a boundary customer
    * between engines. */
  def q196DormantValue(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val c = customer(s, d)
    val posStats = c.filter($"c_acctbal" > 0.0)
      .agg(sum($"c_acctbal".cast("decimal(28,6)")).as("sum_pos"),
        count(lit(1)).as("n_pos"))
    val recent = orders(s, d)
      .filter($"o_orderdate" >= lit("2000-01-01").cast("timestamp"))
      .select($"o_custkey")
    c.join(broadcast(posStats))
      .filter($"c_acctbal".cast("decimal(28,6)") * $"n_pos" > $"sum_pos")
      .join(recent, $"c_custkey" === $"o_custkey", "left_anti")
      .join(broadcast(nation(s, d)), $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(count(lit(1)).as("numcust"),
        QueryUtil.safeSum($"c_acctbal", 2).as("totacctbal"))
      .orderBy($"n_name")
  }

  val q196Sql: String =
    s"""SELECT n_name, count(*)::BIGINT AS numcust,
       |  ${QueryUtil.safeSumSql("c_acctbal", 2)} AS totacctbal
       |FROM customer JOIN nation ON c_nationkey = n_nationkey
       |WHERE CAST(c_acctbal AS DECIMAL(28,6))
       |    * (SELECT count(*) FROM customer WHERE c_acctbal > 0.0)
       |  > (SELECT sum(CAST(c_acctbal AS DECIMAL(28,6)))
       |     FROM customer WHERE c_acctbal > 0.0)
       |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
       |    AND o_orderdate >= TIMESTAMP '2000-01-01')
       |GROUP BY n_name ORDER BY n_name""".stripMargin

  // ---------------------------------------------------------------- q199

  /** q199: bilateral shipping volume (TPC-H Q7's shape) — revenue
    * flowing between two specific nations in either direction, by
    * direction and year. The optimizer test is the DISJUNCTIVE pair
    * predicate `(c=A ∧ s=B) ∨ (c=B ∧ s=A)`: it cannot become a join
    * key, so the engine pre-filters BOTH dim sides to the two-nation
    * set (those equi-joins push down and broadcast) and leaves only
    * the cheap residual OR on the joined row — the fact table is
    * touched once, never once per disjunct. */
  def q199BilateralVolume(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val twoNations = nation(s, d)
      .filter($"n_name".isin("NATION_3", "NATION_7"))
    val cust = customer(s, d)
      .join(broadcast(twoNations.select($"n_nationkey", $"n_name".as("cust_nation"))),
        $"c_nationkey" === $"n_nationkey")
      .select($"c_custkey", $"cust_nation")
    val supp = supplier(s, d)
      .join(broadcast(twoNations.select($"n_nationkey", $"n_name".as("supp_nation"))),
        $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey", $"supp_nation")
    lineitem(s, d)
      .join(orders(s, d), $"l_orderkey" === $"o_orderkey")
      .join(broadcast(cust), $"o_custkey" === $"c_custkey")
      .join(broadcast(supp), $"l_suppkey" === $"s_suppkey")
      .filter(($"cust_nation" === "NATION_3" && $"supp_nation" === "NATION_7") ||
        ($"cust_nation" === "NATION_7" && $"supp_nation" === "NATION_3"))
      .groupBy($"cust_nation", $"supp_nation",
        year($"l_shipdate").cast("bigint").as("l_year"))
      .agg(QueryUtil.safeSum($"l_extendedprice" * (lit(1.0) - $"l_discount"), 2)
        .as("revenue"))
      .orderBy($"cust_nation", $"supp_nation", $"l_year")
  }

  val q199Sql: String =
    s"""SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
       |  year(l_shipdate)::BIGINT AS l_year,
       |  ${QueryUtil.safeSumSql("l_extendedprice * (1.0 - l_discount)", 2)}
       |    AS revenue
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation cn ON c_nationkey = cn.n_nationkey
       |JOIN nation sn ON s_nationkey = sn.n_nationkey
       |WHERE (cn.n_name = 'NATION_3' AND sn.n_name = 'NATION_7')
       |   OR (cn.n_name = 'NATION_7' AND sn.n_name = 'NATION_3')
       |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  // ---------------------------------------------------------------- q200

  /** q200: market share (TPC-H Q8's shape) — one nation's fraction of
    * total bilateral-relevant revenue per year: the conditional-ratio
    * aggregation `sum(CASE WHEN …)/sum(…)` computed in ONE pass over
    * the joined fact (two partial aggregates share the shuffle; a
    * naive twin-query + join would scan and shuffle twice). The ratio
    * divides two exact DECIMAL sums, rounded to 6dp only at output. */
  def q200MarketShare(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import graft.functions.TextFunctions.roundp
    val vol = lineitem(s, d)
      .join(orders(s, d), $"l_orderkey" === $"o_orderkey")
      .join(broadcast(supplier(s, d)), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(nation(s, d)), $"s_nationkey" === $"n_nationkey")
    vol.groupBy(year($"o_orderdate").cast("bigint").as("o_year"))
      .agg(
        sum(when($"n_name" === "NATION_3",
          ($"l_extendedprice" * (lit(1.0) - $"l_discount")).cast("decimal(28,6)"))
          .otherwise(lit(0).cast("decimal(28,6)"))).as("nation_rev"),
        sum(($"l_extendedprice" * (lit(1.0) - $"l_discount"))
          .cast("decimal(28,6)")).as("total_rev"))
      .select($"o_year",
        roundp($"nation_rev".cast("double") / $"total_rev".cast("double"), 6)
          .as("mkt_share"))
      .orderBy($"o_year")
  }

  val q200Sql: String =
    """WITH vol AS (SELECT year(o_orderdate)::BIGINT AS o_year,
      |    CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6)) AS r,
      |    n_name
      |  FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey)
      |SELECT o_year,
      |  round((CAST(sum(CASE WHEN n_name = 'NATION_3' THEN r
      |        ELSE CAST(0 AS DECIMAL(28,6)) END) AS DOUBLE)
      |    / CAST(sum(r) AS DOUBLE)) * 1000000.0) / 1000000.0 AS mkt_share
      |FROM vol GROUP BY o_year ORDER BY o_year""".stripMargin

  // ---------------------------------------------------------------- q201

  /** q201: returned-item revenue per customer (TPC-H Q10's shape) — the
    * "who returned the most value this quarter" report: lineitem
    * filtered to returns, orders to the quarter, the fact spine joined
    * to customer, nation broadcast, top 20 by lost revenue. The shape
    * matters at scale: BOTH filters push into their parquet scans
    * before either join, the customer join keys on the already-reduced
    * fact side, and the top-20 is a TakeOrdered (never a global sort).
    * Deterministic cutoff: (revenue, c_custkey) is a total order. */
  def q201ReturnedRevenue(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val li = lineitem(s, d).filter($"l_returnflag" === "R")
    val o = orders(s, d)
      .filter($"o_orderdate" >= lit("1996-10-01").cast("timestamp") &&
        $"o_orderdate" < lit("1997-01-01").cast("timestamp"))
    li.join(o, $"l_orderkey" === $"o_orderkey")
      .join(customer(s, d), $"o_custkey" === $"c_custkey")
      .join(broadcast(nation(s, d)), $"c_nationkey" === $"n_nationkey")
      .groupBy($"c_custkey", $"c_name", $"n_name")
      .agg(QueryUtil.safeSum($"l_extendedprice" * (lit(1.0) - $"l_discount"), 2)
        .as("revenue"))
      .orderBy($"revenue".desc, $"c_custkey")
      .limit(20)
  }

  val q201Sql: String =
    s"""SELECT c_custkey, c_name, n_name,
       |  ${QueryUtil.safeSumSql("l_extendedprice * (1.0 - l_discount)", 2)}
       |    AS revenue
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |WHERE l_returnflag = 'R'
       |  AND o_orderdate >= TIMESTAMP '1996-10-01'
       |  AND o_orderdate < TIMESTAMP '1997-01-01'
       |GROUP BY 1, 2, 3 ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- q202

  /** q202: quantity-band disjunctive join (TPC-H Q19's shape) — revenue
    * from three (brand, size, quantity-band) OR-arms. The optimizer
    * test: the disjunction spans BOTH tables, so it can only evaluate
    * after the join — but its HULL on each side (the OR of each
    * disjunct's single-side conjuncts) is implied and scan-prunable.
    * Catalyst does not infer cross-table OR hulls; graft's
    * [[graft.plan.InferDisjunctionHulls]] optimizer rule does — this
    * query writes ONLY the natural disjunction and HullRuleSpec +
    * PlanAuditSpec assert the derived quantity-band and brand hulls
    * reach both parquet scans as PushedFilters. Part stays a broadcast
    * dim; the residual OR is a cheap post-join filter. */
  def q202BandJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    lineitem(s, d).join(broadcast(part(s, d)), $"l_partkey" === $"p_partkey")
      .filter(
        ($"p_brand" === "Brand#1" && $"p_size" <= 5 &&
          $"l_quantity" >= 1.0 && $"l_quantity" <= 11.0) ||
        ($"p_brand" === "Brand#2" && $"p_size" <= 10 &&
          $"l_quantity" >= 10.0 && $"l_quantity" <= 20.0) ||
        ($"p_brand" === "Brand#3" && $"p_size" <= 15 &&
          $"l_quantity" >= 20.0 && $"l_quantity" <= 30.0))
      .agg(QueryUtil.safeSum($"l_extendedprice" * (lit(1.0) - $"l_discount"), 2)
        .as("revenue"), count(lit(1)).as("n_items"))
  }

  val q202Sql: String =
    s"""SELECT ${QueryUtil.safeSumSql("l_extendedprice * (1.0 - l_discount)", 2)}
       |    AS revenue,
       |  count(*)::BIGINT AS n_items
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |WHERE (p_brand = 'Brand#1' AND p_size <= 5
       |    AND l_quantity BETWEEN 1.0 AND 11.0)
       |   OR (p_brand = 'Brand#2' AND p_size <= 10
       |    AND l_quantity BETWEEN 10.0 AND 20.0)
       |   OR (p_brand = 'Brand#3' AND p_size <= 15
       |    AND l_quantity BETWEEN 20.0 AND 30.0)""".stripMargin

  // ---------------------------------------------------------------- q203

  /** q203: top supplier by quarterly revenue (TPC-H Q15's shape) — the
    * argmax-vs-max pattern: per-supplier revenue aggregates once, the
    * global max broadcasts back as a 1-row frame, and the EXACT DECIMAL
    * equality (both sides the same safeSum) selects the winner(s) — no
    * global sort, no window, and a revenue tie returns every tied
    * supplier (the spec's own semantics). */
  def q203TopSupplier(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val rev = lineitem(s, d)
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1996-04-01").cast("timestamp"))
      .groupBy($"l_suppkey")
      .agg(QueryUtil.safeSum($"l_extendedprice" * (lit(1.0) - $"l_discount"), 2)
        .as("total_rev"))
    val top = rev.agg(max($"total_rev").as("max_rev"))
    rev.join(broadcast(top), $"total_rev" === $"max_rev")
      .join(broadcast(supplier(s, d)), $"l_suppkey" === $"s_suppkey")
      .select($"s_suppkey", $"s_name", $"total_rev")
      .orderBy($"s_suppkey")
  }

  val q203Sql: String =
    s"""WITH rev AS (SELECT l_suppkey,
       |    ${QueryUtil.safeSumSql("l_extendedprice * (1.0 - l_discount)", 2)}
       |      AS total_rev
       |  FROM lineitem
       |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
       |    AND l_shipdate < TIMESTAMP '1996-04-01'
       |  GROUP BY l_suppkey)
       |SELECT s_suppkey, s_name, total_rev
       |FROM rev JOIN supplier ON l_suppkey = s_suppkey
       |WHERE total_rev = (SELECT max(total_rev) FROM rev)
       |ORDER BY s_suppkey""".stripMargin

  // ---------------------------------------------------------------- q207

  /** q207: product-line profit by supplier nation and year (TPC-H Q9's
    * shape; this schema has no partsupp, so unit cost is proxied as
    * 60% of `p_retailprice`). The 5-way join is ordered so the
    * SELECTIVE dim lands first: part is filtered to the 'red' product
    * line (~13%) and broadcast, shrinking the fact before the
    * lineitem⇄orders shuffle join (the only fact-fact shuffle);
    * supplier and nation broadcast. Profit per row is one double
    * expression written with identical associativity in both engines,
    * then summed in exact DECIMAL ([[QueryUtil.safeSum]]). */
  def q207ProductProfit(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val redParts = part(s, d).filter($"p_name".contains("red"))
      .select($"p_partkey", $"p_retailprice")
    lineitem(s, d)
      .join(broadcast(redParts), $"l_partkey" === $"p_partkey")
      .join(orders(s, d).select($"o_orderkey", $"o_orderdate"),
        $"l_orderkey" === $"o_orderkey")
      .join(broadcast(supplier(s, d)), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(nation(s, d)), $"s_nationkey" === $"n_nationkey")
      .groupBy($"n_name".as("nation"),
        year($"o_orderdate").cast("bigint").as("o_year"))
      .agg(QueryUtil.safeSum(
        $"l_extendedprice" * (lit(1.0) - $"l_discount") -
          lit(0.6) * $"p_retailprice" * $"l_quantity", 2).as("profit"))
      .orderBy($"nation", $"o_year")
  }

  val q207Sql: String =
    s"""SELECT n_name AS nation, year(o_orderdate)::BIGINT AS o_year,
       |  ${QueryUtil.safeSumSql(
            "l_extendedprice * (1.0 - l_discount) - 0.6 * p_retailprice * l_quantity", 2)}
       |    AS profit
       |FROM lineitem
       |JOIN part ON l_partkey = p_partkey
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation ON s_nationkey = n_nationkey
       |WHERE p_name LIKE '%red%'
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------- q208

  /** q208: small-quantity-order revenue (TPC-H Q17's shape) — revenue
    * lost to orders below 20% of a part's average order quantity, for
    * one brand. The textbook form is a correlated scalar subquery per
    * fact row (the oracle runs exactly that); the engine decorrelates:
    * the brand filter broadcasts into the fact FIRST (so the per-part
    * aggregate runs over the ~4% surviving slice, not the full fact),
    * the per-part (sum, count) aggregates once, and joins back on
    * partkey — two scans of the reduced slice, one shuffle each. The
    * threshold compare is exact BIGINT arithmetic (`qty·n·5 <
    * sum_qty`, quantities are integral doubles): no double division
    * whose last ulp could flip a boundary row between engines. */
  def q208SmallQtyRevenue(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val brandParts = part(s, d).filter($"p_brand" === "Brand#3")
      .select($"p_partkey")
    val li = lineitem(s, d)
      .join(broadcast(brandParts), $"l_partkey" === $"p_partkey")
      .select($"l_partkey", $"l_quantity", $"l_extendedprice")
    // quantities are integral doubles (asserted in RelationalSpec), so the
    // threshold math runs in exact BIGINT — faster than DECIMAL, same parity
    val stats = li.groupBy($"l_partkey".as("sp"))
      .agg(sum($"l_quantity".cast("bigint")).as("sum_qty"),
        count(lit(1)).as("n_li"))
    li.join(stats, $"l_partkey" === $"sp")
      .filter($"l_quantity".cast("bigint") * $"n_li" * 5 < $"sum_qty")
      .agg(count(lit(1)).as("n_lines"),
        QueryUtil.safeSum($"l_extendedprice", 2).as("total_price"))
  }

  val q208Sql: String =
    s"""SELECT count(*)::BIGINT AS n_lines,
       |  ${QueryUtil.safeSumSql("l1.l_extendedprice", 2)} AS total_price
       |FROM lineitem l1 JOIN part ON l1.l_partkey = p_partkey
       |WHERE p_brand = 'Brand#3'
       |  AND CAST(l1.l_quantity AS BIGINT) * 5 *
       |    (SELECT count(*) FROM lineitem l3
       |     WHERE l3.l_partkey = l1.l_partkey)
       |  < (SELECT sum(CAST(l2.l_quantity AS BIGINT))
       |     FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)""".stripMargin

  // ---------------------------------------------------------------- q209

  /** q209: large-quantity orders (TPC-H Q18's shape) — orders whose
    * total quantity exceeds 300, with customer and order detail, top
    * 100 by order value. The HAVING aggregate runs on the fact ALONE
    * (one shuffle on orderkey, map-side partial sums); the survivor
    * set is tiny (~0.1% of orders), so it broadcasts into orders and
    * then again into customer — the two dim joins cost zero shuffles.
    * Cutoff determinism: (o_totalprice, o_orderkey) is a total order
    * over stored columns (byte-identical in both engines). */
  def q209LargeOrders(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // integral quantities → exact BIGINT sum (same parity as DECIMAL,
    // cheaper per-row aggregation over the full fact)
    val big = lineitem(s, d)
      .groupBy($"l_orderkey")
      .agg(sum($"l_quantity".cast("bigint")).as("sum_qty"))
      .filter($"sum_qty" > 300)
    val withOrders = orders(s, d)
      .join(broadcast(big), $"o_orderkey" === $"l_orderkey")
    customer(s, d)
      .join(broadcast(withOrders), $"c_custkey" === $"o_custkey")
      .select($"c_name", $"c_custkey", $"o_orderkey", $"o_orderdate",
        $"o_totalprice", $"sum_qty")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
      .limit(100)
  }

  val q209Sql: String =
    """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
      |  sum(CAST(l_quantity AS BIGINT))::BIGINT AS sum_qty
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |GROUP BY 1, 2, 3, 4, 5
      |HAVING sum(CAST(l_quantity AS BIGINT)) > 300
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin

  // ---------------------------------------------------------------- q210

  /** q210: supplier diversity per part descriptor (TPC-H Q16's shape;
    * no partsupp here, so actual lineitem supply relationships stand
    * in) — how many distinct suppliers ship each (brand, type, size)
    * combination, excluding one brand, 'small'-named parts, and
    * suppliers in arrears (negative balance — Q16's complaint
    * subquery). The exclusion is a broadcast anti-join applied to the
    * fact BEFORE the part join (cheapest point: one dim-side hash
    * probe per row, no shuffle); countDistinct expands to the
    * standard two-phase partial-distinct aggregate — no row ever
    * carries a distinct set bigger than its group's supplier count. */
  def q210SupplierDiversity(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val inArrears = supplier(s, d).filter($"s_acctbal" < 0.0)
      .select($"s_suppkey")
    val pd = part(s, d)
      .filter($"p_brand" =!= "Brand#1" && !$"p_name".startsWith("small"))
      .select($"p_partkey", $"p_brand", $"p_type", $"p_size")
    lineitem(s, d).select($"l_partkey", $"l_suppkey")
      .join(broadcast(inArrears), $"l_suppkey" === $"s_suppkey", "left_anti")
      .join(broadcast(pd), $"l_partkey" === $"p_partkey")
      .groupBy($"p_brand", $"p_type", $"p_size")
      .agg(countDistinct($"l_suppkey").as("supplier_cnt"))
      .orderBy($"supplier_cnt".desc, $"p_brand", $"p_type", $"p_size")
  }

  val q210Sql: String =
    """SELECT p_brand, p_type, p_size,
      |  count(DISTINCT l_suppkey)::BIGINT AS supplier_cnt
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE p_brand <> 'Brand#1' AND p_name NOT LIKE 'small%'
      |  AND l_suppkey NOT IN
      |    (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY 1, 2, 3
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  // ---------------------------------------------------------------- q216

  /** q216: revenue concentration (TPC-H Q11's shape) — parts whose
    * revenue exceeds 0.05% of GLOBAL revenue: the HAVING-against-a-
    * global-scalar pattern. One per-part aggregation; the global total
    * re-aggregates the |parts|-sized frame (cheaper than a second fact
    * scan) and broadcasts back as 1 row; the threshold compare is the
    * CROSS-MULTIPLIED exact-DECIMAL form (`rev · 2000 > total`) — no
    * division whose last ulp could flip a part sitting on the 0.05%
    * boundary between engines. Share rounds only at output. */
  def q216RevenueConcentration(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import graft.functions.TextFunctions.roundp
    // perPart has two consumers (total + final rows): persist the
    // |parts|-sized frame so the total aggregates IT, not a second
    // full fact scan
    val perPart = graft.ops.ScratchCache.register(lineitem(s, d)
      .groupBy($"l_partkey")
      .agg(sum(($"l_extendedprice" * (lit(1.0) - $"l_discount"))
        .cast("decimal(28,6)")).as("rev")).persist())
    val tot = perPart.agg(sum($"rev").as("total_rev"))
    perPart.crossJoin(broadcast(tot))
      .filter($"rev" * 2000 > $"total_rev")
      .select($"l_partkey",
        roundp($"rev".cast("double"), 2).as("revenue"),
        roundp($"rev".cast("double") / $"total_rev".cast("double"), 6)
          .as("share"))
      .orderBy($"revenue".desc, $"l_partkey")
  }

  val q216Sql: String =
    s"""WITH p AS (SELECT l_partkey,
       |    sum(CAST(l_extendedprice * (1.0 - l_discount)
       |      AS DECIMAL(28,6))) AS rev
       |  FROM lineitem GROUP BY 1),
       |t AS (SELECT sum(rev) AS total_rev FROM p)
       |SELECT l_partkey,
       |  round((rev::DOUBLE) * 100.0) / 100.0 AS revenue,
       |  round((rev::DOUBLE / total_rev::DOUBLE) * 1000000.0) / 1000000.0
       |    AS share
       |FROM p CROSS JOIN t
       |WHERE rev * 2000 > total_rev
       |ORDER BY revenue DESC, l_partkey""".stripMargin

  // ---------------------------------------------------------------- q231

  /** q231: order-to-ship latency trend — p50/p95 of (l_shipdate −
    * o_orderdate) per order month: the fulfillment-SLA dashboard, and
    * the shape that matters is WHERE the percentile runs: per
    * (month) group over integral day-latencies, exact `percentile`
    * (map-side partial aggregation of a bounded counter map — latency
    * domain is small integers), never a global sort. Latency in whole
    * days (µs div 86400·10⁶ — exact integer both engines). */
  def q231ShipLatencyTrend(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val lat = lineitem(s, d)
      .select($"l_orderkey", unix_micros($"l_shipdate").as("sus"))
      .join(orders(s, d).select($"o_orderkey",
        unix_micros($"o_orderdate").as("ous"),
        date_format($"o_orderdate", "yyyy-MM").as("month")),
        $"l_orderkey" === $"o_orderkey")
      // FLOOR division, not `div`: the synthetic data has ship-before-
      // order lines (negative latencies), where Spark's `div` truncates
      // toward zero but DuckDB's `//` floors — the pmod form floors
      // exactly in integer arithmetic on both signs
      .select($"month",
        expr("(sus - ous - pmod(sus - ous, 86400000000)) div 86400000000")
          .as("lat_days"))
    import graft.functions.TextFunctions.roundp
    // DELIBERATE builtin-percentile holdout (the one continuous-domain
    // percentile NOT on ops.PercentileCut's radix path): lat_days is a
    // SMALL-INTEGER domain — order-to-ship latency spans a few hundred
    // distinct day values whatever the row count — so the builtin's
    // value→count buffer is bounded by the domain, not the data, and its
    // map-side partial aggregation is the cheaper plan at every scale.
    // Do not "fix" this onto the radix path: groupedCuts' per-level jobs
    // cost more than a bounded counter map here.
    lat.groupBy($"month")
      .agg(count(lit(1)).as("n_lines"),
        expr("percentile(lat_days, array(0.5, 0.95))").as("ps"))
      .select($"month", $"n_lines",
        roundp($"ps"(0), 2).as("p50_days"),
        roundp($"ps"(1), 2).as("p95_days"))
      .orderBy($"month")
  }

  val q231Sql: String =
    s"""WITH lat AS (SELECT strftime(o_orderdate, '%Y-%m') AS month,
       |    (epoch_us(l_shipdate) - epoch_us(o_orderdate))
       |      // 86400000000 AS lat_days
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
       |SELECT month, count(*)::BIGINT AS n_lines,
       |  ${DuckSql.roundpSql("quantile_cont(lat_days, 0.5)", 2)} AS p50_days,
       |  ${DuckSql.roundpSql("quantile_cont(lat_days, 0.95)", 2)} AS p95_days
       |FROM lat GROUP BY month ORDER BY month""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q231_ship_latency" -> (q231ShipLatencyTrend _),
    "q216_revenue_concentration" -> (q216RevenueConcentration _),
    "q207_product_profit" -> (q207ProductProfit _),
    "q208_small_qty_revenue" -> (q208SmallQtyRevenue _),
    "q209_large_orders" -> (q209LargeOrders _),
    "q210_supplier_diversity" -> (q210SupplierDiversity _),
    "q201_returned_revenue" -> (q201ReturnedRevenue _),
    "q202_band_join" -> (q202BandJoin _),
    "q203_top_supplier" -> (q203TopSupplier _),
    "q199_bilateral_volume" -> (q199BilateralVolume _),
    "q200_market_share" -> (q200MarketShare _),
    "q195_blame_supplier" -> (q195BlameSupplier _),
    "q196_dormant_value" -> (q196DormantValue _),
    "q194_custdist" -> (q194CustDist _),
    "q193_star_join" -> (q193StarJoin _),
    "q01_pricing_summary" -> (q01PricingSummary _),
    "q02_filter_project"  -> (q02FilterProject _),
    "q03_broadcast_join"  -> (q03BroadcastJoin _),
    "q04_anti_join"       -> (q04AntiJoin _),
    "q05_semi_join"       -> (q05SemiJoin _),
    "q06_cross_join"      -> (q06CrossJoin _),
    "q07_range_join"      -> (q07RangeJoin _),
    "q08_window_funcs"    -> (q08WindowFuncs _),
    "q09_distinct"        -> (q09Distinct _),
    "q10_union_agg"       -> (q10Union _),
    "q11_topk"            -> (q11TopK _),
    "q12_first_of_group"  -> (q12FirstOfGroup _),
    "q70_rollup"          -> (q70Rollup _),
    "q71_pivot"           -> (q71Pivot _),
    "q76_cube"            -> (q76Cube _),
    "q87_correlated_subquery" -> (q87CorrelatedSubquery _),
    "q88_range_frame"     -> (q88RangeFrame _),
  )

  val oracles: Map[String, String] = Map(
    "q231_ship_latency" -> q231Sql,
    "q216_revenue_concentration" -> q216Sql,
    "q207_product_profit" -> q207Sql,
    "q208_small_qty_revenue" -> q208Sql,
    "q209_large_orders" -> q209Sql,
    "q210_supplier_diversity" -> q210Sql,
    "q201_returned_revenue" -> q201Sql,
    "q202_band_join" -> q202Sql,
    "q203_top_supplier" -> q203Sql,
    "q199_bilateral_volume" -> q199Sql,
    "q200_market_share" -> q200Sql,
    "q195_blame_supplier" -> q195Sql,
    "q196_dormant_value" -> q196Sql,
    "q194_custdist" -> q194Sql,
    "q193_star_join" -> q193Sql,
    "q01_pricing_summary" -> q01Sql,
    "q02_filter_project"  -> q02Sql,
    "q03_broadcast_join"  -> q03Sql,
    "q04_anti_join"       -> q04Sql,
    "q05_semi_join"       -> q05Sql,
    "q06_cross_join"      -> q06Sql,
    "q07_range_join"      -> q07Sql,
    "q08_window_funcs"    -> q08Sql,
    "q09_distinct"        -> q09Sql,
    "q10_union_agg"       -> q10Sql,
    "q11_topk"            -> q11Sql,
    "q12_first_of_group"  -> q12Sql,
    "q70_rollup"          -> q70Sql,
    "q71_pivot"           -> q71Sql,
    "q76_cube"            -> q76Sql,
    "q87_correlated_subquery" -> q87Sql,
    "q88_range_frame"     -> q88Sql,
  )
}
