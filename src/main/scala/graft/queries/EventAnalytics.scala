package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.events
import graft.functions.TextFunctions.roundp

/** Behavioral event analytics — the OLAP shapes a product/training-data
  * pipeline runs over an event log: overlapping time windows, ordered
  * funnels, cohort retention. All deterministic (integer epoch-µs math,
  * min/count aggregates), all single-key-shuffle plans.
  */
object EventAnalytics {

  private val SlideUs = 300000000L   // 5 min
  private val WinUs   = 600000000L   // 10 min window = 2 slides
  private val WeekUs  = 7L * 86400000000L

  /** q77: sliding-window aggregation — each event lands in TWO
    * overlapping 10-minute windows sliding by 5 (Spark's native
    * `window(ts, "10 minutes", "5 minutes")`, the same generator
    * Structured Streaming uses). The expansion factor is
    * windowDuration/slide (2×) BEFORE the partial aggregation, after
    * which map-side combine collapses to |windows|·|types| rows — the
    * scale knob is the ratio, not the data size. */
  def q77SlidingWindow(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    events(s, d)
      .groupBy(window($"ts", "10 minutes", "5 minutes").as("w"), $"event_type")
      .agg(count(lit(1)).as("n"), QueryUtil.safeSum($"value", 2).as("sum_v"))
      .select(unix_micros($"w.start").as("win_us"), $"event_type", $"n", $"sum_v")
      .orderBy($"win_us", $"event_type")
  }

  val q77Sql: String =
    s"""WITH e AS (SELECT epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_type, value
       |  FROM events),
       |x AS (SELECT unnest([us - us % $SlideUs,
       |                     us - us % $SlideUs - $SlideUs]) AS win_us,
       |  event_type, value FROM e)
       |SELECT win_us, event_type, count(*) AS n,
       |  ${QueryUtil.safeSumSql("value", 2)} AS sum_v
       |FROM x GROUP BY 1, 2 ORDER BY win_us, event_type""".stripMargin

  /** q78: ordered funnel — per user: first view, first click AFTER that
    * view, first purchase AFTER that click, all within 7 days of the
    * view. Three filtered min-aggregations chained by keyed joins (each a
    * map-side-combinable groupBy on user_id; AQE broadcasts the shrinking
    * stage tables). No window sort: funnels over a 100 TB log reduce to
    * |users|-sized intermediates immediately. */
  def q78Funnel(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val e = events(s, d)
      .select($"user_id", $"event_type", unix_micros($"ts").as("us"))
    val v = e.filter($"event_type" === "view")
      .groupBy($"user_id").agg(min($"us").as("t1"))
    val c = e.filter($"event_type" === "click").join(v, "user_id")
      .filter($"us" > $"t1" && $"us" <= $"t1" + lit(WeekUs))
      .groupBy($"user_id").agg(min($"us").as("t2"))
    val p = e.filter($"event_type" === "purchase").join(c, "user_id")
      .filter($"us" > $"t2" && $"us" <= $"t2" + lit(WeekUs))
      .groupBy($"user_id").agg(min($"us").as("t3"))
    v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
      .select($"user_id", $"t1", $"t2", $"t3",
        (lit(1L) + when($"t2".isNotNull, 1L).otherwise(0L)
          + when($"t3".isNotNull, 1L).otherwise(0L)).as("depth"))
      .orderBy($"user_id")
  }

  val q78Sql: String =
    s"""WITH e AS (SELECT user_id, event_type,
       |    epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
       |v AS (SELECT user_id, min(us) AS t1 FROM e
       |  WHERE event_type = 'view' GROUP BY 1),
       |c AS (SELECT e.user_id, min(e.us) AS t2 FROM e
       |  JOIN v ON e.user_id = v.user_id
       |    AND e.us > v.t1 AND e.us <= v.t1 + $WeekUs
       |  WHERE e.event_type = 'click' GROUP BY 1),
       |p AS (SELECT e.user_id, min(e.us) AS t3 FROM e
       |  JOIN c ON e.user_id = c.user_id
       |    AND e.us > c.t2 AND e.us <= c.t2 + $WeekUs
       |  WHERE e.event_type = 'purchase' GROUP BY 1)
       |SELECT v.user_id, v.t1, c.t2, p.t3,
       |  (1 + CASE WHEN c.t2 IS NULL THEN 0 ELSE 1 END
       |     + CASE WHEN p.t3 IS NULL THEN 0 ELSE 1 END)::BIGINT AS depth
       |FROM v LEFT JOIN c ON v.user_id = c.user_id
       |       LEFT JOIN p ON v.user_id = p.user_id
       |ORDER BY v.user_id""".stripMargin

  /** q79: cohort retention matrix — users bucketed by first-seen week,
    * counted as active per week offset. Two aggregations: first-seen per
    * user (|users| rows), then distinct users per (cohort, offset) —
    * countDistinct shuffles (cohort, offset, user) partials, never raw
    * events. The fact-side join key is user_id, the first-seen table is
    * users-sized → AQE broadcast at any realistic cohort cardinality. */
  def q79Cohort(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val e = events(s, d)
      .select($"user_id", (unix_micros($"ts") / lit(WeekUs)).cast("long").as("wk"))
    val first = e.groupBy($"user_id").agg(min($"wk").as("cohort_wk"))
    e.join(first, "user_id")
      .groupBy($"cohort_wk", ($"wk" - $"cohort_wk").as("week_offset"))
      .agg(countDistinct($"user_id").as("active_users"))
      .orderBy($"cohort_wk", $"week_offset")
  }

  val q79Sql: String =
    s"""WITH e AS (SELECT user_id,
       |    epoch_us(CAST(ts AS TIMESTAMP)) // $WeekUs AS wk FROM events),
       |f AS (SELECT user_id, min(wk) AS cohort_wk FROM e GROUP BY 1)
       |SELECT f.cohort_wk, e.wk - f.cohort_wk AS week_offset,
       |  count(DISTINCT e.user_id) AS active_users
       |FROM e JOIN f ON e.user_id = f.user_id
       |GROUP BY 1, 2 ORDER BY cohort_wk, week_offset""".stripMargin

  /** q84: SCD2 interval build — turn a change log (each user's signup
    * events carrying a value) into validity intervals with a current-row
    * flag: valid_to = next change's timestamp, open intervals marked
    * current. One keyed window (single shuffle on user_id, in-partition
    * sort); `lead` is the canonical interval-closer. MaxValue sentinel
    * keeps the column BIGINT (a NULL valid_to would make every downstream
    * range predicate three-valued). */
  def q84Scd2(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"user_id").orderBy($"valid_from")
    events(s, d).filter($"event_type" === "signup")
      .select($"user_id", unix_micros($"ts").as("valid_from"),
        graft.functions.TextFunctions.roundp($"value", 6).as("value"))
      .withColumn("nxt", lead($"valid_from", 1).over(w))
      .select($"user_id", $"valid_from",
        coalesce($"nxt", lit(Long.MaxValue)).as("valid_to"),
        $"value", $"nxt".isNull.as("is_current"))
      .orderBy($"user_id", $"valid_from")
  }

  val q84Sql: String =
    """WITH s AS (SELECT user_id,
      |    epoch_us(CAST(ts AS TIMESTAMP)) AS valid_from,
      |    round(value * 1e6) / 1e6 AS value
      |  FROM events WHERE event_type = 'signup'),
      |x AS (SELECT user_id, valid_from, value,
      |    lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from)
      |      AS nxt FROM s)
      |SELECT user_id, valid_from,
      |  coalesce(nxt, 9223372036854775807) AS valid_to, value,
      |  nxt IS NULL AS is_current
      |FROM x ORDER BY user_id, valid_from""".stripMargin

  /** q85: arbitrary GROUPING SETS — (source), (lang), and grand total in
    * one pass (the general form q70's rollup and q76's cube specialize).
    * Same Expand→single-hash-aggregate physical shape; the grouping-set
    * list controls the expansion factor exactly (3× here, vs 2^n for
    * cube). */
  def q85GroupingSets(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    graft.Tables.documents(s, d)
      .groupingSets(Seq(Seq($"source"), Seq($"lang"), Seq()),
        $"source", $"lang")
      .agg(grouping_id().cast("long").as("gid"),
        count(lit(1)).as("n_docs"), sum($"n_chars").as("chars"))
      .select(coalesce($"source", lit("ALL")).as("source"),
        coalesce($"lang", lit("ALL")).as("lang"), $"gid", $"n_docs", $"chars")
      .orderBy($"gid", $"source", $"lang")
  }

  val q85Sql: String =
    """SELECT coalesce(source, 'ALL') AS source, coalesce(lang, 'ALL') AS lang,
      |  CAST(grouping(source) * 2 + grouping(lang) AS BIGINT) AS gid,
      |  count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS chars
      |FROM documents GROUP BY GROUPING SETS ((source), (lang), ())
      |ORDER BY gid, source, lang""".stripMargin

  /** q86: relational set operations — INTERSECT / EXCEPT audience
    * segmentation (clickers vs purchasers). Spark's intersect/except are
    * set-semantic (distinct) like SQL's; each compiles to a distinct +
    * join (semi/anti) pair, all hash-partitioned on user_id. */
  def q86SetOps(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val e = events(s, d)
    def ids(t: String) = e.filter($"event_type" === t).select($"user_id")
    val clickers = ids("click")
    val buyers = ids("purchase")
    clickers.intersect(buyers).withColumn("segment", lit("both"))
      .unionByName(clickers.except(buyers).withColumn("segment", lit("click_only")))
      .unionByName(buyers.except(clickers).withColumn("segment", lit("purchase_only")))
      .orderBy($"user_id", $"segment")
  }

  val q86Sql: String =
    """WITH c AS (SELECT user_id FROM events WHERE event_type = 'click'),
      |p AS (SELECT user_id FROM events WHERE event_type = 'purchase')
      |SELECT user_id, segment FROM (
      |  SELECT user_id, 'both' AS segment FROM (
      |    SELECT user_id FROM c INTERSECT SELECT user_id FROM p)
      |  UNION ALL
      |  SELECT user_id, 'click_only' FROM (
      |    SELECT user_id FROM c EXCEPT SELECT user_id FROM p)
      |  UNION ALL
      |  SELECT user_id, 'purchase_only' FROM (
      |    SELECT user_id FROM p EXCEPT SELECT user_id FROM c))
      |ORDER BY user_id, segment""".stripMargin

  /** q97: time-series gap fill — the hourly count series per event type
    * INCLUDING empty hours (the resample-to-regular-grid step before any
    * sequence model). The dense grid is generated, not scanned: distinct
    * types × a `sequence(lo, hi, hour)` explode off a 1-row span
    * aggregate, then a left join pulls real counts in. Grid size is
    * |types|·|hours| — independent of event volume. */
  def q97GapFill(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val HourUs = 3600000000L
    val e = events(s, d).select($"event_type",
      (unix_micros($"ts") - pmod(unix_micros($"ts"), lit(HourUs))).as("hr_us"))
    val span = e.agg(min($"hr_us").as("lo"), max($"hr_us").as("hi"))
    val grid = e.select($"event_type").distinct()
      .crossJoin(broadcast(span))
      .select($"event_type",
        explode(sequence($"lo", $"hi", lit(HourUs))).as("hr_us"))
    val cnt = e.groupBy($"event_type", $"hr_us").agg(count(lit(1)).as("n"))
    grid.join(cnt, Seq("event_type", "hr_us"), "left")
      .select($"event_type", $"hr_us", coalesce($"n", lit(0L)).as("n"))
      .orderBy($"event_type", $"hr_us")
  }

  val q97Sql: String =
    """WITH e AS (SELECT event_type, us - us % 3600000000 AS hr_us
      |  FROM (SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS us
      |        FROM events)),
      |span AS (SELECT min(hr_us) AS lo, max(hr_us) AS hi FROM e),
      |grid AS (SELECT t.event_type, g.hr_us
      |  FROM (SELECT DISTINCT event_type FROM e) t
      |  CROSS JOIN (SELECT unnest(generate_series((SELECT lo FROM span),
      |    (SELECT hi FROM span), 3600000000)) AS hr_us) g),
      |cnt AS (SELECT event_type, hr_us, count(*) AS n FROM e GROUP BY 1, 2)
      |SELECT grid.event_type, grid.hr_us, coalesce(cnt.n, 0) AS n
      |FROM grid LEFT JOIN cnt USING (event_type, hr_us)
      |ORDER BY event_type, hr_us""".stripMargin

  /** q100: Markov transition matrix — consecutive event-type bigrams per
    * user (ordered by ts, event_id) with per-prev transition
    * probabilities. Sequencing happens inside each user's group
    * (flatMapGroups over a keyed shuffle, buffer bounded by that user's
    * events — q80's stateful pattern); probabilities join back off the
    * tiny per-prev total. n/total is an int-over-int division —
    * IEEE-identical on both engines, so the rounded p hash-matches. */
  def q100Transitions(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val pairs = events(s, d)
      .select($"user_id", unix_micros($"ts").as("us"), $"event_id", $"event_type")
      .as[(Long, Long, Long, String)]
      .groupByKey(_._1)
      .flatMapGroups { (_, it) =>
        val evs = it.toArray.sortBy(e => (e._2, e._3))
        evs.iterator.zip(evs.iterator.drop(1))
          .map { case (a, b) => (a._4, b._4) }
      }
      .toDF("prev", "next")
    val t = pairs.groupBy($"prev", $"next").agg(count(lit(1)).as("n"))
    val tot = t.groupBy($"prev").agg(sum($"n").as("tn"))
    t.join(broadcast(tot), Seq("prev"))
      .select($"prev", $"next", $"n",
        graft.functions.TextFunctions.roundp($"n".cast("double") / $"tn", 6).as("p"))
      .orderBy($"prev", $"next")
  }

  val q100Sql: String =
    s"""WITH seq AS (SELECT event_type,
       |    lead(event_type) OVER (PARTITION BY user_id
       |      ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS nxt
       |  FROM events),
       |t AS (SELECT event_type AS prev, nxt AS next, count(*) AS n
       |  FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2),
       |tot AS (SELECT prev, sum(n) AS tn FROM t GROUP BY prev)
       |SELECT t.prev, t.next, t.n,
       |  ${DuckSql.roundpSql("t.n * 1.0 / tot.tn", 6)} AS p
       |FROM t JOIN tot USING (prev) ORDER BY prev, next""".stripMargin

  /** q106: max concurrent intervals per event type — each event opens an
    * interval [ts, ts + (⌊|value|·60⌋+1) s) (a deterministic synthetic
    * duration; the corpus has no explicit end timestamps). Runs through
    * [[graft.ops.Sweep.maxConcurrent]] — a grouped two-pass distributed
    * prefix sum: NO per-group window reducer (the oracle IS that windowed
    * form, making the comparison an independent check of the sweep). */
  def q106MaxConcurrent(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val iv = events(s, d).select($"event_type",
      unix_micros($"ts").as("st"),
      (unix_micros($"ts")
        + (floor(abs($"value") * 60).cast("long") + 1L) * 1000000L).as("en"))
    val pts = iv.select($"event_type", explode(array(
        struct($"st".as("t"), lit(1L).as("delta")),
        struct($"en".as("t"), lit(-1L).as("delta")))).as("p"))
      .select($"event_type", $"p.t", $"p.delta")
      .as[(String, Long, Long)]
    graft.ops.Sweep.maxConcurrent(pts, 32)
      .select($"g".as("event_type"), $"max_concurrent")
      .orderBy($"event_type")
  }

  val q106Sql: String =
    """WITH iv AS (
      |  SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS st,
      |    epoch_us(CAST(ts AS TIMESTAMP))
      |      + (floor(abs(value) * 60)::BIGINT + 1) * 1000000 AS en
      |  FROM events),
      |pts AS (
      |  SELECT event_type, st AS t, 1 AS delta FROM iv
      |  UNION ALL SELECT event_type, en, -1 FROM iv),
      |run AS (
      |  SELECT event_type, sum(delta) OVER (PARTITION BY event_type
      |    ORDER BY t, delta ROWS UNBOUNDED PRECEDING) AS c
      |  FROM pts)
      |SELECT event_type, max(c)::BIGINT AS max_concurrent
      |FROM run GROUP BY event_type ORDER BY event_type""".stripMargin

  /** q107: per-group simple linear regression (value vs time) through
    * EXACT mergeable sufficient statistics — Σx, Σy, Σxy, Σx² as
    * DECIMAL(38,0) sums of integers (x = epoch seconds, y = ⌊value·10⁶⌋),
    * combined map-side like any algebraic aggregate; slope/intercept are
    * derived per group from the exact sums, so the result is
    * bit-deterministic under ANY partitioning or reduction order — the
    * float-sum ulp problem that makes naive distributed regression
    * unreproducible never arises. This is the distributed-ML-fit shape:
    * one narrow scan, one combine-friendly aggregate, G output rows. */
  def q107GroupRegression(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val e = events(s, d).select($"event_type",
      (unix_micros($"ts") - pmod(unix_micros($"ts"), lit(1000000L)))
        .cast("long").as("usf"),
      floor($"value" * 1000000d).cast("long").as("yi"))
      .select($"event_type", ($"usf" / 1000000L).cast("long").as("x"), $"yi")
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(20,0)")
    val stats = e.groupBy($"event_type").agg(
      count(lit(1)).as("n"),
      sum(dec($"x")).as("sx"),
      sum(dec($"yi")).as("sy"),
      sum(dec($"x") * dec($"yi")).as("sxy"),
      sum(dec($"x") * dec($"x")).as("sxx"))
    // exact-integer numerators/denominator, cast to double only at the
    // end. Zero-variance x within a group (every event in the same
    // second) is NULL-guarded: Catalyst cancels the double casts and
    // plans a DECIMAL divide, which ANSI-throws on 0 — and the slope of
    // a one-point group is undefined anyway (R's NA)
    val num = (dec($"n") * $"sxy" - $"sx" * $"sy").cast("double")
    val den = (dec($"n") * $"sxx" - $"sx" * $"sx").cast("double")
    val slope = when(den =!= 0.0, num / den)
    stats
      .select($"event_type", $"n",
        // num/den is the slope in yi-units/s = 1e6 × (value-units/s)
        roundp(slope, 6).as("slope_e6"),
        roundp(($"sy".cast("double") - slope * $"sx".cast("double"))
          / $"n".cast("double") / lit(1e6), 6).as("intercept"))
      .orderBy($"event_type")
  }

  val q107Sql: String = {
    val roundp6 = (x: String) => DuckSql.roundpSql(x, 6)
    """WITH e AS (
      |  SELECT event_type,
      |    epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS x,
      |    floor(value * 1000000)::BIGINT AS yi
      |  FROM events),
      |st AS (
      |  SELECT event_type, count(*)::BIGINT AS n,
      |    sum(x::HUGEINT) AS sx, sum(yi::HUGEINT) AS sy,
      |    sum(x::HUGEINT * yi::HUGEINT) AS sxy,
      |    sum(x::HUGEINT * x::HUGEINT) AS sxx
      |  FROM e GROUP BY event_type)
      |SELECT event_type, n,
      |  ROUNDP6_A AS slope_e6,
      |  ROUNDP6_B AS intercept
      |FROM st ORDER BY event_type""".stripMargin
      .replace("ROUNDP6_A", roundp6(
        "(n::HUGEINT * sxy - sx * sy)::DOUBLE" +
          " / (n::HUGEINT * sxx - sx * sx)::DOUBLE"))
      .replace("ROUNDP6_B", roundp6(
        "(sy::DOUBLE - ((n::HUGEINT * sxy - sx * sy)::DOUBLE" +
          " / (n::HUGEINT * sxx - sx * sx)::DOUBLE) * sx::DOUBLE)" +
          " / n::DOUBLE / 1e6"))
  }

  /** q110: distribution-drift audit via the Population Stability Index —
    * for each event_type, compare the distribution of `value` (binned at
    * width 5) between the first and second half of the month:
    * PSI = Σ_bins (p_a − p_b)·ln(p_a / p_b), with add-one count smoothing
    * so empty bins stay defined in both engines. PSI < 0.1 is the usual
    * "no drift" read; the audit flags features whose input distribution
    * moved between snapshots before a model retrain.
    *
    * Scale shape: ONE full-data shuffle (groupBy type×period×bin with
    * map-side partial counts); everything after runs on the bin table
    * (|types|·|bins| rows) — per-type totals and the PSI fold are
    * small-small joins. At 100 TB the event scan dominates; the audit is
    * a single pass. */
  def q110DriftPsi(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val boundary = lit(java.sql.Timestamp.valueOf("2024-01-16 00:00:00"))
    val binned = events(s, d)
      .select($"event_type",
        when($"ts" < boundary, 0).otherwise(1).as("period"),
        floor($"value" / 5).cast("long").as("bin"))
      .groupBy($"event_type", $"bin")
      .agg(
        sum(when($"period" === 0, 1L).otherwise(0L)).as("ca"),
        sum(when($"period" === 1, 1L).otherwise(0L)).as("cb"))
    val totals = binned.groupBy($"event_type")
      .agg((sum($"ca") + count(lit(1))).as("ta"),
        (sum($"cb") + count(lit(1))).as("tb"))
    val pa = ($"ca" + 1.0) / $"ta"
    val pb = ($"cb" + 1.0) / $"tb"
    binned.join(totals, "event_type")
      .groupBy($"event_type")
      .agg(
        roundp(sum((pa - pb) * log(pa / pb)), 6).as("psi"),
        count(lit(1)).as("n_bins"))
      .orderBy($"event_type")
  }

  val q110Sql: String =
    s"""WITH binned AS (
       |  SELECT event_type, floor(value / 5)::BIGINT AS bin,
       |    sum(CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
       |      THEN 1 ELSE 0 END) AS ca,
       |    sum(CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
       |      THEN 0 ELSE 1 END) AS cb
       |  FROM events GROUP BY 1, 2),
       |totals AS (SELECT event_type, sum(ca) + count(*) AS ta,
       |    sum(cb) + count(*) AS tb
       |  FROM binned GROUP BY 1)
       |SELECT event_type,
       |  ${DuckSql.roundpSql(
            "sum(((ca + 1.0) / ta - (cb + 1.0) / tb) * " +
              "ln(((ca + 1.0) / ta) / ((cb + 1.0) / tb)))", 6)} AS psi,
       |  CAST(count(*) AS BIGINT) AS n_bins
       |FROM binned JOIN totals USING (event_type)
       |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** q143: TRAJECTORY construction — per user, the time-ordered sequence
    * of their first 20 event types (plus the total count and a content
    * hash of the truncated trajectory): raw event logs become the
    * behavioral-sequence rows an agent/recommendation training set is
    * built from. The ordering key (ts, event_id) is a total order, so
    * the assembled string is deterministic on both engines.
    *
    * Scale shape: ONE user-keyed shuffle; per-group state is the user's
    * own event list (bounded by per-user activity, truncated on
    * aggregation output) — no window over data, no global sort. */
  def q143Trajectories(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import graft.functions.TextFunctions.polyHash
    // rank-filter BEFORE collecting: row_number runs in the spillable
    // window operator, so a pathological heavy user degrades to disk —
    // a groupBy collect_list of the full history would instead grow an
    // in-memory array per user. The groupBy after the filter collects at
    // most 20 rows per user, and its exchange reuses the window's
    // user_id partitioning (one real shuffle).
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts", $"event_id")
    val first = events(s, d)
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .withColumn("rn", row_number().over(w)).filter($"rn" <= 20)
    val seqs = first.groupBy($"user_id").agg(
      concat_ws(">", expr(
        "transform(array_sort(collect_list(struct(rn, event_type))), " +
          "x -> x.event_type)")).as("seq"))
    events(s, d).groupBy($"user_id").agg(count(lit(1)).as("n_events"))
      .join(seqs, Seq("user_id"))
      .select($"user_id", $"n_events", $"seq",
        polyHash($"seq").as("seq_hash"))
      .orderBy($"user_id")
  }

  val q143Sql: String =
    s"""SELECT user_id, count(*)::BIGINT AS n_events,
       |  array_to_string(list(event_type ORDER BY ts, event_id)[1:20], '>')
       |    AS seq,
       |  ${DuckSql.polyHashSql(
            "array_to_string(list(event_type ORDER BY ts, event_id)[1:20], '>')")}
       |    AS seq_hash
       |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  /** q153: EMBARGOED temporal split — backtest hygiene for event data:
    * train takes everything before (cutoff − embargo), validation takes
    * everything from cutoff on, and the embargo gap rows are DISCARDED so
    * nothing whose influence straddles the boundary (sessions in flight,
    * labels computed over trailing windows) leaks across. Cutoff = 80 %
    * of the observed time range, embargo = 1 day — both exact integer
    * µs arithmetic from one min/max pre-aggregation, so the split is
    * reproducible forever. Reports per split: events, users, and the
    * actual time bounds. */
  def q153EmbargoSplit(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val e = events(s, d).select($"user_id", unix_micros($"ts").as("us"))
    val mm = e.agg(min($"us"), max($"us")).head()
    // no events → no min/max → no cutoff: an empty split report (the
    // oracle's GROUP BY over zero rows is empty too)
    if (mm.isNullAt(0))
      return Seq.empty[(String, Long, Long, Long, Long)]
        .toDF("split", "n_events", "n_users", "min_us", "max_us")
    val (lo, hi) = (mm.getLong(0), mm.getLong(1))
    val cutoff = lo + (hi - lo) * 8 / 10
    val embargoUs = 86400000000L
    val tagged = e.withColumn("split",
      when($"us" < cutoff - embargoUs, "train")
        .when($"us" >= cutoff, "val")
        .otherwise("embargoed"))
    tagged.groupBy($"split")
      .agg(count(lit(1)).as("n_events"),
        countDistinct($"user_id").as("n_users"),
        min($"us").as("min_us"), max($"us").as("max_us"))
      .orderBy($"split")
  }

  val q153Sql: String =
    """WITH e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us
      |  FROM events),
      |b AS (SELECT min(us) AS lo, max(us) AS hi FROM e),
      |t AS (SELECT user_id, us,
      |    CASE WHEN us < lo + (hi - lo) * 8 // 10 - 86400000000 THEN 'train'
      |         WHEN us >= lo + (hi - lo) * 8 // 10 THEN 'val'
      |         ELSE 'embargoed' END AS split
      |  FROM e, b)
      |SELECT split, count(*)::BIGINT AS n_events,
      |  count(DISTINCT user_id)::BIGINT AS n_users,
      |  min(us) AS min_us, max(us) AS max_us
      |FROM t GROUP BY split ORDER BY split""".stripMargin

  // ---------------------------------------------------------------- q212

  /** q212: session-gap tuning — the histogram that JUSTIFIES a
    * sessionize timeout (q36/q80 hard-code 30 min; this query shows
    * where the knee in the inter-event-gap distribution actually sits).
    * Per-user consecutive gaps via one user-PARTITIONED lag window
    * (never global; ties broken by event_id so both engines see the
    * same neighbor), bucketed into the candidate-timeout bands, with
    * each band's share of all gaps. Gap math is exact integer
    * microseconds (`unix_micros`/`epoch_us`) — no float timestamp
    * arithmetic. The bands are static, so every count and the share
    * denominator fold in ONE aggregation row, stack()ed out to rows —
    * one scan, no total re-scan. */
  def q212GapHistogram(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts", $"event_id")
    val m = 60000000L // one minute in µs
    val gaps = events(s, d)
      .select($"user_id", $"ts", $"event_id")
      .withColumn("gap_us", unix_micros($"ts") - lag(unix_micros($"ts"), 1).over(w))
      .filter($"gap_us".isNotNull)
    // the bucket list is STATIC, so every band folds in ONE aggregation
    // row (conditional sums + the total share denominator) — one scan,
    // one agg, no second consumer, no total re-scan to dodge
    def inBand(lo: Long, hi: Long): Column =
      sum(when($"gap_us" >= lo && $"gap_us" < hi, 1L).otherwise(0L))
    val one = gaps.agg(
      inBand(Long.MinValue, 1L * m).as("a"), inBand(1L * m, 5L * m).as("b"),
      inBand(5L * m, 30L * m).as("c"), inBand(30L * m, 120L * m).as("d"),
      inBand(120L * m, Long.MaxValue).as("e"),
      count(lit(1)).as("n_total"))
    one.select(expr("stack(5, 'a_lt_1m', a, 'b_1_5m', b, 'c_5_30m', c, " +
        "'d_30m_2h', d, 'e_ge_2h', e) AS (gap_bucket, n_gaps)"), $"n_total")
      .select($"gap_bucket", $"n_gaps",
        roundp($"n_gaps" * lit(1.0) / $"n_total", 6).as("share"))
      .orderBy($"gap_bucket")
  }

  val q212Sql: String =
    s"""WITH g AS (SELECT epoch_us(ts) -
       |    lag(epoch_us(ts)) OVER (PARTITION BY user_id
       |      ORDER BY ts, event_id) AS gap_us
       |  FROM events),
       |one AS (SELECT
       |    sum(CASE WHEN gap_us < 60000000 THEN 1 ELSE 0 END)::BIGINT AS a,
       |    sum(CASE WHEN gap_us >= 60000000 AND gap_us < 300000000
       |      THEN 1 ELSE 0 END)::BIGINT AS b,
       |    sum(CASE WHEN gap_us >= 300000000 AND gap_us < 1800000000
       |      THEN 1 ELSE 0 END)::BIGINT AS c,
       |    sum(CASE WHEN gap_us >= 1800000000 AND gap_us < 7200000000
       |      THEN 1 ELSE 0 END)::BIGINT AS d,
       |    sum(CASE WHEN gap_us >= 7200000000 THEN 1 ELSE 0 END)::BIGINT
       |      AS e,
       |    count(*)::BIGINT AS n_total
       |  FROM g WHERE gap_us IS NOT NULL),
       |rows_ AS (
       |  SELECT 'a_lt_1m' AS gap_bucket, a AS n_gaps, n_total FROM one
       |  UNION ALL SELECT 'b_1_5m', b, n_total FROM one
       |  UNION ALL SELECT 'c_5_30m', c, n_total FROM one
       |  UNION ALL SELECT 'd_30m_2h', d, n_total FROM one
       |  UNION ALL SELECT 'e_ge_2h', e, n_total FROM one)
       |SELECT gap_bucket, n_gaps,
       |  ${DuckSql.roundpSql("n_gaps * 1.0 / n_total", 6)} AS share
       |FROM rows_ ORDER BY gap_bucket""".stripMargin

  // ---------------------------------------------------------------- q215

  /** q215: conversion-latency histogram — time from a user's FIRST
    * signup to their FIRST purchase, bucketed into the bands a
    * conversion-window / attribution policy would choose from. Both
    * firsts come from ONE per-user aggregation (conditional `min` per
    * event type — no join, no window); users whose first purchase
    * precedes signup or never purchase land in the explicit
    * `e_none_or_before` band rather than silently dropping. Exact
    * integer-µs math; the bands are static, so counts AND the share
    * denominator fold in one aggregation row (stack()ed out to rows) —
    * no second consumer, no total re-scan. Empty bands emit 0 rows
    * explicitly (a histogram with a hole is a report bug). */
  def q215ConversionLatency(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val firsts = events(s, d)
      .groupBy($"user_id")
      .agg(min(when($"event_type" === "signup", unix_micros($"ts")))
            .as("t_signup"),
        min(when($"event_type" === "purchase", unix_micros($"ts")))
            .as("t_purchase"))
    latencyBands(firsts)
  }

  /** The shared band fold of q215/q224: from a (t_signup, t_purchase)
    * per-user firsts frame (nullable µs), the latency histogram. The
    * band list is STATIC, so every band + the share denominator fold in
    * ONE aggregation row, stack()ed to rows — one pass, no total
    * re-scan. Both the batch and the streaming query end here, so their
    * band semantics cannot drift apart. */
  private[queries] def latencyBands(firsts0: DataFrame): DataFrame = {
    val s = firsts0.sparkSession
    import s.implicits._
    val m = 60000000L
    val firsts = firsts0.filter($"t_signup".isNotNull)
    val lat = $"t_purchase" - $"t_signup"
    def inBand(lo: Long, hi: Long): Column =
      sum(when($"t_purchase".isNotNull && lat >= lo && lat < hi, 1L)
        .otherwise(0L))
    val one = firsts.agg(
      inBand(0L, 10L * m).as("a"), inBand(10L * m, 120L * m).as("b"),
      inBand(120L * m, 1440L * m).as("c"),
      inBand(1440L * m, Long.MaxValue).as("d"),
      sum(when($"t_purchase".isNull || lat < 0L, 1L).otherwise(0L)).as("e"),
      count(lit(1)).as("n_signup"))
    one.select(expr("stack(5, 'a_lt_10m', a, 'b_10m_2h', b, 'c_2h_1d', c, " +
        "'d_ge_1d', d, 'e_none_or_before', e) AS (latency_bucket, n_users)"),
        $"n_signup")
      .select($"latency_bucket", $"n_users",
        roundp($"n_users" * lit(1.0) / $"n_signup", 6).as("share"))
      .orderBy($"latency_bucket")
  }

  val q215Sql: String =
    s"""WITH f AS (SELECT user_id,
       |    min(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END)
       |      AS t_signup,
       |    min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
       |      AS t_purchase
       |  FROM events GROUP BY 1),
       |one AS (SELECT
       |    sum(CASE WHEN t_purchase IS NOT NULL
       |      AND t_purchase - t_signup >= 0
       |      AND t_purchase - t_signup < 600000000
       |      THEN 1 ELSE 0 END)::BIGINT AS a,
       |    sum(CASE WHEN t_purchase IS NOT NULL
       |      AND t_purchase - t_signup >= 600000000
       |      AND t_purchase - t_signup < 7200000000
       |      THEN 1 ELSE 0 END)::BIGINT AS b,
       |    sum(CASE WHEN t_purchase IS NOT NULL
       |      AND t_purchase - t_signup >= 7200000000
       |      AND t_purchase - t_signup < 86400000000
       |      THEN 1 ELSE 0 END)::BIGINT AS c,
       |    sum(CASE WHEN t_purchase IS NOT NULL
       |      AND t_purchase - t_signup >= 86400000000
       |      THEN 1 ELSE 0 END)::BIGINT AS d,
       |    sum(CASE WHEN t_purchase IS NULL
       |      OR t_purchase - t_signup < 0 THEN 1 ELSE 0 END)::BIGINT AS e,
       |    count(*)::BIGINT AS n_signup
       |  FROM f WHERE t_signup IS NOT NULL),
       |rows_ AS (
       |  SELECT 'a_lt_10m' AS latency_bucket, a AS n_users, n_signup
       |    FROM one
       |  UNION ALL SELECT 'b_10m_2h', b, n_signup FROM one
       |  UNION ALL SELECT 'c_2h_1d', c, n_signup FROM one
       |  UNION ALL SELECT 'd_ge_1d', d, n_signup FROM one
       |  UNION ALL SELECT 'e_none_or_before', e, n_signup FROM one)
       |SELECT latency_bucket, n_users,
       |  ${DuckSql.roundpSql("n_users * 1.0 / n_signup", 6)} AS share
       |FROM rows_ ORDER BY latency_bucket""".stripMargin

  // ---------------------------------------------------------------- q225

  /** q225: RFM segmentation — users scored 1-5 on Recency (last-seen
    * DAY), Frequency (event count) and Monetary (value sum in whole
    * units), each against its own GLOBAL quintile boundaries, then the
    * segment census. The metrics are deliberately QUANTIZED (day-
    * granularity recency, unit-granularity money) so the exact
    * `percentile` aggregation runs over BOUNDED domains — its
    * per-buffer value map stays small and map-side combinable at any
    * row count, where raw-µs recency would make the single final
    * buffer |users|-sized (the global-window scale class). Boundaries
    * broadcast back as one row (never an ntile window) and round to
    * 6dp on BOTH engines before the bin compares, so an interpolated
    * boundary can't flip a bin by one ulp. The per-user frame is
    * persisted (two consumers: boundary agg + binning). */
  def q225RfmSegments(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val perUser = graft.ops.ScratchCache.register(events(s, d)
      .groupBy($"user_id")
      .agg(expr("max(unix_micros(ts)) div 86400000000").cast("double")
          .as("rec"),
        count(lit(1)).cast("double").as("freq"),
        round(sum($"value".cast("decimal(28,6)")).cast("double"))
          .as("mon"))
      .persist())
    // quartile bounds via the bounded radix selection (PercentileCut —
    // bit-identical interpolation, spec-pinned): the builtin percentile
    // over the CONTINUOUS mon/rec domains buffers ~|users| map entries
    // in one reduce task — the 100 TB single-buffer hazard. The cuts
    // come back as literals, so the broadcast row disappears; the
    // first radix job fills perUser's cache for everything after it.
    perUser.count()
    val qs = Seq(0.2, 0.4, 0.6, 0.8)
    val br = graft.ops.PercentileCut.cuts(perUser, "rec", qs)
    val bf = graft.ops.PercentileCut.cuts(perUser, "freq", qs)
    val bm = graft.ops.PercentileCut.cuts(perUser, "mon", qs)
    def score(m: Column, b: Seq[Double]): Column =
      b.map(c => when(m > roundp(lit(c), 6), 1L).otherwise(0L))
        .reduce(_ + _) + 1L
    perUser
      .select((score($"rec", br) * 100L + score($"freq", bf) * 10L +
        score($"mon", bm)).as("segment"))
      .groupBy($"segment")
      .agg(count(lit(1)).as("n_users"))
      .orderBy($"segment")
  }

  val q225Sql: String =
    s"""WITH u AS (SELECT user_id,
       |    (epoch_us(max(ts)) // 86400000000)::DOUBLE AS rec,
       |    count(*)::DOUBLE AS freq,
       |    round(CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE)) AS mon
       |  FROM events GROUP BY 1),
       |b AS (SELECT
       |    quantile_cont(rec, [0.2, 0.4, 0.6, 0.8]) AS br,
       |    quantile_cont(freq, [0.2, 0.4, 0.6, 0.8]) AS bf,
       |    quantile_cont(mon, [0.2, 0.4, 0.6, 0.8]) AS bm
       |  FROM u),
       |sc AS (SELECT
       |    (1 ${(1 to 4).map(i =>
            s"+ CASE WHEN rec > ${DuckSql.roundpSql(s"br[$i]", 6)} THEN 1 ELSE 0 END")
            .mkString(" ")}) * 100
       |  + (1 ${(1 to 4).map(i =>
            s"+ CASE WHEN freq > ${DuckSql.roundpSql(s"bf[$i]", 6)} THEN 1 ELSE 0 END")
            .mkString(" ")}) * 10
       |  + (1 ${(1 to 4).map(i =>
            s"+ CASE WHEN mon > ${DuckSql.roundpSql(s"bm[$i]", 6)} THEN 1 ELSE 0 END")
            .mkString(" ")}) AS segment
       |  FROM u CROSS JOIN b)
       |SELECT segment::BIGINT AS segment, count(*)::BIGINT AS n_users
       |FROM sc GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- q229

  /** q229: linear multi-touch attribution — each purchase's value split
    * equally across the user's clicks in the trailing 24 h, credited to
    * the click's hour-of-day: the "which hours drive revenue" report,
    * with an explicit hour = −1 row for unattributed purchases (no
    * touch in window) so the value column still totals the business
    * number. The touch join is user-keyed (shuffle on user_id, band
    * predicate as the residual — q50's stream-join shape in batch);
    * per-purchase touch counts are a pid-PARTITIONED window over the
    * (small) pair frame; allocations quantize to exact micro-units
    * (`round(value·10⁶/n)`) BEFORE summing, so the per-hour totals fold
    * in BIGINT and engine summation order cannot move a cent. */
  def q229Multitouch(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val h24 = 24L * 3600000000L
    val ev = events(s, d)
    val p = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id".as("pid"),
        unix_micros($"ts").as("pus"), $"value")
    val c = ev.filter($"event_type" === "click")
      .select($"user_id", hour($"ts").cast("bigint").as("click_hour"),
        unix_micros($"ts").as("cus"))
    val pairs = p.join(c, Seq("user_id"))
      .filter($"cus" <= $"pus" && $"cus" > $"pus" - h24)
      .select($"pid", $"value", $"click_hour")
    val wn = org.apache.spark.sql.expressions.Window.partitionBy($"pid")
    val alloc = pairs
      .withColumn("n", count(lit(1)).over(wn))
      .select($"click_hour",
        round($"value" * lit(1e6) / $"n").cast("bigint").as("micro"))
    val byHour = alloc.groupBy($"click_hour")
      .agg(count(lit(1)).as("n_touches"), sum($"micro").as("m"))
    val unattr = p
      .join(pairs.select($"pid").distinct(), Seq("pid"), "left_anti")
      .agg(count(lit(1)).as("n_touches"),
        sum(round($"value" * lit(1e6)).cast("bigint")).as("m"))
      .select(lit(-1L).as("click_hour"), $"n_touches", $"m")
    byHour.unionByName(unattr)
      .select($"click_hour", $"n_touches",
        roundp($"m" / lit(1e6), 2).as("attributed_rev"))
      .orderBy($"click_hour")
  }

  val q229Sql: String =
    s"""WITH p AS (SELECT user_id, event_id AS pid, epoch_us(ts) AS pus,
       |    value FROM events WHERE event_type = 'purchase'),
       |c AS (SELECT user_id, hour(ts)::BIGINT AS click_hour,
       |    epoch_us(ts) AS cus FROM events WHERE event_type = 'click'),
       |pairs AS (SELECT pid, value, click_hour
       |  FROM p JOIN c USING (user_id)
       |  WHERE cus <= pus AND cus > pus - 86400000000),
       |alloc AS (SELECT click_hour,
       |    round(value * 1e6 / (count(*) OVER (PARTITION BY pid)))::BIGINT
       |      AS micro
       |  FROM pairs),
       |byh AS (SELECT click_hour, count(*)::BIGINT AS n_touches,
       |    sum(micro)::BIGINT AS m FROM alloc GROUP BY 1),
       |un AS (SELECT -1::BIGINT AS click_hour, count(*)::BIGINT AS n_touches,
       |    sum(round(value * 1e6)::BIGINT)::BIGINT AS m
       |  FROM p WHERE pid NOT IN (SELECT pid FROM pairs))
       |SELECT click_hour, n_touches,
       |  ${DuckSql.roundpSql("m / 1e6", 2)} AS attributed_rev
       |FROM (SELECT * FROM byh UNION ALL SELECT * FROM un)
       |ORDER BY click_hour""".stripMargin

  // ---------------------------------------------------------------- q230

  /** q230: exponentially-decayed activity ranking — per event type, the
    * half-life-weighted event mass (τ½ = 7 days against the corpus'
    * max timestamp): the "what's trending NOW" view that a plain count
    * can't give because it weighs a year-old click like yesterday's.
    * Every per-event weight 2^(−age/τ½) quantizes to nano-units
    * (`round(w·10⁹)`) BEFORE the sum, so the fold is exact BIGINT and
    * engine reduction order cannot move the output. (Known residual:
    * pow itself is 1-ulp-accurate, not correctly rounded, so JVM and
    * libm can disagree by one nano-unit when w·10⁹ sits within an ulp
    * of a .5 boundary — a fixture-static, per-host-deterministic
    * effect, bounded at 10⁻⁹ per event and invisible at the 4dp
    * output; unlike a raw double fold it can never drift per-run.) The reference "now" is a
    * 1-row max broadcast (one cheap column scan — parquet min/max
    * stats serve it in a stats-aware reader). */
  def q230DecayedRank(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val halfLifeUs = 7.0 * 86400000000.0
    val ev = events(s, d).select($"event_type", unix_micros($"ts").as("us"))
    val now = ev.agg(max($"us").as("now_us"))
    val w = pow(lit(0.5), ($"now_us" - $"us").cast("double") / halfLifeUs)
    ev.crossJoin(broadcast(now))
      .select($"event_type", round(w * lit(1e9)).cast("bigint").as("nw"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_events"),
        roundp(sum($"nw") / lit(1e9), 4).as("decayed_mass"))
      .orderBy($"decayed_mass".desc, $"event_type")
  }

  val q230Sql: String =
    s"""WITH e AS (SELECT event_type, epoch_us(ts) AS us FROM events),
       |n AS (SELECT max(us) AS now_us FROM e)
       |SELECT event_type, count(*)::BIGINT AS n_events,
       |  ${DuckSql.roundpSql(
            "sum(round(pow(0.5, (now_us - us)::DOUBLE / 604800000000.0) " +
            "* 1e9)::BIGINT) / 1e9", 4)} AS decayed_mass
       |FROM e CROSS JOIN n GROUP BY event_type
       |ORDER BY decayed_mass DESC, event_type""".stripMargin

  // ---------------------------------------------------------------- q232

  /** q232: peak demand window (Kadane via running windows) — per event
    * type, the maximum-sum contiguous DAY RANGE of demeaned daily value
    * (the stretch that most outperformed that type's average day): max
    * subarray = prefix_d − min(0, min of earlier prefixes), all from
    * type-PARTITIONED ordered windows — the linear-scan algorithm
    * expressed relationally, no self-join over day pairs (the naive
    * all-ranges form is |days|² per type). Exactness: daily masses and
    * the mean derive from DECIMAL sums; per-day deviations quantize to
    * exact micro-units BEFORE the running sums, so every window fold is
    * integer. */
  def q232BestRun(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val W = org.apache.spark.sql.expressions.Window
    val daily = events(s, d)
      .groupBy($"event_type", to_date($"ts").as("day"))
      .agg(sum($"value".cast("decimal(28,6)")).as("dv"))
    val wType = W.partitionBy($"event_type")
    val demeaned = daily
      .withColumn("mean",
        sum($"dv").over(wType).cast("double") /
          count(lit(1)).over(wType).cast("double"))
      .select($"event_type", $"day",
        round(($"dv".cast("double") - $"mean") * lit(1e6)).cast("bigint")
          .as("dev"))
    val wRun = wType.orderBy($"day")
    val cand = demeaned
      .withColumn("prefix", sum($"dev").over(
        wRun.rowsBetween(W.unboundedPreceding, W.currentRow)))
      .withColumn("min_prior", min($"prefix").over(
        wRun.rowsBetween(W.unboundedPreceding, -1)))
      .select($"event_type",
        ($"prefix" - least(coalesce($"min_prior", lit(0L)), lit(0L)))
          .as("c"))
    cand.groupBy($"event_type")
      .agg(count(lit(1)).as("n_days"),
        roundp(max($"c") / lit(1e6), 2).as("best_run"))
      .orderBy($"event_type")
  }

  val q232Sql: String =
    s"""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
       |    sum(CAST(value AS DECIMAL(28,6))) AS dv
       |  FROM events GROUP BY 1, 2),
       |dm AS (SELECT event_type, day,
       |    round((dv::DOUBLE
       |      - CAST(sum(dv) OVER (PARTITION BY event_type) AS DOUBLE)
       |        / (count(*) OVER (PARTITION BY event_type))::DOUBLE)
       |      * 1e6)::BIGINT AS dev
       |  FROM daily),
       |pfx AS (SELECT event_type, day,
       |    sum(dev) OVER (PARTITION BY event_type ORDER BY day
       |      ROWS UNBOUNDED PRECEDING) AS prefix
       |  FROM dm),
       |pf AS (SELECT event_type, prefix,
       |    min(prefix) OVER (PARTITION BY event_type ORDER BY day
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |      AS min_prior
       |  FROM pfx)
       |SELECT event_type, count(*)::BIGINT AS n_days,
       |  ${DuckSql.roundpSql(
            "max(prefix - least(coalesce(min_prior, 0), 0)) / 1e6", 2)}
       |    AS best_run
       |FROM pf GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q233

  /** q233: single change-point detection — per event type, the day
    * split that maximizes |mean(before) − mean(after)| of daily event
    * counts (binary segmentation's first cut, the "when did the rate
    * change" question). Every split is scored from ONE prefix-sum pass
    * (type-PARTITIONED running window over daily counts — never a
    * |days|² self-join of candidate splits), the argmax is a rank
    * window on a quantized score with the day as the deterministic
    * tiebreak, and all means derive from exact BIGINT prefix sums. */
  def q233Changepoint(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val W = org.apache.spark.sql.expressions.Window
    val daily = events(s, d)
      .groupBy($"event_type", to_date($"ts").as("day"))
      .agg(count(lit(1)).as("c"))
    val wT = W.partitionBy($"event_type")
    val wRun = wT.orderBy($"day")
    val scored = daily
      .withColumn("i", row_number().over(wRun).cast("bigint"))
      .withColumn("p", sum($"c").over(
        wRun.rowsBetween(W.unboundedPreceding, W.currentRow)))
      .withColumn("n", count(lit(1)).over(wT))
      .withColumn("t", sum($"c").over(wT))
      .filter($"i" < $"n") // a split needs a non-empty right side
      .withColumn("mean_l", $"p".cast("double") / $"i".cast("double"))
      .withColumn("mean_r", ($"t" - $"p").cast("double") /
        ($"n" - $"i").cast("double"))
      .withColumn("delta", abs($"mean_l" - $"mean_r"))
    val best = scored
      .withColumn("rn", row_number().over(wT.orderBy(
        round($"delta" * 1e9).cast("bigint").desc, $"day")))
      .filter($"rn" === 1)
    best.select($"event_type", $"day".as("split_after"),
        $"n".as("n_days"),
        roundp($"mean_l", 4).as("mean_before"),
        roundp($"mean_r", 4).as("mean_after"),
        roundp($"delta", 4).as("delta"))
      .orderBy($"event_type")
  }

  val q233Sql: String =
    s"""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
       |    count(*)::BIGINT AS c FROM events GROUP BY 1, 2),
       |sc AS (SELECT event_type, day,
       |    row_number() OVER (PARTITION BY event_type ORDER BY day)
       |      ::BIGINT AS i,
       |    sum(c) OVER (PARTITION BY event_type ORDER BY day
       |      ROWS UNBOUNDED PRECEDING) AS p,
       |    count(*) OVER (PARTITION BY event_type)::BIGINT AS n,
       |    sum(c) OVER (PARTITION BY event_type)::BIGINT AS t
       |  FROM daily),
       |m AS (SELECT event_type, day, n,
       |    p::DOUBLE / i::DOUBLE AS mean_l,
       |    (t - p)::DOUBLE / (n - i)::DOUBLE AS mean_r,
       |    abs(p::DOUBLE / i::DOUBLE
       |      - (t - p)::DOUBLE / (n - i)::DOUBLE) AS delta
       |  FROM sc WHERE i < n),
       |b AS (SELECT *, row_number() OVER (PARTITION BY event_type
       |    ORDER BY round(delta * 1e9)::BIGINT DESC, day) AS rn FROM m)
       |SELECT event_type, day AS split_after, n AS n_days,
       |  ${DuckSql.roundpSql("mean_l", 4)} AS mean_before,
       |  ${DuckSql.roundpSql("mean_r", 4)} AS mean_after,
       |  ${DuckSql.roundpSql("delta", 4)} AS delta
       |FROM b WHERE rn = 1 ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q234

  /** q234: weekly-seasonality strength — per event type, the fraction
    * of daily-value variance explained by the day-of-week profile:
    * 1 − SS_resid/SS_total with SS_total = Σx² − (Σx)²/n and
    * SS_resid = Σx² − Σ_dow S²_dow/n_dow (the one-way-ANOVA identity —
    * two aggregations, no per-day mean join). Day-of-week is the
    * calendar-neutral `days-since-epoch mod 7` (Spark's dayofweek and
    * DuckDB's dayofweek disagree on numbering; integer date math
    * doesn't). Daily masses quantize to cents, so Σx and Σx² fold in
    * exact integers; only the ≤7-term dow fold and the final ratio are
    * doubles (identical expressions both engines, 6dp output). */
  def q234Seasonality(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val daily = events(s, d)
      .groupBy($"event_type", to_date($"ts").as("day"))
      .agg(round(sum($"value".cast("decimal(28,6)")).cast("double") *
        lit(100.0)).cast("bigint").as("xc"))
      .withColumn("dow", pmod(datediff($"day", lit("1970-01-01")), lit(7)))
    val byDow = daily.groupBy($"event_type", $"dow")
      .agg(sum($"xc").as("sd"), count(lit(1)).as("nd"),
        sum(($"xc" * $"xc").cast("decimal(38,0)")).as("sq"))
    // the ≤7-term S²/n fold quantizes each term to 10⁶-cent² units —
    // identical doubles per term in both engines, and the quantized
    // integral doubles sum exactly (multi-row raw-double sums are
    // reduction-order-sensitive). Zero-variance groups (one day, or a
    // constant series) yield null, not 0/0 NaN.
    val agg = byDow.groupBy($"event_type")
      .agg(sum($"nd").as("n_days"), sum($"sd").as("sx"),
        sum($"sq").as("sumsq"),
        (sum(round($"sd".cast("double") * $"sd".cast("double") /
          $"nd".cast("double") / lit(1e6))) * lit(1e6)).as("dow_term"))
    val ssTot = $"sumsq".cast("double") -
      $"sx".cast("double") * $"sx".cast("double") / $"n_days".cast("double")
    agg.select($"event_type", $"n_days",
        when(ssTot > 0.0,
          roundp((lit(1.0) - ($"sumsq".cast("double") - $"dow_term") /
            ssTot) * lit(1.0), 6)).as("dow_strength"))
      .orderBy($"event_type")
  }

  val q234Sql: String =
    s"""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
       |    round(CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
       |      * 100.0)::BIGINT AS xc
       |  FROM events GROUP BY 1, 2),
       |dw AS (SELECT event_type,
       |    ((day - DATE '1970-01-01') % 7 + 7) % 7 AS dow, xc FROM daily),
       |bd AS (SELECT event_type, dow, sum(xc)::BIGINT AS sd,
       |    count(*)::BIGINT AS nd,
       |    sum(CAST(xc * xc AS DECIMAL(38,0))) AS sq
       |  FROM dw GROUP BY 1, 2),
       |a AS (SELECT event_type, sum(nd)::BIGINT AS n_days,
       |    sum(sd)::BIGINT AS sx, sum(sq) AS sumsq,
       |    sum(round(sd::DOUBLE * sd::DOUBLE / nd::DOUBLE / 1e6)) * 1e6
       |      AS dow_term
       |  FROM bd GROUP BY 1)
       |SELECT event_type, n_days,
       |  CASE WHEN sumsq::DOUBLE
       |      - sx::DOUBLE * sx::DOUBLE / n_days::DOUBLE > 0.0 THEN
       |    ${DuckSql.roundpSql(
            "(1.0 - (sumsq::DOUBLE - dow_term) / (sumsq::DOUBLE " +
            "- sx::DOUBLE * sx::DOUBLE / n_days::DOUBLE)) * 1.0", 6)}
       |  END AS dow_strength
       |FROM a ORDER BY event_type""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q233_changepoint" -> (q233Changepoint _),
    "q234_seasonality" -> (q234Seasonality _),
    "q232_best_run" -> (q232BestRun _),
    "q230_decayed_rank" -> (q230DecayedRank _),
    "q229_multitouch" -> (q229Multitouch _),
    "q225_rfm_segments" -> (q225RfmSegments _),
    "q215_conversion_latency" -> (q215ConversionLatency _),
    "q212_gap_histogram"  -> (q212GapHistogram _),
    "q143_trajectories"   -> (q143Trajectories _),
    "q153_embargo_split"  -> (q153EmbargoSplit _),
    "q106_max_concurrent" -> (q106MaxConcurrent _),
    "q107_group_regression" -> (q107GroupRegression _),
    "q97_gap_fill"       -> (q97GapFill _),
    "q100_transitions"   -> (q100Transitions _),
    "q77_sliding_window" -> (q77SlidingWindow _),
    "q78_funnel"         -> (q78Funnel _),
    "q79_cohort"         -> (q79Cohort _),
    "q84_scd2"           -> (q84Scd2 _),
    "q85_grouping_sets"  -> (q85GroupingSets _),
    "q86_set_ops"        -> (q86SetOps _),
    "q110_drift_psi"     -> (q110DriftPsi _),
  )

  val oracles: Map[String, String] = Map(
    "q233_changepoint" -> q233Sql,
    "q234_seasonality" -> q234Sql,
    "q232_best_run" -> q232Sql,
    "q230_decayed_rank" -> q230Sql,
    "q229_multitouch" -> q229Sql,
    "q225_rfm_segments" -> q225Sql,
    "q215_conversion_latency" -> q215Sql,
    "q212_gap_histogram" -> q212Sql,
    "q143_trajectories"   -> q143Sql,
    "q153_embargo_split"  -> q153Sql,
    "q106_max_concurrent" -> q106Sql,
    "q107_group_regression" -> q107Sql,
    "q97_gap_fill"       -> q97Sql,
    "q100_transitions"   -> q100Sql,
    "q77_sliding_window" -> q77Sql,
    "q78_funnel"         -> q78Sql,
    "q79_cohort"         -> q79Sql,
    "q84_scd2"           -> q84Sql,
    "q85_grouping_sets"  -> q85Sql,
    "q86_set_ops"        -> q86Sql,
    "q110_drift_psi"     -> q110Sql,
  )
}
