package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.{documents, events, lineitem}
import graft.functions.TextFunctions
import graft.ops.Sketches

/** Sketch-aggregate coverage: one-pass mergeable summaries (quantile
  * sketch, heavy hitters) whose outputs are gated by STRONGER-than-usual
  * oracles — q59 validates the sketch's rank-error guarantee with an exact
  * in-engine rank pass (the oracle pins group sizes and asserts the bound
  * held), and q61's sketch is candidate-generation only, with an exact
  * counting pass making the final answer EQUAL to the brute-force SQL.
  */
object SketchQueries {

  private val Q59Ps = Seq(0.01, 0.25, 0.5, 0.75, 0.99)
  /** Validated rank tolerance. KllSketch(256)'s deterministic worst case is
    * levels·n/k ranks ≈ 1.5 % of n at any realizable n (Sketches.scala) —
    * 0.05 is a 3× safety margin on the GUARANTEE, not an observed error. */
  private val Q59Eps = 0.05

  /** q59: streaming-friendly quantile profile — a deterministic KLL-style
    * sketch per event_type (one hash-aggregate pass, map-side combine,
    * O(k·log n) state per group), then an exact rank pass over the same
    * table validates every estimate: ok ⇔ the true rank interval of the
    * estimate is within Q59Eps of p. The oracle pins (event_type, p, n)
    * exactly and asserts ok = true — i.e. DuckDB confirms the error bound
    * CLAIM, the engine proves it empirically. Contrast q57 (exact
    * percentiles, sort-based): this is the form that survives groups whose
    * value mass exceeds executor memory. */
  def q59QuantileSketch(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = events(s, d).select($"event_type", $"value")
    val sketched = ev.as[(String, Double)]
      .groupByKey(_._1).mapValues(_._2)
      .agg(new Sketches.KllAgg(256, Q59Ps).toColumn.name("q"))
      .collect() // one row per event_type — bounded by group cardinality
    val est = sketched.flatMap { case (et, (n, qs)) =>
      Q59Ps.zip(qs).map { case (p, e) => (et, p, e) }
    }.toSeq.toDF("event_type", "p", "est")
    ev.join(broadcast(est), "event_type")
      .groupBy($"event_type", $"p")
      .agg(count(lit(1)).as("n"),
        sum(when($"value" < $"est", 1L).otherwise(0L)).as("lo"),
        sum(when($"value" <= $"est", 1L).otherwise(0L)).as("hi"))
      .select($"event_type", $"p", $"n",
        ($"p" >= $"lo" / $"n" - Q59Eps && $"p" <= $"hi" / $"n" + Q59Eps)
          .as("ok"))
      .orderBy($"event_type", $"p")
  }

  val q59Sql: String =
    """SELECT event_type, CAST(p AS DOUBLE) AS p, count(*) AS n, true AS ok
      |FROM events CROSS JOIN
      |  (SELECT unnest([0.01, 0.25, 0.5, 0.75, 0.99]) AS p) ps
      |GROUP BY event_type, p ORDER BY event_type, p""".stripMargin

  /** Output threshold (fraction of all tokens) and sketch width for q61.
    * Guarantee chain: MisraGries(512) retains every token with frequency
    * > n/513 ≈ 0.195 % < 0.5 %, so the candidate set is a superset of the
    * answer; the exact counting pass then filters with true counts —
    * output ≡ the plain GROUP BY/HAVING oracle. */
  private[queries] val Q61Phi = 0.005
  private[queries] val Q61K = 512

  /** q61: corpus heavy hitters — tokens exceeding 0.5 % of all tokens.
    * Pass 1 is one Misra-Gries hash aggregate (map-side combine, ≤ k
    * counters of state anywhere); pass 2 counts ONLY the ≤ k candidates
    * exactly (map-side filter, shuffle bounded by k×partitions, versus the
    * full-vocabulary shuffle of a naive GROUP BY — the scale win at 100 TB,
    * where the vocabulary is billions of keys but candidates fit in a
    * broadcast). */
  def q61HeavyHitters(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val toks = documents(s, d)
      .select(explode(TextFunctions.tokens($"text")).as("w"))
    val (n, cands) = toks.as[String]
      .select(new Sketches.MisraGriesAgg(Q61K).toColumn.name("mg"))
      .head()
    val candidates = cands.map(_._1)
    toks.filter($"w".isInCollection(candidates))
      .groupBy($"w").agg(count(lit(1)).as("c"))
      .filter($"c" > lit(n) * Q61Phi)
      .orderBy($"c".desc, $"w")
  }

  val q61Sql: String =
    s"""WITH tok AS (SELECT unnest(${DuckSql.tokensSql}) AS w FROM documents),
       |tot AS (SELECT count(*) AS n FROM tok)
       |SELECT w, count(*) AS c FROM tok, tot
       |GROUP BY w, n HAVING count(*) > n * $Q61Phi
       |ORDER BY c DESC, w""".stripMargin

  /** Relative-error tolerance for q62. HLL with p=13 (8 KiB of state) has
    * σ ≈ 1.04/√8192 ≈ 1.15 %; 0.05 is >4σ. The estimate is DETERMINISTIC
    * per dataset (fixed xxhash64, order-free register max), so a pass at
    * the gate's SF is reproducible, not a lucky draw re-rolled per run. */
  private val Q62Eps = 0.05

  /** q62: cardinality profile — distinct counts of four key columns via a
    * HyperLogLog aggregate (one pass, 8 KiB mergeable state per column,
    * map-side combine), each validated against the exact distinct count.
    * The exact pass exists only to PROVE the estimate to the oracle —
    * production reads the sketch alone, which is the only form that
    * profiles a 100 TB column without a vocabulary-sized shuffle (exact
    * distinct shuffles every unique value; HLL ships 2^p bytes/task). */
  def q62CardinalitySketch(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // one tagged union → ONE sketch aggregation + ONE exact-distinct
    // aggregation for all four columns (not 2 jobs per column): per-job
    // fixed cost dominates profile queries at any scale
    val cols: Seq[(DataFrame, String, String)] = Seq(
      (documents(s, d), "text", "documents.text"),
      (events(s, d), "user_id", "events.user_id"),
      (lineitem(s, d), "l_orderkey", "lineitem.l_orderkey"),
      (lineitem(s, d), "l_partkey", "lineitem.l_partkey"))
    val tagged = cols.map { case (df, c, tag) =>
        df.select(lit(tag).as("col"), xxhash64(col(c)).as("h"))
      }.reduce(_.unionAll(_))
    // untyped udaf keeps the scan→union→partial-agg pipeline inside
    // WholeStageCodegen (the typed groupByKey form deserialized every row
    // out of Tungsten first — measured 3.4 s vs 2.3 s for the whole query
    // at sf1, 13 M tagged rows)
    val hllU = udaf(new Sketches.HllAgg(13),
      org.apache.spark.sql.Encoders.scalaLong)
    val ests = tagged.groupBy($"col").agg(hllU($"h").as("est"))
      .as[(String, Long)].collect().toMap
    // exact distincts come from the VALUES, not the hashes (collisions);
    // one ACTION: the per-table scalar aggregates cross-join into a single
    // 1-row plan, so their stages run concurrently instead of 4 jobs
    val exactRow = cols.map { case (df, c, tag) =>
        df.agg(countDistinct(col(c)).as(tag.replace('.', '_')))
      }.reduce(_.crossJoin(_)).head()
    val exacts = cols.zipWithIndex.map { case ((_, _, tag), i) =>
      tag -> exactRow.getLong(i)
    }.toMap
    cols.map { case (_, _, tag) =>
      val exact = exacts(tag)
      // empty tables: the sketch aggregation emits no group at all —
      // estimate 0, and a 0-distinct column is ok iff the sketch says 0
      val est = ests.getOrElse(tag, 0L)
      val ok = if (exact == 0L) est == 0L
               else math.abs(est - exact).toDouble / exact <= Q62Eps
      (tag, exact, ok)
    }.toDF("col", "exact_n", "ok").orderBy($"col")
  }

  val q62Sql: String =
    """SELECT * FROM (
      |  SELECT 'documents.text' AS col, count(DISTINCT text) AS exact_n,
      |    true AS ok FROM documents
      |  UNION ALL SELECT 'events.user_id', count(DISTINCT user_id), true
      |    FROM events
      |  UNION ALL SELECT 'lineitem.l_orderkey', count(DISTINCT l_orderkey),
      |    true FROM lineitem
      |  UNION ALL SELECT 'lineitem.l_partkey', count(DISTINCT l_partkey),
      |    true FROM lineitem)
      |ORDER BY col""".stripMargin

  /** q69: one-pass corpus profile — the "describe this 100 TB table"
    * report: per source, row count + distinct-text HLL + n_chars median
    * KLL, ALL from a single hash aggregation (mixed UDAF columns share
    * the grouping pass; each ships constant-size state). Validation joins
    * exact distincts and an exact rank pass per group; the oracle pins
    * (source, n_docs, distinct_texts) and asserts both sketch claims. */
  def q69Profile(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val hll = udaf(new Sketches.HllAgg(13),
      org.apache.spark.sql.Encoders.scalaLong)
    val kll = udaf(new Sketches.KllAgg(256, Seq(0.5)),
      org.apache.spark.sql.Encoders.scalaDouble)
    val docs = documents(s, d)
    val prof = docs.groupBy($"source").agg(
      count(lit(1)).as("n_docs"),
      hll(xxhash64($"text")).as("hd"),
      kll($"n_chars".cast("double")).as("kq"),
      countDistinct($"text").as("distinct_texts"))
      .select($"source", $"n_docs", $"distinct_texts", $"hd",
        element_at($"kq._2", 1).as("med_est"))
    docs.join(broadcast(prof), "source")
      .groupBy($"source", $"n_docs", $"distinct_texts", $"hd", $"med_est")
      .agg(
        sum(when($"n_chars" < $"med_est", 1L).otherwise(0L)).as("lo"),
        sum(when($"n_chars" <= $"med_est", 1L).otherwise(0L)).as("hi"))
      .select($"source", $"n_docs", $"distinct_texts",
        (abs($"hd" - $"distinct_texts") <= $"distinct_texts" * Q62Eps &&
          lit(0.5) >= $"lo" / $"n_docs" - Q59Eps &&
          lit(0.5) <= $"hi" / $"n_docs" + Q59Eps).as("ok"))
      .orderBy($"source")
  }

  val q69Sql: String =
    """SELECT source, count(*) AS n_docs,
      |  count(DISTINCT text) AS distinct_texts, true AS ok
      |FROM documents GROUP BY source ORDER BY source""".stripMargin

  /** q157: COUNT-MIN point-frequency estimates — the sketch you consult
    * when the exact (term → count) table is too big to keep: "roughly how
    * often does THIS token occur" in O(d·w) memory. The query builds the
    * 4×256 sketch over every token occurrence in ONE map-side-combined
    * aggregation, then evaluates the 20 true heaviest tokens against it:
    * (token, exact, estimate, overcount). The sketch's hashes are LCG
    * mixes of the 32-bit polyhash, so the ORACLE REPLAYS THE ENTIRE
    * SKETCH in SQL (bucket sums of exact counts == the sketch's counters)
    * and the one-sided error contract (estimate ≥ exact, always) is
    * hash-checked, not just spec-asserted.
    *
    * Scale shape: the sketch aggregation ships one 8 KiB counter matrix
    * per map task; the exact top-20 pass exists only to EVALUATE the
    * sketch (at 100 TB you'd feed it q61's Misra-Gries candidates
    * instead of an exact GROUP BY). Estimates are evaluated as plain
    * column arithmetic over the broadcast counter array — no UDF. */
  def q157CountMin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val (dRows, wCols) = (4, 256)
    val cm = udaf(new Sketches.CountMinAgg(dRows, wCols),
      org.apache.spark.sql.Encoders.scalaLong)
    val toks = documents(s, d)
      .select(explode(TextFunctions.tokens($"text")).as("w"))
      .select($"w", graft.functions.HashExpressions.polyHash32($"w").as("h"))
    val sketch = toks.agg(cm($"h").as("counts"))
    val top = toks.groupBy($"w", $"h").agg(count(lit(1)).as("n_exact"))
      .orderBy($"n_exact".desc, $"w").limit(20)
    val est = (0 until dRows).map { j =>
      element_at($"counts",
        shiftright((($"h" * lit(Sketches.CountMin.A(j)) + lit(12345L))
          % lit(2147483648L)) * lit(wCols), 31).cast("int")
          + lit(j * wCols) + lit(1))
    }.reduce(least(_, _))
    top.crossJoin(broadcast(sketch))
      .select($"w", $"n_exact", est.as("n_est"))
      .withColumn("overcount", $"n_est" - $"n_exact")
      .orderBy($"n_exact".desc, $"w")
  }

  val q157Sql: String = {
    val toks = DuckSql.tokensSql
    val ph = DuckSql.polyHashSql("w")
    s"""WITH toks AS (SELECT unnest($toks) AS w FROM documents),
       |counts AS (SELECT w, CAST(count(*) AS BIGINT) AS n_exact
       |  FROM toks GROUP BY 1),
       |hashed AS (SELECT w, n_exact, $ph AS h FROM counts),
       |js AS (SELECT unnest(range(0, 4)) AS j,
       |    unnest([1103515245, 1664525, 69069, 22695477]) AS a),
       |cells AS (SELECT js.j,
       |    (((h * js.a + 12345) % 2147483648) * 256) >> 31 AS b,
       |    CAST(sum(n_exact) AS BIGINT) AS bs
       |  FROM hashed CROSS JOIN js GROUP BY 1, 2),
       |top AS (SELECT w, n_exact, h,
       |    row_number() OVER (ORDER BY n_exact DESC, w) AS rk
       |  FROM hashed QUALIFY rk <= 20)
       |SELECT t.w, t.n_exact, CAST(min(c.bs) AS BIGINT) AS n_est,
       |  CAST(min(c.bs) - t.n_exact AS BIGINT) AS overcount
       |FROM top t JOIN js ON true
       |  JOIN cells c ON c.j = js.j
       |    AND c.b = (((t.h * js.a + 12345) % 2147483648) * 256) >> 31
       |GROUP BY t.w, t.n_exact
       |ORDER BY t.n_exact DESC, t.w""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q157_countmin"       -> (q157CountMin _),
    "q59_quantile_sketch" -> (q59QuantileSketch _),
    "q61_heavy_hitters"   -> (q61HeavyHitters _),
    "q62_cardinality"     -> (q62CardinalitySketch _),
    "q69_profile"         -> (q69Profile _),
  )

  val oracles: Map[String, String] = Map(
    "q157_countmin"       -> q157Sql,
    "q59_quantile_sketch" -> q59Sql,
    "q61_heavy_hitters"   -> q61Sql,
    "q62_cardinality"     -> q62Sql,
    "q69_profile"         -> q69Sql,
  )
}
