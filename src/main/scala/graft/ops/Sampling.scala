package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.polyHash

/** Training-mix sampling and pseudonymization — the two data-governance
  * operators of an LLM data pipeline (rebalancing source/language mixes,
  * and stripping direct identifiers before training).
  *
  * Both are pure per-row column expressions: no shuffle, no state, no
  * RNG — a resampled 100 TB corpus is one codegen'd scan, and reruns
  * (or two engines) produce byte-identical output.
  */
object Sampling {

  /** The per-row rate lookup expression shared by the gate and any
    * caller reporting the applied rate — ONE builder so the reported and
    * applied rates cannot drift. */
  def rateColumn(stratum: String, rates: Map[String, Double]): Column =
    rates.toSeq.sortBy(_._1).foldLeft(lit(0.0)) {
      case (acc, (s, r)) => when(col(stratum) === s, lit(r)).otherwise(acc)
    }

  /** Deterministic stratified sampling: keep a row iff
    * `hash(key ‖ salt) mod granularity < rate(stratum) · granularity`.
    *
    * The gate is a pure function of the ROW (not of partitioning, row
    * order, or an RNG seed), so samples are reproducible, stable under
    * repartitioning, and consistent across reruns — the properties mix
    * rebalancing needs when a corpus is rebuilt incrementally. Rows in
    * strata missing from `rates` are dropped (rate 0). */
  def stratifiedSample(df: DataFrame, stratum: String, key: Column,
                       rates: Map[String, Double], salt: String,
                       granularity: Long = 10000L): DataFrame = {
    require(rates.values.forall(r => r >= 0.0 && r <= 1.0), "rates in [0,1]")
    df.filter(
      pmod(polyHash(concat(key, lit(salt))), lit(granularity)).cast("double")
        < rateColumn(stratum, rates) * granularity)
  }

  /** Deterministic pseudonym token for a direct identifier: a keyed hash —
    * the same (value, salt) always maps to the same token, so joins on the
    * pseudonym still work, but the raw identifier never leaves the scan. */
  def tokenize(c: Column, salt: String): Column =
    polyHash(concat(c, lit(salt)))

  /** Generalize a numeric quasi-identifier to its band floor (k-anonymity
    * style coarsening: 1234.56 → 1000 at width 1000). */
  def band(c: Column, width: Double): Column =
    floor(c / width) * width

  /** Weight-proportional downsampling: keep each row with probability
    * min(1, target · w / Σw) — the Poisson/importance form of weighted
    * sampling (keep-rate ∝ quality score, length, dedup multiplicity…),
    * expected sample size ≈ `target`.
    *
    * Same determinism contract as [[stratifiedSample]], and the gate is
    * EXACT integer arithmetic: keep ⇔ (hash mod g) · Σw < target · w · g,
    * evaluated in DECIMAL(38,0) — no float rounding, so two engines (or a
    * rebuilt corpus) agree on every row, and the boundary case has no
    * cross-libm ambiguity. Σw is one map-side-combined aggregation
    * broadcast back as a literal (a scalar, never driver-material). */
  def weightedSample(df: DataFrame, key: Column, weight: Column,
                     target: Long, salt: String,
                     granularity: Long = 10000L): DataFrame = {
    val totalRow = df.agg(sum(weight.cast("long"))).head()
    if (totalRow.isNullAt(0)) return df.limit(0) // empty input: empty sample
    val totalW = totalRow.getLong(0)
    val dec = "decimal(38,0)"
    df.filter(
      pmod(polyHash(concat(key, lit(salt))), lit(granularity)).cast(dec)
        * lit(totalW).cast(dec)
        < lit(target).cast(dec) * weight.cast("long").cast(dec)
          * lit(granularity).cast(dec))
  }

  /** Target-mixture keep rates: the highest uniform-proportion sample the
    * corpus can supply WITHOUT upsampling. Given per-stratum counts and
    * target weights, the binding stratum is the one with the least data
    * relative to its weight — `cap = min(count_s / w_s)` — and every
    * stratum keeps `rate_s = w_s · cap / count_s` (the binding stratum
    * keeps everything, rate 1). Feeding the result to
    * [[stratifiedSample]] yields expected counts proportional to the
    * target weights — the "data mixing" step of a training pipeline
    * (reweighting web/books/code/... sources to a recipe).
    *
    * Driver math over |strata| doubles (bounded like every planner
    * scalar); the expression order (w·cap then /count) is fixed so a SQL
    * twin running `wt * cap / n` IEEE-matches bit-for-bit. */
  def mixtureRates(counts: Map[String, Long],
                   weights: Map[String, Double]): Map[String, Double] = {
    require(counts.nonEmpty, "mixtureRates needs at least one stratum")
    require(counts.keySet.subsetOf(weights.keySet),
      s"missing weights for ${counts.keySet -- weights.keySet}")
    require(counts.values.forall(_ > 0) && weights.values.forall(_ > 0),
      "counts and weights must be positive")
    val cap = counts.map { case (s, n) => n / weights(s) }.min
    // the binding stratum's w·cap/n is 1 up to rounding of the three
    // float ops — a non-dyadic weight can land at 1+2ulp, which the
    // gate's require(r <= 1) rejects; clamp (SQL twins mirror with
    // LEAST(1.0, ...), so engine and oracle still agree bit-for-bit)
    counts.map { case (s, n) => s -> math.min(1.0, weights(s) * cap / n) }
  }

  /** Uniform EXACT-k sample: the k rows with the smallest
    * (hash(key‖salt), tiebreak) — a deterministic reservoir. Same
    * reproducibility contract as the gates above, and the plan is
    * `TakeOrderedAndProject`: each partition keeps its local top-k, the
    * driver merges partitions×k candidate rows — no global sort, no
    * single-reducer shuffle, state O(k) everywhere. The fixed-size
    * complement to [[stratifiedSample]]'s fixed-RATE gate (rebuilding a
    * corpus snapshot at a size budget wants exactly k, not a rate). */
  def uniformSampleK(df: DataFrame, key: Column, tiebreak: Column, k: Int,
                     salt: String): DataFrame =
    df.orderBy(polyHash(concat(key, lit(salt))), tiebreak).limit(k)
}
