package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.roundp

/** Exact Spearman rank correlation per group — the monotone-association
  * statistic a curation pipeline reaches for when metric scales are
  * arbitrary and tails are heavy (quality score vs length, novelty vs
  * date, …), where Pearson on raw values is dominated by outliers.
  *
  * Exact tie handling WITHOUT fractional ranks: the tie-averaged rank
  * `rank + (ties − 1)/2` doubled is the INTEGER `2·rank + ties − 1`, and
  * Spearman is invariant under the common ×2 rescale, so correlating the
  * doubled ranks IS the textbook tie-corrected statistic — no float rank
  * arithmetic whose summation order could differ between engines.
  *
  * Scale shape: ranks come from group-PARTITIONED windows (never global —
  * the PlanGuard error class); the five sufficient sums fold exactly
  * (per-term BIGINT products, DECIMAL(38) accumulation), and the final
  * formula is one double expression computed from exact integers —
  * identical IEEE in any engine that replays it. Bounds: per-term
  * products need group sizes ≤ ~2³¹; the DECIMAL accumulators hold to
  * ~10¹⁹ rows per group.
  */
object RankCorr {

  /** Doubled tie-averaged rank of `c` within `group` — integer-exact. */
  private def rank2(group: Column, c: Column): Column =
    lit(2L) * rank().over(Window.partitionBy(group).orderBy(c)).cast("long") +
      count(lit(1)).over(Window.partitionBy(group, c)) - 1L

  /** Per-group Spearman rho between `x` and `y` (exact, tie-averaged).
    * @return (group, n_rows, spearman_rho) — rho is null when either
    *         variable is constant in the group (zero rank variance). */
  def spearman(df: DataFrame, group: Column, x: Column, y: Column,
               ndec: Int = 6): DataFrame = {
    val ranked = df.select(group.as("g"),
      rank2(group, x).as("rx"), rank2(group, y).as("ry"))
    val a = ranked.groupBy(col("g")).agg(
      count(lit(1)).as("n_rows"),
      sum(col("rx").cast("decimal(38,0)")).as("sx"),
      sum(col("ry").cast("decimal(38,0)")).as("sy"),
      sum((col("rx") * col("ry")).cast("decimal(38,0)")).as("sxy"),
      sum((col("rx") * col("rx")).cast("decimal(38,0)")).as("sxx"),
      sum((col("ry") * col("ry")).cast("decimal(38,0)")).as("syy"))
    val nd = col("n_rows").cast("double")
    val (sx, sy, sxy, sxx, syy) =
      (col("sx").cast("double"), col("sy").cast("double"),
        col("sxy").cast("double"), col("sxx").cast("double"),
        col("syy").cast("double"))
    val den = (nd * sxx - sx * sx) * (nd * syy - sy * sy)
    a.select(col("g"), col("n_rows"),
      when(den > 0.0, roundp((nd * sxy - sx * sy) / sqrt(den), ndec))
        .as("spearman_rho"))
  }

  /** Per-group exact AUC of `score` as a ranker for boolean `label` —
    * the Mann-Whitney rank-sum form: with ascending tie-averaged ranks
    * r̄, AUC = (Σ_pos r̄ − n₊(n₊+1)/2) / (n₊·n₋), which handles ties as
    * the standard half-credit. Doubled ranks keep everything integer:
    * AUC = (Σ_pos 2r̄ − n₊(n₊+1)) / (2·n₊·n₋). One group-partitioned
    * rank window + one aggregation; null when a group has no positives
    * or no negatives (AUC undefined).
    * @return (group, n_pos, n_neg, auc) */
  def aucRank(df: DataFrame, group: Column, score: Column, label: Column,
              ndec: Int = 6): DataFrame = {
    val ranked = df.select(group.as("g"), label.cast("boolean").as("y"),
      rank2(group, score).as("r2"))
    val a = ranked.groupBy(col("g")).agg(
      sum(when(col("y"), 1L).otherwise(0L)).as("n_pos"),
      sum(when(!col("y"), 1L).otherwise(0L)).as("n_neg"),
      sum(when(col("y"), col("r2").cast("decimal(38,0)"))
        .otherwise(lit(0).cast("decimal(38,0)"))).as("spos"))
    a.select(col("g"), col("n_pos"), col("n_neg"),
      when(col("n_pos") > 0 && col("n_neg") > 0,
        roundp((col("spos").cast("double") -
            col("n_pos").cast("double") * (col("n_pos") + 1).cast("double")) /
          (lit(2.0) * col("n_pos").cast("double") * col("n_neg").cast("double")),
          ndec)).as("auc"))
  }
}
