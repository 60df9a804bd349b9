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
}
