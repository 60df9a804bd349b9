package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{BitExpressions, BitKernels}

/** Exact linear-interpolation percentiles of a DOUBLE column — the same
  * result as Spark's `percentile` / DuckDB's `quantile_cont` — computed
  * WITHOUT an aggregation buffer that scales with the data: a percentile
  * at probability p needs only the order statistics at ranks
  * floor(p·(n−1)) and floor(p·(n−1))+1, and a distributed radix
  * selection finds those in 2-4 map-side-combined aggregation jobs.
  * Spark's built-in `Percentile` instead merges a value→count map of the
  * WHOLE column into one final reduce buffer — fine at test scale, the
  * single-buffer hazard class at 100 TB.
  *
  * How: values order through the exact sign-folded IEEE-754 bit key
  * ([[BitKernels.sortable]], a codegen'd expression — no quantization
  * assumption), so an arithmetic-shift prefix of the key is a monotone
  * cell id. Job 1 `groupBy(k >> 48).count` — at most 2¹⁶ cells whatever
  * the data — locates each target rank's cell and yields n as the count
  * sum. Cells holding a target rank then either collect their exact
  * per-value counts (≤ their known doc count rows, gated by a 1M-row
  * budget) or refine by 16 more bits (≤ 2¹⁶ sub-cells per cell) and
  * repeat; shift 0 is exact, so depth ≤ 4 with every driver transfer
  * bounded by budget/2¹⁶-sized histograms, never by |rows|.
  *
  * The interpolation replicates `Percentile.getPercentile`'s arithmetic
  * term-for-term (position = (n−1)·p; `(higher−position)·lo +
  * (position−lower)·hi`; the lower value returned outright when the
  * position is integral or the bracketing values tie), so the cuts are
  * bit-identical to the built-in's — PercentileCutSpec pins that
  * equality on randomized tied multisets and on integral/fractional
  * position edge cases. */
object PercentileCut {

  def sortableBits(v: Double): Long = BitKernels.sortable(v)
  def fromSortableBits(k: Long): Double = BitKernels.fromSortable(k)

  /** Cells with a doc count at or under this collect their exact
    * per-value histograms in one go (≤ 16 MB of (Long, Long) rows). */
  private val CollectBudget = 1L << 20

  /** Spark `Percentile.getPercentile` arithmetic, replicated exactly:
    * valueAt(r) = the 0-based rank-r order statistic. */
  private def interpolate(n: Long, p: Double, valueAt: Long => Double): Double = {
    val position = (n - 1) * p
    val lower = math.floor(position).toLong
    val higher = math.ceil(position).toLong
    val lowerKey = valueAt(lower)
    if (lower == higher) lowerKey
    else {
      val higherKey = valueAt(higher)
      if (lowerKey == higherKey) lowerKey
      else (higher - position) * lowerKey + (position - lower) * higherKey
    }
  }

  /** Percentiles of `df`'s non-null `col` at probabilities `ps`. Returns
    * NaN per cut when the column is empty (the caller's comparisons then
    * match nothing, same as the built-in's NULL). Each radix level is one
    * job over `df` — callers on a heavy frame should persist it first, as
    * q173 does. */
  def cuts(df: DataFrame, col: String, ps: Seq[Double]): Seq[Double] =
    cutsInner(df, col, ps)

  private def cutsInner(df: DataFrame, col: String, ps: Seq[Double]): Seq[Double] = {
    val s = df.sparkSession
    import s.implicits._
    val base = df
      .select(BitExpressions.sortableDoubleBits(
        org.apache.spark.sql.functions.col(col).cast("double")).as("k"))
      .filter($"k".isNotNull)

    /** One aggregation job: per-cell doc counts at `shift`, restricted to
      * `parents` cells of `parentShift` (unrestricted when empty), in key
      * order. Arithmetic shift composes (k>>a>>b = k>>(a+b)), so parent
      * restriction is a codegen'd isin filter on the coarser prefix. */
    def levelCounts(shift: Int, parentShift: Int, parents: Seq[Long]): Array[(Long, Long)] = {
      val src =
        if (parents.isEmpty) base
        else base.filter(shiftright($"k", parentShift).isin(parents: _*))
      val cell = if (shift == 0) $"k" else shiftright($"k", shift)
      val counts = src.groupBy(cell.as("c")).agg(count(lit(1)).as("cnt"))
      // histogram jobs move ≤2¹⁶-row cell counts — AQE's per-stage
      // re-plan rounds cost more than they save on collects this small.
      // Run THIS plan in the shared AQE-off session clone so concurrent
      // queries on the caller's session never see a mutated setting.
      org.apache.spark.sql.graftbridge.Bridge.withoutAqe(counts)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    }

    val l0 = levelCounts(48, 64, Nil)
    val n = l0.map(_._2).sum
    if (n == 0L) return ps.map(_ => Double.NaN)

    val targetRanks: Seq[Long] = ps.flatMap { p =>
      val position = (n - 1) * p
      Seq(math.floor(position).toLong, math.ceil(position).toLong)
    }.distinct.sorted

    val resolved = scala.collection.mutable.Map.empty[Long, Double]
    // a pending cell: (prefix, shift, cumBefore, docCnt, ranks inside it)
    type Cell = (Long, Int, Long, Long, Seq[Long])

    /** Walk `cells` (key-ordered, cumulative count starting at `cum0`),
      * assign each of `ranks` to its cell; exact cells (shift 0) resolve
      * immediately, the rest return as pending. */
    def assign(cells: Array[(Long, Long)], shift: Int, cum0: Long, ranks: Seq[Long]): Seq[Cell] = {
      val pending = scala.collection.mutable.ArrayBuffer.empty[Cell]
      var cum = cum0
      var i = 0
      var rs = ranks
      while (i < cells.length && rs.nonEmpty) {
        val (prefix, cnt) = cells(i)
        val (inCell, rest) = rs.span(_ < cum + cnt)
        if (inCell.nonEmpty) {
          if (shift == 0) inCell.foreach(r => resolved(r) = fromSortableBits(prefix))
          else pending += ((prefix, shift, cum, cnt, inCell))
        }
        cum += cnt
        rs = rest
        i += 1
      }
      pending.toSeq
    }

    var pending = assign(l0, 48, 0L, targetRanks)
    while (pending.nonEmpty) {
      val parentShift = pending.head._2
      // small cells jump straight to exact per-value counts; big ones
      // refine one 16-bit level — each group is ONE batched job
      val (small, big) = pending.partition(_._4 <= CollectBudget)
      val childShift = if (big.nonEmpty && parentShift > 16) parentShift - 16 else 0
      val next = scala.collection.mutable.ArrayBuffer.empty[Cell]
      Seq((small, 0), (big, childShift)).foreach { case (group, shift) =>
        if (group.nonEmpty) {
          val cells = levelCounts(shift, parentShift, group.map(_._1))
          group.foreach { case (prefix, _, cumBefore, _, ranks) =>
            // this parent's children: prefix match on the coarser bits
            val mine = cells.filter(c => (c._1 >> (parentShift - shift)) == prefix)
            next ++= assign(mine, shift, cumBefore, ranks)
          }
        }
      }
      pending = next.toSeq
    }

    ps.map(p => interpolate(n, p, resolved))
  }

  /** Convenience: the cuts as literal Columns. */
  def cutLits(df: DataFrame, col: String, ps: Seq[Double]): Seq[Column] =
    cuts(df, col, ps).map(lit)

  /** Group-cardinality guard: each radix level collects a
    * |groups|·≤2¹⁶-row histogram, so the key must be a CATEGORY
    * (sources, languages, months, event types), not an id. */
  private val MaxGroups = 4096

  /** Per-GROUP exact percentiles — the grouped form of [[cuts]]. One
    * (key, cell) histogram job per radix level covers EVERY group at
    * once, so no aggregation buffer ever scales with a group's row
    * count: Spark's builtin `percentile` under a groupBy buffers each
    * group's whole value set in one reduce task — corpus-sized groups
    * (per-source/per-month stats) are the single-buffer hazard class at
    * 100 TB exactly like the ungrouped case. Per-group interpolation is
    * [[interpolate]], bit-identical to the builtin's. Null keys and
    * null values drop (the builtin emits a null-key group; callers here
    * have non-null categories — documented divergence). Groups absent
    * from the result had no non-null values. The key surfaces AS STRING
    * (cast), so callers join results back via a literal local relation.
    * Like [[cuts]], each level is one job over `df` — persist heavy
    * frames first. */
  def groupedCuts(df: DataFrame, key: String, col: String,
                  ps: Seq[Double]): Map[String, Seq[Double]] = {
    val s = df.sparkSession
    import s.implicits._
    val base = df
      .select(
        org.apache.spark.sql.functions.col(key).cast("string").as("g"),
        BitExpressions.sortableDoubleBits(
          org.apache.spark.sql.functions.col(col).cast("double")).as("k"))
      .filter($"g".isNotNull && $"k".isNotNull)

    /** One batched job: per-(group, cell) counts at `shift`, restricted
      * to the exact (group, parent-prefix) `pairs` needing refinement
      * (unrestricted when empty). The filter unions one predicate per
      * distinct parent prefix (prefix match AND that prefix's owning
      * groups) — NOT independent prefix×group sets, whose cross-product
      * over-read would let a group's million-value histogram under
      * another group's prefix ride into the shift-0 collect and blow the
      * bounded-driver-transfer contract. Pair count ≤ pending cells
      * (≤ |groups|·|ranks|), so the OR chain stays tiny and codegen'd. */
    def levelCounts(shift: Int, parentShift: Int,
                    pairs: Seq[(String, Long)]): Array[(String, Long, Long)] = {
      val src =
        if (pairs.isEmpty) base
        else {
          val perParent = pairs.groupBy(_._2).toSeq.map { case (p, ps) =>
            shiftright($"k", parentShift) === lit(p) &&
              $"g".isin(ps.map(_._1).distinct: _*)
          }
          base.filter(perParent.reduce(_ || _))
        }
      val cell = if (shift == 0) $"k" else shiftright($"k", shift)
      val counts = src.groupBy($"g", cell.as("c")).agg(count(lit(1)).as("cnt"))
      org.apache.spark.sql.graftbridge.Bridge.withoutAqe(counts)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    }

    val l0 = levelCounts(48, 64, Nil)
    if (l0.isEmpty) return Map.empty
    val byG0 = l0.groupBy(_._1)
    require(byG0.size <= MaxGroups,
      s"groupedCuts: ${byG0.size} groups exceed $MaxGroups — the key must " +
        "be a bounded category, not an id")
    val nByG: Map[String, Long] =
      byG0.map { case (g, cs) => g -> cs.map(_._3).sum }
    val ranksByG: Map[String, Seq[Long]] = nByG.map { case (g, n) =>
      g -> ps.flatMap { p =>
        val position = (n - 1) * p
        Seq(math.floor(position).toLong, math.ceil(position).toLong)
      }.distinct.sorted
    }

    val resolved = scala.collection.mutable.Map.empty[(String, Long), Double]
    // (group, prefix, shift, cumBefore, docCnt, ranks inside it)
    type Cell = (String, Long, Int, Long, Long, Seq[Long])

    def assign(g: String, cells: Array[(Long, Long)], shift: Int,
               cum0: Long, ranks: Seq[Long]): Seq[Cell] = {
      val pending = scala.collection.mutable.ArrayBuffer.empty[Cell]
      var cum = cum0
      var i = 0
      var rs = ranks
      while (i < cells.length && rs.nonEmpty) {
        val (prefix, cnt) = cells(i)
        val (inCell, rest) = rs.span(_ < cum + cnt)
        if (inCell.nonEmpty) {
          if (shift == 0)
            inCell.foreach(r => resolved((g, r)) = fromSortableBits(prefix))
          else pending += ((g, prefix, shift, cum, cnt, inCell))
        }
        cum += cnt
        rs = rest
        i += 1
      }
      pending.toSeq
    }

    var pending: Seq[Cell] = byG0.toSeq.flatMap { case (g, rows) =>
      assign(g, rows.map(t => (t._2, t._3)).sortBy(_._1), 48, 0L, ranksByG(g))
    }
    while (pending.nonEmpty) {
      val parentShift = pending.head._3 // uniform: levels advance together
      val (small, big) = pending.partition(_._5 <= CollectBudget)
      val childShift = if (big.nonEmpty && parentShift > 16) parentShift - 16 else 0
      val next = scala.collection.mutable.ArrayBuffer.empty[Cell]
      Seq((small, 0), (big, childShift)).foreach { case (group, shift) =>
        if (group.nonEmpty) {
          val cells = levelCounts(shift, parentShift,
            group.map(c => (c._1, c._2)).distinct)
          group.foreach { case (g, prefix, _, cumBefore, _, ranks) =>
            val mine = cells
              .filter(c => c._1 == g && (c._2 >> (parentShift - shift)) == prefix)
              .map(c => (c._2, c._3)).sortBy(_._1)
            next ++= assign(g, mine, shift, cumBefore, ranks)
          }
        }
      }
      pending = next.toSeq
    }

    nByG.map { case (g, n) =>
      g -> ps.map(p => interpolate(n, p, r => resolved((g, r))))
    }
  }
}
