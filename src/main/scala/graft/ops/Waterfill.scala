package graft.ops

/** Exact integer waterfilling: the largest cap `c` such that
  * Σ min(tᵢ, c) ≤ budget, or Long.MaxValue when the budget covers
  * everything. The standard data-mix allocation (flatten big sources to
  * a common ceiling, keep small sources whole), solved in O(n log n) on
  * a driver-resident totals vector — callers aggregate per-source totals
  * distributedly and hand the contract-bounded result here (q137).
  */
object Waterfill {

  /** @param totals per-source weights, each ≥ 0, any order
    * @param budget total allocation target, ≥ 0 */
  def cap(totals: Seq[Long], budget: Long): Long = {
    require(totals.forall(_ >= 0L) && budget >= 0L,
      "waterfill needs non-negative totals and budget")
    val sorted = totals.sorted
    // ascending sweep: sources below the running equal share are fully
    // allocated; the first one the share cannot cover fixes the cap
    var prefix = 0L
    var k = 0
    while (k < sorted.length) {
      val cand = (budget - prefix) / (sorted.length - k)
      if (cand < sorted(k)) return cand
      prefix += sorted(k)
      k += 1
    }
    Long.MaxValue // budget >= sum(totals): nothing is capped
  }

  /** The allocation a cap induces. */
  def alloc(totals: Seq[Long], budget: Long): Seq[Long] = {
    val c = cap(totals, budget)
    totals.map(t => math.min(t, c))
  }
}
