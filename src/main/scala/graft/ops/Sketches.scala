package graft.ops

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable one-pass sketches for corpus-scale profiling (the 100 TB
  * companion to the exact holistic aggregates in q20/q57): a deterministic
  * KLL-style quantile sketch and a Misra-Gries heavy-hitters summary.
  *
  * Both are ALGEBRAIC in Spark's sense — constant-size state, an
  * order-insensitive-bounded `merge` — so they run as hash aggregates with
  * map-side partial combine: each task ships one ≤ O(k log n) summary, the
  * reduce side merges summaries, and no value list is ever collected. That
  * is the property the exact forms (sort-based percentile, full groupBy
  * word counts) give up at scale, where the per-group value mass exceeds
  * executor memory.
  *
  * Determinism: both sketches avoid randomness (KLL's coin-flip compaction
  * offset is replaced by per-level parity alternation — the classic
  * deterministic even/odd compactor, same O(log(n/k)·n/k) worst-case rank
  * error up to constants; Misra-Gries is deterministic by construction), so
  * reruns over the same partitioning reproduce the same summary, and error
  * GUARANTEES (not expectations) back the oracle checks in q59/q61.
  */
object Sketches {

  /** Deterministic KLL-style quantile sketch.
    *
    * Levels of capacity-`k` buffers; an item at level i carries weight 2^i.
    * A full buffer sorts and promotes alternate items (parity flips per
    * compaction so consecutive compactions cancel bias) to the level above.
    * Worst-case rank error after all compactions is bounded by
    * Σ_i 2^i · (#compactions at level i) ≤ levels · n / k — with k = 256
    * that is < 1.5 % of n for any n ≤ 10⁹ (levels ≤ 22 never materialize:
    * level count grows as log₂(n/k)). Merge concatenates per-level buffers
    * and re-compacts bottom-up — the bound is on TOTAL compactions, so it
    * survives arbitrary merge trees (mergeability per Agarwal et al.,
    * "Mergeable Summaries", PODS '12).
    */
  final class KllSketch(val k: Int) extends Serializable {
    require(k >= 8, s"capacity $k too small")
    var n: Long = 0L
    var levels: ArrayBuffer[ArrayBuffer[Double]] = ArrayBuffer(ArrayBuffer.empty)
    var parity: ArrayBuffer[Boolean] = ArrayBuffer(false)

    def insert(x: Double): Unit = {
      levels(0) += x
      n += 1
      if (levels(0).length >= k) compact(0)
    }

    private def ensureLevel(i: Int): Unit =
      while (levels.length <= i) { levels += ArrayBuffer.empty; parity += false }

    private def compact(i: Int): Unit = {
      ensureLevel(i + 1)
      val buf = levels(i)
      val sorted = buf.toArray
      java.util.Arrays.sort(sorted)
      val off = if (parity(i)) 1 else 0
      parity(i) = !parity(i)
      var j = off
      val up = levels(i + 1)
      while (j < sorted.length) { up += sorted(j); j += 2 }
      buf.clear()
      if (up.length >= k) compact(i + 1)
    }

    def merge(o: KllSketch): KllSketch = {
      n += o.n
      ensureLevel(o.levels.length - 1)
      var i = 0
      while (i < o.levels.length) { levels(i) ++= o.levels(i); i += 1 }
      i = 0
      while (i < levels.length) { // bottom-up: promotions cascade upward
        if (levels(i).length >= k) compact(i)
        i += 1
      }
      this
    }

    /** All retained (value, weight) pairs, sorted by value. */
    def weighted: Array[(Double, Long)] = {
      val out = ArrayBuffer.empty[(Double, Long)]
      var i = 0
      while (i < levels.length) {
        val w = 1L << i
        levels(i).foreach(v => out += ((v, w)))
        i += 1
      }
      out.sortBy(_._1).toArray
    }

    /** Estimated p-quantile: the smallest retained value whose cumulative
      * weight reaches ceil(p·n). */
    def quantile(p: Double): Double = {
      require(p > 0 && p <= 1, s"p=$p out of (0,1]")
      val items = weighted
      require(items.nonEmpty, "empty sketch")
      val target = math.max(1L, math.ceil(p * n).toLong)
      var cum = 0L
      var i = 0
      while (i < items.length) {
        cum += items(i)._2
        if (cum >= target) return items(i)._1
        i += 1
      }
      items.last._1
    }
  }

  /** Typed Aggregator: value column → (n, quantile estimates at `ps`).
    * The buffer is the sketch object itself (object hash aggregation keeps
    * it deserialized between rows; Java serialization only crosses the
    * partial/final shuffle, like a production sketch's binary image). */
  final class KllAgg(k: Int, ps: Seq[Double])
      extends Aggregator[Double, KllSketch, (Long, Seq[Double])] {
    override def zero: KllSketch = new KllSketch(k)
    override def reduce(b: KllSketch, x: Double): KllSketch = { b.insert(x); b }
    override def merge(a: KllSketch, b: KllSketch): KllSketch = a.merge(b)
    override def finish(b: KllSketch): (Long, Seq[Double]) =
      if (b.n == 0) (0L, Seq.empty) else (b.n, ps.map(b.quantile))
    override def bufferEncoder: Encoder[KllSketch] =
      Encoders.javaSerialization[KllSketch]
    override def outputEncoder: Encoder[(Long, Seq[Double])] =
      ExpressionEncoder[(Long, Seq[Double])]()
  }

  /** Misra-Gries heavy-hitters summary with `k` counters.
    *
    * Guarantee: every item with true frequency > n/(k+1) is present, and
    * each stored count undercounts by at most n/(k+1). Merge adds counts
    * and, when over capacity, subtracts the (k+1)-th largest count from all
    * (Agarwal et al. '12) — the guarantee is preserved across any merge
    * tree, so candidates from a distributed aggregation are a SUPERSET of
    * the true heavy hitters; an exact counting pass over just the
    * candidates then makes the final answer exact (see q61).
    */
  final class MisraGries(val k: Int) extends Serializable {
    require(k >= 1)
    var n: Long = 0L
    val counters: java.util.HashMap[String, Long] = new java.util.HashMap

    def insert(x: String): Unit = {
      n += 1
      val c = counters.get(x) // 0L when absent (unboxed default)
      if (c > 0L || counters.containsKey(x)) counters.put(x, c + 1L)
      else if (counters.size < k) counters.put(x, 1L)
      else decrementAll()
    }

    private def decrementAll(): Unit = {
      val it = counters.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= 1L) it.remove() else e.setValue(e.getValue - 1L)
      }
    }

    def merge(o: MisraGries): MisraGries = {
      n += o.n
      val it = o.counters.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        counters.merge(e.getKey, e.getValue, (a, b) => a + b)
      }
      if (counters.size > k) {
        // subtract the (k+1)-th largest count from every counter
        val vals = new Array[Long](counters.size)
        val vit = counters.values().iterator()
        var i = 0
        while (vit.hasNext) { vals(i) = vit.next(); i += 1 }
        java.util.Arrays.sort(vals)
        val cut = vals(vals.length - (k + 1)) // (k+1)-th largest
        val eit = counters.entrySet().iterator()
        while (eit.hasNext) {
          val e = eit.next()
          if (e.getValue <= cut) eit.remove() else e.setValue(e.getValue - cut)
        }
      }
      this
    }

    def items: Seq[(String, Long)] = {
      import scala.jdk.CollectionConverters._
      counters.asScala.toSeq.map { case (s, c) => (s, c) }
    }
  }

  /** Typed Aggregator: token column → (n, candidate (item, lowerCount)s). */
  final class MisraGriesAgg(k: Int)
      extends Aggregator[String, MisraGries, (Long, Seq[(String, Long)])] {
    override def zero: MisraGries = new MisraGries(k)
    override def reduce(b: MisraGries, x: String): MisraGries = { b.insert(x); b }
    override def merge(a: MisraGries, b: MisraGries): MisraGries = a.merge(b)
    override def finish(b: MisraGries): (Long, Seq[(String, Long)]) = (b.n, b.items)
    override def bufferEncoder: Encoder[MisraGries] =
      Encoders.javaSerialization[MisraGries]
    override def outputEncoder: Encoder[(Long, Seq[(String, Long)])] =
      ExpressionEncoder[(Long, Seq[(String, Long)])]()
  }

  /** HyperLogLog cardinality sketch (Flajolet et al. '07) with the
    * small-range linear-counting correction from the original paper.
    *
    * 2^p byte registers; the input is a 64-bit hash (hash upstream with
    * xxhash64 — hashing inside the sketch would re-hash on every merge
    * path). Register = max leading-zero rank of the low 64−p bits; merge =
    * elementwise max, so the sketch is fully mergeable and the result is
    * INDEPENDENT of partitioning and merge order. With the hash function
    * fixed the estimate is deterministic per dataset: the usual
    * 1.04/√(2^p) error is a statement over hash seeds, not per-run noise,
    * which is what makes an oracle-gated validation (q62) meaningful.
    */
  final class HyperLogLog(val p: Int) extends Serializable {
    require(p >= 4 && p <= 18)
    val m: Int = 1 << p
    val regs: Array[Byte] = new Array[Byte](m)

    def insertHash(h: Long): Unit = {
      val idx = (h >>> (64 - p)).toInt
      val tail = h << p
      val rank = (if (tail == 0L) 64 - p else java.lang.Long.numberOfLeadingZeros(tail)) + 1
      if (rank > regs(idx)) regs(idx) = rank.toByte
    }

    def merge(o: HyperLogLog): HyperLogLog = {
      require(o.p == p)
      var i = 0
      while (i < m) { if (o.regs(i) > regs(i)) regs(i) = o.regs(i); i += 1 }
      this
    }

    def estimate: Long = {
      val alpha = m match {
        case 16 => 0.673
        case 32 => 0.697
        case 64 => 0.709
        case _  => 0.7213 / (1 + 1.079 / m)
      }
      var inv = 0.0
      var zeros = 0
      var i = 0
      while (i < m) {
        inv += 1.0 / (1L << regs(i))
        if (regs(i) == 0) zeros += 1
        i += 1
      }
      val raw = alpha * m * m / inv
      val est =
        if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
        else raw
      math.round(est)
    }
  }

  /** COUNT-MIN sketch (Cormode & Muthukrishnan 2005): a d×w counter
    * matrix; insert adds 1 to one counter per row, the point estimate is
    * the MIN over rows — so estimates only ever over-count (the one-sided
    * error bound q157's gate asserts: est ≥ exact always, est ≤ exact +
    * εN w.h.p.). Counters merge by elementwise ADD — fully mergeable and
    * map-side combinable like the other sketches here.
    *
    * Row hashes are deterministic LCG mixes of the item's 32-bit
    * polyHash, one PUBLIC LCG multiplier per row (glibc, NR, VAX,
    * Borland, MINSTD, Lehmer, BCPL, Delphi), bucketed from the HIGH bits:
    * bucket_j(h) = (((h·A_j + 12345) mod 2³¹) · w) >> 31.
    * Taking high bits matters: a low-bits `mod w` makes every row's
    * bucket a linear function of h mod w, so two items with h₁ ≡ h₂
    * (mod w) collide in ALL rows at once and the min() degenerates —
    * caught by SketchSpec's one-sided-error property before this was
    * switched. h < 2³² and A_j < 2³¹ keep the products inside signed
    * 64-bit for BOTH engines, so a SQL oracle can replay the entire
    * sketch exactly (q157 does). */
  final class CountMin(val d: Int, val w: Int) extends Serializable {
    require(d <= CountMin.A.length, s"at most ${CountMin.A.length} rows")
    val counts: Array[Long] = new Array[Long](d * w)

    def bucket(j: Int, h: Long): Int =
      ((((h * CountMin.A(j) + 12345L) % 2147483648L) * w) >> 31).toInt

    def insertHash(h: Long): Unit = {
      var j = 0
      while (j < d) { counts(j * w + bucket(j, h)) += 1L; j += 1 }
    }

    def merge(o: CountMin): CountMin = {
      require(o.d == d && o.w == w, s"CountMin shape mismatch")
      var i = 0
      while (i < counts.length) { counts(i) += o.counts(i); i += 1 }
      this
    }

    def estimate(h: Long): Long = {
      var m = Long.MaxValue
      var j = 0
      while (j < d) {
        val c = counts(j * w + bucket(j, h))
        if (c < m) m = c
        j += 1
      }
      m
    }
  }

  object CountMin {
    /** Public-textbook LCG multipliers, one per sketch row. */
    val A: Array[Long] = Array(1103515245L, 1664525L, 69069L, 22695477L,
      48271L, 16807L, 2147001325L, 134775813L)
  }

  /** Typed Aggregator: pre-hashed column → the d·w counter matrix
    * (row-major), for estimate evaluation as plain column arithmetic. */
  final class CountMinAgg(d: Int, w: Int)
      extends Aggregator[Long, CountMin, Seq[Long]] {
    override def zero: CountMin = new CountMin(d, w)
    override def reduce(b: CountMin, h: Long): CountMin = { b.insertHash(h); b }
    override def merge(a: CountMin, b: CountMin): CountMin = a.merge(b)
    override def finish(b: CountMin): Seq[Long] = b.counts.toSeq
    override def bufferEncoder: Encoder[CountMin] =
      Encoders.javaSerialization[CountMin]
    override def outputEncoder: Encoder[Seq[Long]] =
      ExpressionEncoder[Seq[Long]]()
  }

  /** Typed Aggregator: pre-hashed 64-bit column → cardinality estimate. */
  final class HllAgg(p: Int) extends Aggregator[Long, HyperLogLog, Long] {
    override def zero: HyperLogLog = new HyperLogLog(p)
    override def reduce(b: HyperLogLog, h: Long): HyperLogLog = { b.insertHash(h); b }
    override def merge(a: HyperLogLog, b: HyperLogLog): HyperLogLog = a.merge(b)
    override def finish(b: HyperLogLog): Long = b.estimate
    override def bufferEncoder: Encoder[HyperLogLog] =
      Encoders.javaSerialization[HyperLogLog]
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }
}
