package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One-pass distributed second-moment accumulation for embedding columns —
  * the covariance/Gram primitive under PCA, whitening, Mahalanobis
  * scoring and embedding-drift analysis.
  *
  * Scale shape: a single scan with a mergeable typed Aggregator whose
  * state is ONE flat Long array (n, per-dim sums, upper-triangle product
  * sums: 1 + d + d(d+1)/2 entries — 2145 longs at d=64). Map-side combine
  * reduces every partition to one state; no posexplode, no self-join of
  * the (vec, dim) frame (the naive pair form shuffles d(d+1)/2 rows PER
  * VECTOR — 2080× the input at d=64).
  *
  * Exactness: inputs are float32; each value is quantized to an integer
  * round(x·10⁴) and all accumulation is Long arithmetic — merge order
  * cannot perturb any digit, so the final covariance assembly (pure
  * per-cell double math from exact sums) is bit-identical to the SQL
  * oracle's, which quantizes identically. The contract is therefore the
  * exact covariance OF THE 4-DECIMAL QUANTIZATION (error ≤ ~|x|·10⁻⁴
  * per cell vs the float ideal — below any downstream PCA/whitening
  * noise floor). x·10⁴ can never land exactly on a .5 half (it would
  * need a factor 5⁴ in a float32's power-of-two denominator), so Java
  * half-up and DuckDB half-away-from-zero rounding agree on every input.
  * Bounds: |x|≤10 ⇒ |xi|≤10⁵, products ≤10¹⁰ ⇒ ~9·10⁸ worst-case rows
  * (100× more at unit-norm embeddings) before a product sum can reach
  * 2⁶³; finish() enforces the conservative bound — shard the corpus and
  * merge Moments states offline past it.
  */
object Gram {

  /** Mergeable exact moments: [0]=n, [1..d]=Σxᵢ, then row-major upper
    * triangle Σxᵢxⱼ (i ≤ j). */
  final class Moments(val d: Int) extends Serializable {
    val s = new Array[Long](1 + d + d * (d + 1) / 2)
    def add(x: Array[Long]): Unit = {
      s(0) += 1L
      var i = 0
      var t = 1 + d
      while (i < d) {
        s(1 + i) += x(i)
        var j = i
        while (j < d) { s(t) += x(i) * x(j); t += 1; j += 1 }
        i += 1
      }
    }
    def merge(o: Moments): Moments = {
      var i = 0
      while (i < s.length) { s(i) += o.s(i); i += 1 }
      this
    }
  }

  /** embedding column (Seq[Float]) → (n, Σx per dim, Σxy upper triangle),
    * all exact Longs of 10⁴-quantized inputs. */
  final class MomentsAgg(d: Int)
      extends Aggregator[Seq[Float], Moments, (Long, Seq[Long], Seq[Long])] {
    override def zero: Moments = new Moments(d)
    override def reduce(b: Moments, emb: Seq[Float]): Moments = {
      require(emb.length == d, s"expected $d dims, got ${emb.length}")
      val x = new Array[Long](d)
      var i = 0
      while (i < d) { x(i) = math.round(emb(i).toDouble * 1e4); i += 1 }
      b.add(x); b
    }
    override def merge(a: Moments, b: Moments): Moments = a.merge(b)
    override def finish(b: Moments): (Long, Seq[Long], Seq[Long]) = {
      // 2^63 / (1e5)^2 ≈ 9.2e8 rows of worst-case |x|=10 headroom
      // (~9e10 at unit-norm); shard + merge offline past this
      require(b.s(0) < 900000000L,
        "Gram.MomentsAgg: row count approaching Long product-sum headroom")
      (b.s(0), b.s.slice(1, 1 + d).toSeq, b.s.drop(1 + d).toSeq)
    }
    override def bufferEncoder: Encoder[Moments] =
      Encoders.javaSerialization[Moments]
    override def outputEncoder: Encoder[(Long, Seq[Long], Seq[Long])] =
      ExpressionEncoder[(Long, Seq[Long], Seq[Long])]()
  }

  /** Materialize the d×d covariance implied by a MomentsAgg result —
    * DRIVER-side and O(d²) by construction: the distributed pass reduced
    * the corpus to 2145 longs, so everything after is bounded matrix
    * math, the right side of the driver/cluster split at any corpus
    * size. Unscaled back to input units. */
  def covariance(n: Long, sx: Seq[Long], sxy: Seq[Long]): Array[Array[Double]] = {
    val d = sx.length
    require(n > 0 && sxy.length == d * (d + 1) / 2)
    val c = Array.ofDim[Double](d, d)
    var t = 0
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val v = (sxy(t).toDouble / n -
          (sx(i).toDouble / n) * (sx(j).toDouble / n)) / 1e8
        c(i)(j) = v; c(j)(i) = v
        t += 1; j += 1
      }
      i += 1
    }
    c
  }

  /** Top-k eigenpairs of a symmetric matrix by deterministic power
    * iteration with deflation (Hotelling) — eigenvalues descending,
    * eigenvectors unit-norm with a sign convention (largest-|coord|
    * entry positive) so results are run-stable. d is small (the matrix
    * came from [[covariance]]), so O(k·iters·d²) driver work is
    * negligible next to the corpus scan that produced it. */
  def topEigen(m: Array[Array[Double]], k: Int, iters: Int = 500)
      : Seq[(Double, Array[Double])] = {
    val d = m.length
    val a = m.map(_.clone())
    val out = scala.collection.mutable.ArrayBuffer.empty[(Double, Array[Double])]
    for (_ <- 0 until math.min(k, d)) {
      // deterministic generic-position init (a constant vector can be
      // exactly orthogonal to an eigenvector and stall the iteration)
      val raw = Array.tabulate(d)(i =>
        (((i + 1) * 2654435761L + 12345L) % 1000003L).toDouble / 1000003.0 - 0.5)
      val rn = math.sqrt(raw.map(x => x * x).sum)
      var v = raw.map(_ / rn)
      var lambda = 0.0
      for (_ <- 0 until iters) {
        val w = new Array[Double](d)
        var i = 0
        while (i < d) {
          var s = 0.0; var j = 0
          while (j < d) { s += a(i)(j) * v(j); j += 1 }
          w(i) = s; i += 1
        }
        val nrm = math.sqrt(w.map(x => x * x).sum)
        if (nrm < 1e-300) { lambda = 0.0 }
        else {
          v = w.map(_ / nrm)
          lambda = nrm
        }
      }
      // Rayleigh quotient for a signed eigenvalue (the iteration norm
      // loses the sign of negative eigenvalues)
      val av = Array.tabulate(d)(i => (0 until d).map(j => a(i)(j) * v(j)).sum)
      lambda = (0 until d).map(i => v(i) * av(i)).sum
      // sign convention
      val mi = v.indices.maxBy(i => math.abs(v(i)))
      val sgn = if (v(mi) < 0) -1.0 else 1.0
      val vv = v.map(_ * sgn)
      out += ((lambda, vv))
      // deflate
      var i = 0
      while (i < d) {
        var j = 0
        while (j < d) { a(i)(j) -= lambda * vv(i) * vv(j); j += 1 }
        i += 1
      }
    }
    out.toSeq
  }
}
