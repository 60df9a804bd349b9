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
}
