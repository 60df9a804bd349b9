package graft.agg

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Temporal-reduction aggregates (SURVEY §2.4 A3/A4, §2.8 U1) — the
  * reference's per-dataset UDAF plug-point (protocols.py:228-242,
  * glad.py:259-282) re-expressed for Spark.
  *
  * Mean is algebraic → pure built-in expressions (partial + final hash agg,
  * map-side combine, whole-stage codegen). Median is holistic → a typed
  * `Aggregator`; its state is bounded by the temporal window length (≈23
  * scenes in the reference), so memory per group stays O(window), not O(n).
  */
object TemporalReduce {

  /** A3 + P4: masked mean as built-ins — `avg` ignores nulls, so the QA mask
    * is a `when` rewrite (glad.py:259-265's `where(qa == 1).mean("time")`). */
  def maskedMean(value: Column, qaOk: Column): Column =
    avg(when(qaOk, value))

  /** P6: nodata → null rewrite (datasets/utils.py:137-140). */
  def nodataToNull(value: Column, nodata: Double): Column =
    when(value =!= lit(nodata), value)

  /** A4: exact median over doubles — numpy semantics (mean of the two middle
    * values for even counts), matching DuckDB's `median`. Null inputs are
    * skipped (SQL aggregate semantics) — boxed input type, because a
    * primitive Double input would silently decode SQL NULL as 0.0. Holistic:
    * buffers all group values; intended for window-bounded groups. */
  object MedianAggregator
      extends Aggregator[java.lang.Double, Array[Double], java.lang.Double] {
    def zero: Array[Double] = Array.empty
    def reduce(b: Array[Double], v: java.lang.Double): Array[Double] =
      if (v == null) b else b :+ v.doubleValue
    def merge(a: Array[Double], b: Array[Double]): Array[Double] = a ++ b
    def finish(b: Array[Double]): java.lang.Double = {
      if (b.isEmpty) return null
      val s = b.sorted
      val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }
    def bufferEncoder: Encoder[Array[Double]] = ExprEnc.doubleArray
    def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE
  }

  /** Column form of the exact median (usable on untyped DataFrames). */
  val medianUdaf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(MedianAggregator, Encoders.DOUBLE)

  /** A3 vector form: element-wise masked mean over `ARRAY<FLOAT>` chunk
    * payloads — one group = one (band, chunkY, chunkX) cell block, reduced
    * across time. NaN marks masked/nodata cells on input (P4/P6 already
    * applied); output cell is NaN when no valid observation exists
    * (float32 mean semantics of glad.py:259-265). */
  class VectorMeanAggregator(n: Int)
      extends Aggregator[Array[Float], (Array[Double], Array[Int]), Array[Float]] {
    def zero: (Array[Double], Array[Int]) = (new Array[Double](n), new Array[Int](n))
    def reduce(b: (Array[Double], Array[Int]), v: Array[Float]): (Array[Double], Array[Int]) = {
      var i = 0
      while (i < n) {
        val x = v(i)
        if (!x.isNaN) { b._1(i) += x; b._2(i) += 1 }
        i += 1
      }
      b
    }
    def merge(a: (Array[Double], Array[Int]), b: (Array[Double], Array[Int])): (Array[Double], Array[Int]) = {
      var i = 0
      while (i < n) { a._1(i) += b._1(i); a._2(i) += b._2(i); i += 1 }
      a
    }
    def finish(b: (Array[Double], Array[Int])): Array[Float] = {
      val out = new Array[Float](n)
      var i = 0
      while (i < n) {
        out(i) = if (b._2(i) == 0) Float.NaN else (b._1(i) / b._2(i)).toFloat
        i += 1
      }
      out
    }
    def bufferEncoder: Encoder[(Array[Double], Array[Int])] =
      Encoders.tuple(ExprEnc.doubleArray, ExprEnc.intArray)
    def outputEncoder: Encoder[Array[Float]] = ExprEnc.floatArray
  }

  /** A4 vector form: element-wise exact median across time slices. State is
    * the list of time-slice arrays — O(window × chunkCells); size the
    * spatial chunk accordingly for median datasets (SURVEY §7 hard-part 2). */
  class VectorMedianAggregator(n: Int)
      extends Aggregator[Array[Float], List[Array[Float]], Array[Float]] {
    def zero: List[Array[Float]] = Nil
    def reduce(b: List[Array[Float]], v: Array[Float]): List[Array[Float]] = v :: b
    def merge(a: List[Array[Float]], b: List[Array[Float]]): List[Array[Float]] = a ::: b
    def finish(slices: List[Array[Float]]): Array[Float] = {
      val out = new Array[Float](n)
      val buf = new Array[Float](slices.length)
      var i = 0
      while (i < n) {
        var m = 0
        slices.foreach { s => val x = s(i); if (!x.isNaN) { buf(m) = x; m += 1 } }
        out(i) = if (m == 0) Float.NaN else {
          java.util.Arrays.sort(buf, 0, m)
          if (m % 2 == 1) buf(m / 2) else (buf(m / 2 - 1) + buf(m / 2)) / 2.0f
        }
        i += 1
      }
      out
    }
    def bufferEncoder: Encoder[List[Array[Float]]] = Encoders.kryo[List[Array[Float]]]
    def outputEncoder: Encoder[Array[Float]] = ExprEnc.floatArray
  }
}

/** Primitive-array encoders for aggregator buffers/outputs. */
private[graft] object ExprEnc {
  import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
  import org.apache.spark.sql.catalyst.encoders.AgnosticEncoders._
  val floatArray: Encoder[Array[Float]] =
    ExpressionEncoder(ArrayEncoder(PrimitiveFloatEncoder, containsNull = false))
  val doubleArray: Encoder[Array[Double]] =
    ExpressionEncoder(ArrayEncoder(PrimitiveDoubleEncoder, containsNull = false))
  val intArray: Encoder[Array[Int]] =
    ExpressionEncoder(ArrayEncoder(PrimitiveIntEncoder, containsNull = false))
}
