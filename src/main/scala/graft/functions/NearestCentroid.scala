package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** PUBLIC static kernels for the centroid expressions (see HashKernels for
  * the pattern: one body shared by interpreted eval and generated code;
  * Janino cannot see non-public members). Centroid tables reach generated
  * code via `CodegenContext.addReferenceObj` — they are plan-embedded
  * driver-side arrays, bounded by design. */
object VectorKernels {

  /** Argmax-cosine cell + angular distance; null input → null. Zero-norm
    * input → (0, π): the maximal radius keeps every pruning decision that
    * involves its cell conservative. */
  def nearestCentroid(x: ArrayData, cents: Array[Array[Float]])
      : org.apache.spark.sql.catalyst.expressions.GenericInternalRow = {
    if (x == null) return null
    val n = x.numElements()
    var nrm2 = 0.0
    var i = 0
    while (i < n) { val v = x.getFloat(i).toDouble; nrm2 += v * v; i += 1 }
    val nrm = math.sqrt(nrm2)
    if (nrm == 0.0 || cents.isEmpty)
      return new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](0, math.Pi))
    var best = 0
    var bestCos = -2.0
    var c = 0
    while (c < cents.length) {
      val ct = cents(c)
      val m = math.min(n, ct.length)
      var d = 0.0
      i = 0
      while (i < m) { d += x.getFloat(i).toDouble * ct(i).toDouble; i += 1 }
      val cos = d / nrm
      if (cos > bestCos) { bestCos = cos; best = c }
      c += 1
    }
    val clamped = math.max(-1.0, math.min(1.0, bestCos))
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](best, math.acos(clamped)))
  }

  /** Top-n centroid ids by descending dot product, stable ties; null
    * input → null. */
  def topCells(x: ArrayData, cents: Array[Array[Float]], n: Int): ArrayData = {
    if (x == null) return null
    val len = x.numElements()
    val scores = new Array[Double](cents.length)
    var c = 0
    while (c < cents.length) {
      val ct = cents(c)
      val m = math.min(len, ct.length)
      var d = 0.0; var i = 0
      while (i < m) { d += x.getFloat(i).toDouble * ct(i).toDouble; i += 1 }
      scores(c) = d
      c += 1
    }
    val k = math.min(n, cents.length)
    val picked = new Array[Int](k)
    val used = new Array[Boolean](cents.length)
    var j = 0
    while (j < k) {
      var best = -1; var bd = Double.NegativeInfinity
      var i = 0
      while (i < cents.length) {
        if (!used(i) && scores(i) > bd) { bd = scores(i); best = i }
        i += 1
      }
      used(best) = true; picked(j) = best
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(picked)
  }
}

/** Nearest-centroid assignment for angular-space pruning: one fused JVM
  * loop over the (small, plan-embedded) centroid table per row, returning
  * `struct<cell INT, angle DOUBLE>` — the argmax-cosine cell and the
  * angular distance `acos(cos(x, centroid))` to it.
  *
  * The centroids ride inside the expression (they are bounded by design —
  * the caller trains them on a driver-side sample), so the assignment needs
  * no join and no UDF serialization per batch; generated code receives
  * them as a plan reference object.
  */
case class NearestCentroid(child: Expression, centroids: Array[Array[Float]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_nearest_centroid expects ARRAY<FLOAT>, got ${other.sql}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("cell", IntegerType, nullable = false),
    StructField("angle", DoubleType, nullable = false)))

  override def nullSafeEval(input: Any): Any =
    VectorKernels.nearestCentroid(input.asInstanceOf[ArrayData], centroids)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val c = child.genCode(ctx)
    val cref = ctx.addReferenceObj("centroids", centroids, "float[][]")
    ev.copy(code = code"""
      ${c.code}
      org.apache.spark.sql.catalyst.InternalRow ${ev.value} =
        graft.functions.VectorKernels.nearestCentroid(
          ${c.isNull} ? null : ${c.value}, $cref);
      boolean ${ev.isNull} = ${ev.value} == null;
    """)
  }

  override protected def withNewChildInternal(c: Expression): NearestCentroid =
    copy(child = c)
}

object NearestCentroid {
  def nearest(vec: Column, centroids: Array[Array[Float]]): Column =
    Bridge.column(NearestCentroid(Bridge.expression(vec), centroids))
}

/** Top-`n` centroid ids by descending DOT PRODUCT (IVF cell assignment and
  * probe-list in one fused loop — replaces the per-row UDFs that
  * serialized a broadcast read per batch). Ties keep ascending id order,
  * matching the stable `sortBy(-score)` of the UDF form it replaces.
  * Unlike [[NearestCentroid]] this scores raw dot (the IVF index's metric
  * on its unnormalized k-means centroids), not cosine. */
case class NearestCells(child: Expression, centroids: Array[Array[Float]], n: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_nearest_cells expects ARRAY<FLOAT>, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    VectorKernels.topCells(input.asInstanceOf[ArrayData], centroids, n)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val c = child.genCode(ctx)
    val cref = ctx.addReferenceObj("centroids", centroids, "float[][]")
    ev.copy(code = code"""
      ${c.code}
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        graft.functions.VectorKernels.topCells(
          ${c.isNull} ? null : ${c.value}, $cref, $n);
      boolean ${ev.isNull} = ${ev.value} == null;
    """)
  }

  override protected def withNewChildInternal(c: Expression): NearestCells =
    copy(child = c)
}

object NearestCells {
  def topCells(vec: Column, centroids: Array[Array[Float]], n: Int): Column =
    Bridge.column(NearestCells(Bridge.expression(vec), centroids, n))
}
