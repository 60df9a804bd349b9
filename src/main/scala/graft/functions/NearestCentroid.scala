package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Nearest-centroid assignment for angular-space pruning: one fused JVM
  * loop over the (small, plan-embedded) centroid table per row, returning
  * `struct<cell INT, angle DOUBLE>` — the argmax-cosine cell and the
  * angular distance `acos(cos(x, centroid))` to it.
  *
  * The centroids ride inside the expression (they are bounded by design —
  * the caller trains them on a driver-side sample), so the assignment needs
  * no join and no UDF serialization per batch. A zero-norm input vector is
  * assigned cell 0 at angle π: the maximal radius keeps every pruning
  * decision that involves its cell conservative (never prunes a pair the
  * exact-verify stage should have seen).
  */
case class NearestCentroid(child: Expression, centroids: Array[Array[Float]])
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_nearest_centroid expects ARRAY<FLOAT>, got ${other.sql}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("cell", IntegerType, nullable = false),
    StructField("angle", DoubleType, nullable = false)))

  // centroids are unit vectors by construction (caller normalizes)
  @transient private lazy val cents = centroids

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val n = x.numElements()
    var nrm2 = 0.0
    var i = 0
    while (i < n) { val v = x.getFloat(i).toDouble; nrm2 += v * v; i += 1 }
    val nrm = math.sqrt(nrm2)
    if (nrm == 0.0 || cents.isEmpty)
      return new GenericInternalRow(Array[Any](0, math.Pi))
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
    new GenericInternalRow(Array[Any](best, math.acos(clamped)))
  }

  override protected def withNewChildInternal(c: Expression): NearestCentroid =
    copy(child = c)
}

object NearestCentroid {
  def nearest(vec: Column, centroids: Array[Array[Float]]): Column =
    Bridge.column(NearestCentroid(Bridge.expression(vec), centroids))
}
