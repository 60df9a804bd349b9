package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Raw-bit kernels shared by eval and generated code. */
object BitKernels {
  /** Monotone Long key for a double: positives keep their (already
    * monotone, nonnegative) IEEE-754 bits; a negative of magnitude-bits m
    * maps to −m−1 — negative keys, descending in m — so signed-long order
    * equals double order (−0.0 just below +0.0, NaN above +∞). Exact and
    * invertible: no quantization, any finite double round-trips. */
  def sortable(v: Double): Long = {
    val b = java.lang.Double.doubleToLongBits(v)
    if (b >= 0L) b else ~(b ^ Long.MinValue)
  }

  def fromSortable(k: Long): Double =
    java.lang.Double.longBitsToDouble(if (k >= 0L) k else (~k) ^ Long.MinValue)
}

/** Double → order-preserving Long bit key (see [[BitKernels.sortable]]).
  * Null-preserving, codegen'd — a histogram `groupBy` on this key (or an
  * arithmetic-shift prefix of it) stays inside WholeStageCodegen. */
case class SortableDoubleBits(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_double_bits expects DOUBLE, got ${other.sql}")
  }
  override protected def nullSafeEval(input: Any): Any =
    BitKernels.sortable(input.asInstanceOf[Double])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.BitKernels.sortable($c)")
  override protected def withNewChildInternal(c: Expression): SortableDoubleBits =
    copy(child = c)
}

object BitExpressions {
  def sortableDoubleBits(c: Column): Column =
    Bridge.column(SortableDoubleBits(Bridge.expression(c)))
}
