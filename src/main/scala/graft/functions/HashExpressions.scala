package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Native hash-signature expressions.
  *
  * The HOF (`aggregate`/`zip_with`) formulations of MinHash/SimHash are
  * semantically identical but evaluate one interpreted lambda dispatch per
  * (element × permutation/bit) — ~3k dispatches per document, which
  * measured ~0.4 s/doc. These expressions run the same arithmetic as a
  * fused JVM loop (~µs/doc) and generate code (a static-kernel call into
  * HashKernels), so consumers stay inside WholeStageCodegen; the
  * arithmetic stays bit-identical to the DuckDB oracle twins in DuckSql.
  */
private[graft] trait ExpectsLongArray extends UnaryExpression {
  def fname: String
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$fname expects ARRAY<BIGINT>, got ${other.sql}")
  }
}

/** MinHash signature: out[j] = min over h of ((2j+1)·h + j² + 7) mod P,
  * P = 4294967291. Empty input → empty array. Kernel lives in HashKernels
  * (one body for eval + generated code). */
case class MinHashSig(child: Expression, n: Int)
    extends UnaryExpression with ExpectsLongArray {
  val fname = "graft_minhash"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // non-nullable (null input → empty signature): a nullable output makes
  // joins on derived keys infer isnotnull(<this whole pipeline>) filters
  // that re-evaluate the expression tree once more per row
  override def nullable: Boolean = false
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    HashKernels.minhashSig(child.eval(input).asInstanceOf[ArrayData], n)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        graft.functions.HashKernels.minhashSig(${c.isNull} ? null : ${c.value}, $n);
    """,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }
  override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
}

/** 48-bit SimHash: bit i (contributing 2^(47−i)) set iff the ±1 vote over
  * elements' bit i is positive. Null input → 0 (see MinHashSig). */
case class SimHash48(child: Expression)
    extends UnaryExpression with ExpectsLongArray {
  val fname = "graft_simhash"
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    HashKernels.simhash48(child.eval(input).asInstanceOf[ArrayData])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      long ${ev.value} =
        graft.functions.HashKernels.simhash48(${c.isNull} ? null : ${c.value});
    """,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }
  override protected def withNewChildInternal(c: Expression): SimHash48 = copy(child = c)
}

/** 32-bit polynomial rolling hash over a string:
  * fold(chars, 0, h·31 + codePoint) mod 2³² — char-identical to the HOF
  * `aggregate(split(s,''), ...)` form and the DuckDB list_reduce twin
  * (ascii() = first code point; iteration here is by code point).
  *
  * Real `doGenCode` (static-kernel call), unlike the array-returning
  * natives: its children are codegen-able string expressions (concat_ws,
  * lower), and a CodegenFallback here would drag that whole subtree onto
  * the interpreted path per row. */
case class PolyHash32(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_polyhash expects STRING, got ${other.sql}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L else nullSafeEval(v)
  }
  override def nullSafeEval(input: Any): Any =
    HashKernels.polyHash32(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        long ${ev.value} = ${c.isNull} ? 0L :
          graft.functions.HashKernels.polyHash32(${c.value});
      """,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(c: Expression): PolyHash32 = copy(child = c)
}

/** Random-hyperplane LSH signatures for ALL tables in one fused pass:
  * out[t] = the `nPlanes` sign bits of table t's hyperplane projections,
  * packed MSB-first into a LONG. Arithmetic is identical to the staged HOF
  * form (Similarity.lshBucket's documented LCG): component for
  * (t, plane p, dim d) = ((1103515245·idx + 12345) mod 2³¹)/2³¹ − 0.5 with
  * idx = (31t+1)·nPlanes·nDims + p·nDims + d. The HOF form dispatches one
  * interpreted lambda per (table × plane × dim) = 2048 per row; this is one
  * JVM loop. */
case class HyperplaneSigs(child: Expression, nPlanes: Int, nDims: Int, nTables: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_hyperplane expects ARRAY<FLOAT|DOUBLE>, got ${other.sql}")
  }
  // lazy: child.dataType is illegal to call until the child resolves,
  // and copy()/withNewChildInternal construct this node mid-analysis
  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false // null input → empty array (see MinHashSig)
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    HashKernels.hyperplaneSigs(child.eval(input).asInstanceOf[ArrayData],
      nPlanes, nDims, nTables, isFloat)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        graft.functions.HashKernels.hyperplaneSigs(
          ${c.isNull} ? null : ${c.value}, $nPlanes, $nDims, $nTables, $isFloat);
    """,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }
  override protected def withNewChildInternal(c: Expression): HyperplaneSigs = copy(child = c)
}

object HashExpressions {
  def minhashSig(hs: Column, n: Int): Column =
    Bridge.column(MinHashSig(Bridge.expression(hs), n))
  def simhash48(hs: Column): Column =
    Bridge.column(SimHash48(Bridge.expression(hs)))
  def polyHash32(s: Column): Column =
    Bridge.column(PolyHash32(Bridge.expression(s)))
  def hyperplaneSigs(vec: Column, nPlanes: Int, nDims: Int, nTables: Int): Column =
    Bridge.column(HyperplaneSigs(Bridge.expression(vec), nPlanes, nDims, nTables))
}
