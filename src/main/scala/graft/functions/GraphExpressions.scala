package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Graph kernels (PUBLIC for Janino — generated code cannot see
  * `private[graft]`, same convention as [[HashKernels]]). */
object GraphKernels {

  /** Sorted-distinct i<j pairs of a BIGINT array, each packed
    * `a << 32 | b` with a < b — one fused pass replacing the interpreted
    * `flatten(transform(..., slice(...)))` HOF cascade (which pays a
    * lambda dispatch per element and materializes nested arrays; it
    * dominated the co-occurrence edge build in q103). Ids are
    * bounds-checked into [0, 2³²) — the [[graft.ops.PackedPair]]
    * contract. NULL input → empty; NULL elements are skipped. Group size
    * is capped: the output is quadratic in the group, so a group that
    * would emit > 2²⁴ pairs fails loudly instead of silently allocating
    * gigabytes — callers bound co-occurrence groups by construction
    * (order size, block caps à la maxDf). */
  def packedPairs(arr: ArrayData): ArrayData = {
    if (arr == null) return new GenericArrayData(Array.empty[Long])
    val n = arr.numElements()
    val a = new Array[Long](n)
    var m = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) { a(m) = arr.getLong(i); m += 1 }
      i += 1
    }
    java.util.Arrays.sort(a, 0, m)
    // in-place dedup of the sorted prefix
    var d = 0
    i = 0
    while (i < m) {
      if (d == 0 || a(d - 1) != a(i)) { a(d) = a(i); d += 1 }
      i += 1
    }
    if (d > 0 && (a(0) < 0L || a(d - 1) > 0xFFFFFFFFL))
      throw new IllegalArgumentException(
        s"graft_packed_pairs: id outside [0, 2^32): ${if (a(0) < 0) a(0) else a(d - 1)}")
    val nPairs = d.toLong * (d - 1) / 2
    if (nPairs > (1L << 24))
      throw new IllegalArgumentException(
        s"graft_packed_pairs: group of $d distinct ids would emit $nPairs " +
          "pairs; bound the group (e.g. a co-occurrence cap) before pairing")
    val out = new Array[Long](nPairs.toInt)
    var k = 0
    i = 0
    while (i < d) {
      val hi = a(i) << 32
      var j = i + 1
      while (j < d) { out(k) = hi | a(j); k += 1; j += 1 }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** [[packedPairs]] plus one DIAGONAL entry `id << 32 | id` per distinct
    * id: a basket's pair keys and its item-membership keys come out of
    * ONE kernel call, so a single explode + groupBy(count) shuffle yields
    * both co-occurrence counts and per-item frequencies — the diagonal is
    * collision-free because real pairs are strictly a < b. Same
    * bounds/cap contract as [[packedPairs]]. */
  def packedPairsAndSingles(arr: ArrayData): ArrayData = {
    if (arr == null) return new GenericArrayData(Array.empty[Long])
    val n = arr.numElements()
    val a = new Array[Long](n)
    var m = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) { a(m) = arr.getLong(i); m += 1 }
      i += 1
    }
    java.util.Arrays.sort(a, 0, m)
    var d = 0
    i = 0
    while (i < m) {
      if (d == 0 || a(d - 1) != a(i)) { a(d) = a(i); d += 1 }
      i += 1
    }
    if (d > 0 && (a(0) < 0L || a(d - 1) > 0xFFFFFFFFL))
      throw new IllegalArgumentException(
        s"graft_packed_pairs_singles: id outside [0, 2^32): ${if (a(0) < 0) a(0) else a(d - 1)}")
    val nPairs = d.toLong * (d - 1) / 2
    if (nPairs > (1L << 24))
      throw new IllegalArgumentException(
        s"graft_packed_pairs_singles: group of $d distinct ids would emit $nPairs " +
          "pairs; bound the group (e.g. a co-occurrence cap) before pairing")
    val out = new Array[Long](nPairs.toInt + d)
    var k = 0
    i = 0
    while (i < d) {
      val hi = a(i) << 32
      out(k) = hi | a(i) // diagonal: membership key
      k += 1
      var j = i + 1
      while (j < d) { out(k) = hi | a(j); k += 1; j += 1 }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `graft_packed_pairs(ids)` → ARRAY<BIGINT>: sorted-distinct i<j packed
  * id pairs (see [[GraphKernels.packedPairs]]). */
case class PackedPairsOf(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_packed_pairs expects ARRAY<BIGINT>, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    GraphKernels.packedPairs(child.eval(input).asInstanceOf[ArrayData])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        graft.functions.GraphKernels.packedPairs(${c.isNull} ? null : ${c.value});
    """,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }
  override protected def withNewChildInternal(c: Expression): PackedPairsOf =
    copy(child = c)
}

/** `graft_packed_pairs_singles(ids)` → ARRAY<BIGINT>: i<j packed pairs
  * plus the per-id diagonal (see [[GraphKernels.packedPairsAndSingles]]). */
case class PackedPairsAndSinglesOf(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_packed_pairs_singles expects ARRAY<BIGINT>, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    GraphKernels.packedPairsAndSingles(child.eval(input).asInstanceOf[ArrayData])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        graft.functions.GraphKernels.packedPairsAndSingles(${c.isNull} ? null : ${c.value});
    """,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }
  override protected def withNewChildInternal(c: Expression): PackedPairsAndSinglesOf =
    copy(child = c)
}

object GraphFunctions {
  /** Column API for [[PackedPairsOf]]. */
  def packedPairs(ids: Column): Column =
    Bridge.column(PackedPairsOf(Bridge.expression(ids)))

  /** Column API for [[PackedPairsAndSinglesOf]]. */
  def packedPairsAndSingles(ids: Column): Column =
    Bridge.column(PackedPairsAndSinglesOf(Bridge.expression(ids)))
}
