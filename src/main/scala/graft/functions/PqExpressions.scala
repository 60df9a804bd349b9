package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** PUBLIC static kernels for the product-quantization expressions (same
  * pattern as HashKernels/VectorKernels: one body shared by interpreted
  * eval and generated code; Janino only sees public members). Codebooks
  * are plan-embedded driver-trained arrays — bounded by design
  * (m × ksub × dsub floats, e.g. 8×16×8 = 4 KiB).
  *
  * All kernels L2-NORMALIZE the float vector first, so squared-L2 order
  * over codes equals cosine order over the original vectors (unit-sphere
  * equivalence: ||a−b||² = 2−2·cos). Zero-norm vectors stay zero.
  */
object PqKernels {

  private def normalized(x: ArrayData): Array[Float] = {
    val n = x.numElements()
    val v = new Array[Float](n)
    var nrm2 = 0.0
    var i = 0
    while (i < n) { val f = x.getFloat(i); v(i) = f; nrm2 += f.toDouble * f; i += 1 }
    if (nrm2 > 0.0) {
      val inv = 1.0 / math.sqrt(nrm2)
      i = 0
      while (i < n) { v(i) = (v(i) * inv).toFloat; i += 1 }
    }
    v
  }

  /** Plain-array encode — no normalization (used directly for RESIDUAL
    * vectors, which live off the unit sphere by construction). */
  def encodeArr(v: Array[Float], cents: Array[Array[Array[Float]]]): Array[Byte] = {
    val m = cents.length
    val out = new Array[Byte](m)
    var off = 0
    var sub = 0
    while (sub < m) {
      val cs = cents(sub)
      val dsub = cs(0).length
      var best = 0
      var bd = Double.MaxValue
      var c = 0
      while (c < cs.length) {
        val ct = cs(c)
        var d = 0.0
        var j = 0
        while (j < dsub) {
          val t = (if (off + j < v.length) v(off + j) else 0f).toDouble - ct(j)
          d += t * t
          j += 1
        }
        if (d < bd) { bd = d; best = c }
        c += 1
      }
      out(sub) = best.toByte
      off += dsub
      sub += 1
    }
    out
  }

  /** Plain-array LUT — no normalization (see encodeArr). */
  def lutArr(v: Array[Float], cents: Array[Array[Array[Float]]]): Array[Float] = {
    val m = cents.length
    val ksub = cents(0).length
    val out = new Array[Float](m * ksub)
    var off = 0
    var sub = 0
    while (sub < m) {
      val cs = cents(sub)
      val dsub = cs(0).length
      var c = 0
      while (c < ksub) {
        val ct = cs(c)
        var d = 0.0
        var j = 0
        while (j < dsub) {
          val t = (if (off + j < v.length) v(off + j) else 0f).toDouble - ct(j)
          d += t * t
          j += 1
        }
        out(sub * ksub + c) = d.toFloat
        c += 1
      }
      off += dsub
      sub += 1
    }
    out
  }

  /** Per-subspace argmin-L2 code bytes (m bytes, ksub ≤ 256). */
  def encode(x: ArrayData, cents: Array[Array[Array[Float]]]): Array[Byte] = {
    if (x == null) return null
    encodeArr(normalized(x), cents)
  }

  /** ADC lookup table: lut[sub·ksub + c] = ||q_sub − cent(sub)(c)||². Built
    * ONCE per query row; every corpus code then scores in O(m) lookups. */
  def lut(x: ArrayData, cents: Array[Array[Array[Float]]]): ArrayData = {
    if (x == null) return null
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      lutArr(normalized(x), cents))
  }

  private def residual(x: ArrayData, cell: Int,
                       cells: Array[Array[Float]]): Array[Float] = {
    val v = normalized(x)
    val c = cells(cell)
    val out = new Array[Float](v.length)
    var i = 0
    while (i < v.length) {
      out(i) = v(i) - (if (i < c.length) c(i) else 0f)
      i += 1
    }
    out
  }

  /** RESIDUAL encode (classic IVFADC, by_residual=true): code the offset
    * from the row's coarse cell centroid — residuals carry far less energy
    * than the vectors, so the same codebook budget quantizes finer. */
  def encodeResidual(x: ArrayData, cell: Int, cells: Array[Array[Float]],
                     cents: Array[Array[Array[Float]]]): Array[Byte] = {
    if (x == null) return null
    encodeArr(residual(x, cell, cells), cents)
  }

  /** Per-(query, probed cell) residual LUT — ADC then approximates
    * ||q_n − x_n||² = ||(q_n − c) − (x_n − c)||² exactly per cell. */
  def lutResidual(x: ArrayData, cell: Int, cells: Array[Array[Float]],
                  cents: Array[Array[Array[Float]]]): ArrayData = {
    if (x == null) return null
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      lutArr(residual(x, cell, cells), cents))
  }

  /** Approximate squared L2: sum of the code's m table entries. */
  def adc(lut: ArrayData, code: Array[Byte]): Double = {
    val m = code.length
    val ksub = lut.numElements() / m
    var d = 0.0
    var sub = 0
    while (sub < m) {
      d += lut.getFloat(sub * ksub + (code(sub) & 0xFF))
      sub += 1
    }
    d
  }
}

/** PQ code for a float vector: m bytes, one per subspace (argmin-L2 against
  * the plan-embedded codebook, after unit normalization). A 64-dim float
  * vector (256 B) compresses to m=8 bytes — 32× less scan IO on the ANN
  * path, which is the whole point of PQ at 100 TB. */
case class PqEncode(child: Expression, cents: Array[Array[Array[Float]]])
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_pq_encode expects ARRAY<FLOAT>, got ${other.sql}")
  }
  override def dataType: DataType = BinaryType
  override def nullSafeEval(input: Any): Any =
    PqKernels.encode(input.asInstanceOf[ArrayData], cents)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val c = child.genCode(ctx)
    val cref = ctx.addReferenceObj("pqCents", cents, "float[][][]")
    ev.copy(code = code"""
      ${c.code}
      byte[] ${ev.value} = graft.functions.PqKernels.encode(
        ${c.isNull} ? null : ${c.value}, $cref);
      boolean ${ev.isNull} = ${ev.value} == null;
    """)
  }
  override protected def withNewChildInternal(c: Expression): PqEncode =
    copy(child = c)
}

/** Per-query ADC lookup table (m·ksub floats) — computed once on the
  * (broadcast) query side, so the corpus scan pays O(m) per pair. */
case class PqLut(child: Expression, cents: Array[Array[Array[Float]]])
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_pq_lut expects ARRAY<FLOAT>, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    PqKernels.lut(input.asInstanceOf[ArrayData], cents)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val c = child.genCode(ctx)
    val cref = ctx.addReferenceObj("pqCents", cents, "float[][][]")
    ev.copy(code = code"""
      ${c.code}
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        graft.functions.PqKernels.lut(${c.isNull} ? null : ${c.value}, $cref);
      boolean ${ev.isNull} = ${ev.value} == null;
    """)
  }
  override protected def withNewChildInternal(c: Expression): PqLut =
    copy(child = c)
}

/** Asymmetric-distance computation: approximate ||q − c||² from a query's
  * LUT and a corpus code — m table lookups, no float vector touched. */
case class PqAdc(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_pq_adc expects (ARRAY<FLOAT>, BINARY), got (${l.sql}, ${r.sql})")
    }
  override def dataType: DataType = DoubleType
  override def nullSafeEval(lut: Any, code: Any): Any =
    PqKernels.adc(lut.asInstanceOf[ArrayData], code.asInstanceOf[Array[Byte]])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"${ev.value} = graft.functions.PqKernels.adc($l, $r);")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): PqAdc = copy(left = l, right = r)
}

/** Residual PQ code: (vector, assigned cell) → m bytes coding the offset
  * from the cell centroid (IVFADC by_residual=true). Both tables ride the
  * plan as reference objects like the flat forms. */
case class PqEncodeRes(left: Expression, right: Expression,
                       cells: Array[Array[Float]],
                       cents: Array[Array[Array[Float]]]) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_pq_encode_res expects (ARRAY<FLOAT>, INT), got (${l.sql}, ${r.sql})")
    }
  override def dataType: DataType = BinaryType
  override def nullSafeEval(vec: Any, cell: Any): Any =
    PqKernels.encodeResidual(vec.asInstanceOf[ArrayData],
      cell.asInstanceOf[Int], cells, cents)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val cellsRef = ctx.addReferenceObj("pqCells", cells, "float[][]")
    val centsRef = ctx.addReferenceObj("pqCents", cents, "float[][][]")
    nullSafeCodeGen(ctx, ev, (v, c) =>
      s"${ev.value} = graft.functions.PqKernels.encodeResidual($v, $c, $cellsRef, $centsRef);")
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): PqEncodeRes = copy(left = l, right = r)
}

/** Residual ADC LUT: (query vector, probed cell) → m·ksub floats. */
case class PqLutRes(left: Expression, right: Expression,
                    cells: Array[Array[Float]],
                    cents: Array[Array[Array[Float]]]) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_pq_lut_res expects (ARRAY<FLOAT>, INT), got (${l.sql}, ${r.sql})")
    }
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullSafeEval(vec: Any, cell: Any): Any =
    PqKernels.lutResidual(vec.asInstanceOf[ArrayData],
      cell.asInstanceOf[Int], cells, cents)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val cellsRef = ctx.addReferenceObj("pqCells", cells, "float[][]")
    val centsRef = ctx.addReferenceObj("pqCents", cents, "float[][][]")
    nullSafeCodeGen(ctx, ev, (v, c) =>
      s"${ev.value} = graft.functions.PqKernels.lutResidual($v, $c, $cellsRef, $centsRef);")
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): PqLutRes = copy(left = l, right = r)
}

object PqExpressions {
  def encode(vec: Column, cents: Array[Array[Array[Float]]]): Column =
    Bridge.column(PqEncode(Bridge.expression(vec), cents))
  def lut(vec: Column, cents: Array[Array[Array[Float]]]): Column =
    Bridge.column(PqLut(Bridge.expression(vec), cents))
  def adc(lut: Column, code: Column): Column =
    Bridge.column(PqAdc(Bridge.expression(lut), Bridge.expression(code)))
  def encodeResidual(vec: Column, cell: Column, cells: Array[Array[Float]],
                     cents: Array[Array[Array[Float]]]): Column =
    Bridge.column(PqEncodeRes(Bridge.expression(vec), Bridge.expression(cell),
      cells, cents))
  def lutResidual(vec: Column, cell: Column, cells: Array[Array[Float]],
                  cents: Array[Array[Array[Float]]]): Column =
    Bridge.column(PqLutRes(Bridge.expression(vec), Bridge.expression(cell),
      cells, cents))
}
