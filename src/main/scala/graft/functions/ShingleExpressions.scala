package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused word-shingle expressions: lowercase → whitespace-tokenize →
  * k-shingle → distinct (→ hash) in ONE JVM pass per document.
  *
  * The staged-HOF pipeline (`tokens` → `shingles` → `transform(polyHash)`)
  * is semantically identical but pays an interpreted lambda dispatch per
  * token/shingle plus intermediate array materialization per stage — it
  * dominated q27/q28/q29's runtime (the self-joined consumers re-evaluate
  * it once per join side). Tokenization parity with
  * `filter(split(lower(text), "\\s+"), w -> length(w) > 0)` is exact:
  * UTF8String.toLowerCase (what Spark's `lower` runs) then Java regex
  * split, empties dropped. Shingle strings and their PolyHash32 values are
  * char-identical to the staged form, so the DuckDB oracle twins keep
  * matching (DedupSpec asserts equality against the HOF pipeline).
  */
private[graft] object ShingleKernel {
  def tokenize(input: Any): Array[String] = {
    val lc = input.asInstanceOf[UTF8String].toLowerCase.toString
    val parts = lc.split("\\s+")
    val out = new scala.collection.mutable.ArrayBuffer[String](parts.length)
    var i = 0
    while (i < parts.length) {
      if (parts(i).nonEmpty) out += parts(i)
      i += 1
    }
    out.toArray
  }

  /** Distinct k-shingles in first-occurrence order; null when < k tokens. */
  def distinctShingles(toks: Array[String], k: Int): Array[String] = {
    if (toks.length < k) return null
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    val sb = new java.lang.StringBuilder(64)
    while (i <= toks.length - k) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    seen.toArray(new Array[String](seen.size))
  }

  /** PolyHash32 of a string — arithmetic identical to
    * HashExpressions.PolyHash32 (code-point fold, mod 2³²). */
  def polyHash32(s: String): Long = {
    var acc = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      acc = (acc * 31 + cp) % 4294967296L
      i += Character.charCount(cp)
    }
    acc
  }
}

/** PUBLIC static kernel for generated code: whole-stage codegen calls
  * `graft.functions.HashKernels.polyHash32(utf8)` directly (Scala object →
  * static forwarder), keeping PolyHash32's CHILDREN inside codegen — a
  * CodegenFallback would interpret the whole subtree (e.g. q38's
  * concat_ws) per row. Must stay public: Janino-generated classes cannot
  * see `private[graft]`. */
object HashKernels {
  def polyHash32(s: UTF8String): Long = ShingleKernel.polyHash32(s.toString)
}

/** `graft_word_shingles(text, k)` → ARRAY<STRING>: distinct word-k-shingle
  * strings, first-occurrence order; NULL for docs with < k tokens (the
  * caller's `isNotNull` filter replaces the staged `size(ws) >= k`). */
case class WordShingles(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_word_shingles expects STRING, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any = {
    val sh = ShingleKernel.distinctShingles(ShingleKernel.tokenize(input), k)
    if (sh == null) null
    else new GenericArrayData(sh.map(UTF8String.fromString(_): Any))
  }
  override protected def withNewChildInternal(c: Expression): WordShingles =
    copy(child = c)
}

/** `graft_word_shingle_hashes(text, k)` → ARRAY<BIGINT>: distinct
  * PolyHash32 values of the doc's word-k-shingles, first-occurrence order;
  * empty array for short/NULL docs (matching the staged
  * `array_distinct(transform(shingles(tokens(text)), polyHash))` which
  * yields [] there — its consumers filter on signature size). */
case class WordShingleHashes(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_word_shingle_hashes expects STRING, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) new GenericArrayData(Array.empty[Long]) else nullSafeEval(v)
  }
  override def nullSafeEval(input: Any): Any = {
    val sh = ShingleKernel.distinctShingles(ShingleKernel.tokenize(input), k)
    if (sh == null) return new GenericArrayData(Array.empty[Long])
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i < sh.length) {
      seen.add(ShingleKernel.polyHash32(sh(i)))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): WordShingleHashes =
    copy(child = c)
}

object ShingleExpressions {
  def wordShingles(text: Column, k: Int): Column =
    Bridge.column(WordShingles(Bridge.expression(text), k))
  def wordShingleHashes(text: Column, k: Int): Column =
    Bridge.column(WordShingleHashes(Bridge.expression(text), k))
}
