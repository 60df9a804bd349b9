package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
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

  /** FNV-1a 64-bit over UTF-16 code units — a full-width key for
    * set-arithmetic consumers where 32-bit birthday collisions would
    * merge distinct shingles. */
  def fnv64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    val n = s.length
    while (i < n) {
      h ^= s.charAt(i).toLong
      h *= 0x100000001b3L
      i += 1
    }
    h
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

/** PUBLIC static kernels for generated code: whole-stage codegen calls
  * `graft.functions.HashKernels.<kernel>(...)` directly (Scala object →
  * static forwarder), so every native expression participates in codegen —
  * a CodegenFallback would interpret the whole child subtree (e.g. q38's
  * concat_ws) per row and break the enclosing WholeStageCodegen span. Must
  * stay public: Janino-generated classes cannot see `private[graft]`.
  * Null handling lives IN the kernels (null/short input → the expression's
  * documented identity), so interpreted `eval` and generated code share
  * one body. */
object HashKernels {
  import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

  def polyHash32(s: UTF8String): Long =
    if (s == null) 0L else ShingleKernel.polyHash32(s.toString)

  /** Content-defined chunk hashes (q147's fused kernel): tokenize, cut
    * AFTER tokens whose polyHash32 lands in residue class 0 (mod `m`),
    * emit polyHash32 of each token run joined by single spaces —
    * arithmetic identical to the staged HOF form (tokens → boundary
    * filter → slice → concat_ws → hash), NON-distinct, document order.
    * Empty array for null/token-free docs. */
  def cdcChunkHashes(s: UTF8String, m: Int): ArrayData = {
    if (s == null) return new GenericArrayData(Array.empty[Long])
    val toks = ShingleKernel.tokenize(s)
    if (toks.length == 0) return new GenericArrayData(Array.empty[Long])
    val out = new scala.collection.mutable.ArrayBuffer[Any](8)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < toks.length) {
      if (sb.length > 0) sb.append(' ')
      sb.append(toks(i))
      if (ShingleKernel.polyHash32(toks(i)) % m == 0) {
        out += ShingleKernel.polyHash32(sb.toString)
        sb.setLength(0)
      }
      i += 1
    }
    if (sb.length > 0) out += ShingleKernel.polyHash32(sb.toString)
    new GenericArrayData(out.toArray)
  }

  /** m-bucket hashed-feature fractions (q246): count tokens per
    * PolyHash32 residue class, divide by token count — the same doubles
    * as the staged `list_filter`-per-bucket form. EMPTY for null/
    * token-free docs. */
  def bucketFracs(s: UTF8String, m: Int): ArrayData = {
    if (s == null) return new GenericArrayData(Array.empty[Double])
    val toks = ShingleKernel.tokenize(s)
    if (toks.length == 0) return new GenericArrayData(Array.empty[Double])
    val counts = new Array[Long](m)
    var i = 0
    while (i < toks.length) {
      counts((ShingleKernel.polyHash32(toks(i)) % m).toInt) += 1L
      i += 1
    }
    val n = toks.length.toDouble
    val out = new Array[Double](m)
    i = 0
    while (i < m) { out(i) = counts(i).toDouble / n; i += 1 }
    new GenericArrayData(out)
  }

  /** Distinct word-k-shingles; null for null/short docs (nullable expr). */
  def wordShingles(s: UTF8String, k: Int): ArrayData = {
    if (s == null) return null
    val sh = ShingleKernel.distinctShingles(ShingleKernel.tokenize(s), k)
    if (sh == null) null
    else new GenericArrayData(sh.map(UTF8String.fromString(_): Any))
  }

  /** Distinct shingle PolyHash32s; EMPTY for null/short docs. */
  def wordShingleHashes(s: UTF8String, k: Int): ArrayData = {
    if (s == null) return new GenericArrayData(Array.empty[Long])
    val sh = ShingleKernel.distinctShingles(ShingleKernel.tokenize(s), k)
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

  /** Distinct shingle 64-bit hashes (FNV-1a over UTF-16 code units of the
    * shingle string); EMPTY for null/short docs. The 64-bit space makes
    * collision-merge negligible at corpus scale (expected collisions
    * ≈ n²/2⁶⁵ — the 32-bit [[wordShingleHashes]] expects ~100 merged
    * shingles already at 1M distinct), so set-arithmetic consumers
    * (q124's source-overlap masks) can aggregate on the hash alone. */
  def wordShingleHashes64(s: UTF8String, k: Int): ArrayData = {
    if (s == null) return new GenericArrayData(Array.empty[Long])
    val sh = ShingleKernel.distinctShingles(ShingleKernel.tokenize(s), k)
    if (sh == null) return new GenericArrayData(Array.empty[Long])
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i < sh.length) {
      seen.add(ShingleKernel.fnv64(sh(i)))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  /** PolyHash32 of every element of a string array (order preserved, no
    * dedup — min-style consumers are multiplicity-insensitive); EMPTY for
    * null input; null ELEMENTS hash to 0 (polyHash32's null convention —
    * reachable from SQL via `graft_array_polyhash(array('a', NULL))`). */
  def arrayPolyHash(arr: ArrayData): ArrayData = {
    if (arr == null) return new GenericArrayData(Array.empty[Long])
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) =
        if (arr.isNullAt(i)) 0L
        else ShingleKernel.polyHash32(arr.getUTF8String(i).toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** WINNOWING fingerprints (Schleimer et al. 2003, the MOSS algorithm):
    * polyHash32 every k-codepoint gram, slide a w-gram window, select the
    * window minimum with RIGHTMOST tie-break (the robust-winnowing rule),
    * return the distinct selected hashes in first-selection order. Any
    * shared substring of ≥ k+w−1 chars is guaranteed a shared
    * fingerprint; expected density is 2/(w+1) of the grams. Gram hashes
    * are the SAME codepoint polyHash32 fold as `polyHash(substr(text,
    * i, k))`, so a DuckDB list replay is bit-identical. Docs with fewer
    * than k+w−1 codepoints emit nothing (window loop is empty) — the
    * SQL twin's empty range does the same. */
  def winnowHashes(s: UTF8String, k: Int, w: Int): ArrayData = {
    if (s == null) return new GenericArrayData(Array.empty[Long])
    val str = s.toString
    val cps = str.codePoints().toArray
    val m = cps.length - k + 1
    if (m < w) return new GenericArrayData(Array.empty[Long])
    val g = new Array[Long](m)
    var i = 0
    while (i < m) {
      var acc = 0L
      var j = 0
      while (j < k) {
        acc = (acc * 31 + cps(i + j)) % 4294967296L
        j += 1
      }
      g(i) = acc
      i += 1
    }
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var jj = 0
    while (jj + w <= m) {
      var best = jj
      var t = jj + 1
      while (t < jj + w) {
        if (g(t) <= g(best)) best = t // <= : rightmost minimal wins
        t += 1
      }
      seen.add(g(best))
      jj += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }

  /** Distinct length-L CHARACTER windows (codepoint-indexed, matching
    * Spark `substring`/`length` and DuckDB `substr`/`length` semantics on
    * supplementary-plane text), first-occurrence order; EMPTY for
    * null/short docs. One pass: the staged
    * `array_distinct(transform(sequence(...), i -> substr(text, i, L)))`
    * pays an interpreted lambda dispatch per window — it dominated q58's
    * scan. */
  def charWindows(s: UTF8String, winLen: Int): ArrayData = {
    if (s == null) return new GenericArrayData(Array.empty[Any])
    val str = s.toString
    val n = str.codePointCount(0, str.length)
    if (n < winLen) return new GenericArrayData(Array.empty[Any])
    // JVM-char offset of each codepoint start (+ end sentinel)
    val starts = new Array[Int](n + 1)
    var ci = 0
    var idx = 0
    while (idx < n) {
      starts(idx) = ci
      ci += Character.charCount(str.codePointAt(ci))
      idx += 1
    }
    starts(n) = str.length
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i + winLen <= n) {
      seen.add(str.substring(starts(i), starts(i + winLen)))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(out)
  }

  /** XXH64 (seed 42 — Spark's `xxhash64` seed) of every distinct
    * length-L character window, paired with the window's 1-based
    * CODEPOINT start, first-occurrence order; EMPTY for null/short docs.
    *
    * The hash is computed straight over the document's UTF-8 bytes — no
    * per-window String/UTF8String allocation — so a df-count pre-pass
    * over ALL windows of a corpus moves only 12-byte structs. The window
    * text itself is materialized later, for surviving hashes only, via
    * `substring(text, pos, L)` (codepoint-indexed, same as this kernel's
    * `pos`). Hash equality admits xxh64 collisions; consumers regroup by
    * the actual window text before emitting (q58's sets stage). */
  def charWindowHashPos(s: UTF8String, winLen: Int): ArrayData = {
    import org.apache.spark.sql.catalyst.InternalRow
    if (s == null) return new GenericArrayData(Array.empty[Any])
    val b = s.getBytes
    // byte offset of each codepoint start (+ end sentinel)
    var n = 0
    var i = 0
    while (i < b.length) {
      if ((b(i) & 0xC0) != 0x80) n += 1
      i += 1
    }
    if (n < winLen) return new GenericArrayData(Array.empty[Any])
    val starts = new Array[Int](n + 1)
    i = 0; var cp = 0
    while (i < b.length) {
      if ((b(i) & 0xC0) != 0x80) { starts(cp) = i; cp += 1 }
      i += 1
    }
    starts(n) = b.length
    val seen = new java.util.LinkedHashMap[java.lang.Long, java.lang.Integer]()
    i = 0
    while (i + winLen <= n) {
      val off = starts(i)
      val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        b, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + off,
        starts(i + winLen) - off, 42L)
      seen.putIfAbsent(h, i + 1): Unit
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      out(j) = InternalRow(e.getKey.longValue(), e.getValue.intValue())
      j += 1
    }
    new GenericArrayData(out)
  }

  /** MinHash signature (see MinHashSig); EMPTY for null/empty input. */
  def minhashSig(hs: ArrayData, n: Int): ArrayData = {
    if (hs == null) return new GenericArrayData(Array.empty[Long])
    val m = hs.numElements()
    if (m == 0) return new GenericArrayData(Array.empty[Long])
    val P = 4294967291L
    val sig = Array.fill(n)(P)
    var i = 0
    while (i < m) {
      val h = hs.getLong(i)
      var j = 0
      while (j < n) {
        val v = ((2L * j + 1) * h + j.toLong * j + 7) % P
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  /** 48-bit SimHash (see SimHash48); 0 for null input. */
  def simhash48(hs: ArrayData): Long = {
    if (hs == null) return 0L
    val m = hs.numElements()
    val votes = new Array[Int](48)
    var i = 0
    while (i < m) {
      val h = hs.getLong(i)
      var b = 0
      while (b < 48) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 48) { // b is the LSB-order bit index; MSB-first assembly
      fp = fp * 2 + (if (votes(b) > 0) 1L else 0L)
      b += 1
    }
    fp
  }

  /** Hyperplane LSH buckets for all tables (see HyperplaneSigs); EMPTY for
    * null input. */
  def hyperplaneSigs(vec: ArrayData, nPlanes: Int, nDims: Int, nTables: Int,
                     isFloat: Boolean): ArrayData = {
    if (vec == null) return new GenericArrayData(Array.empty[Long])
    val n = math.min(vec.numElements(), nDims)
    val out = new Array[Long](nTables)
    var t = 0
    while (t < nTables) {
      val base = (31L * t + 1L) * (nPlanes.toLong * nDims)
      var bucket = 0L
      var p = 0
      while (p < nPlanes) {
        var proj = 0.0
        var d = 0
        while (d < n) {
          val idx = base + p.toLong * nDims + d
          val comp = ((1103515245L * idx + 12345L) % 2147483648L).toDouble /
            2147483648.0 - 0.5
          val x = if (isFloat) vec.getFloat(d).toDouble else vec.getDouble(d)
          proj += x * comp
          d += 1
        }
        bucket = bucket * 2 + (if (proj > 0) 1L else 0L)
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }
}

/** `graft_word_shingles(text, k)` → ARRAY<STRING>: distinct word-k-shingle
  * strings, first-occurrence order; NULL for docs with < k tokens (the
  * caller's `isNotNull` filter replaces the staged `size(ws) >= k`).
  * Generates code: one static-kernel call, keeping consumers inside
  * WholeStageCodegen. */
case class WordShingles(child: Expression, k: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_word_shingles expects STRING, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    HashKernels.wordShingles(child.eval(input).asInstanceOf[UTF8String], k)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        graft.functions.HashKernels.wordShingles(${c.isNull} ? null : ${c.value}, $k);
      boolean ${ev.isNull} = ${ev.value} == null;
    """)
  }
  override protected def withNewChildInternal(c: Expression): WordShingles =
    copy(child = c)
}

/** `graft_word_shingle_hashes(text, k)` → ARRAY<BIGINT>: distinct
  * PolyHash32 values of the doc's word-k-shingles, first-occurrence order;
  * empty array for short/NULL docs (matching the staged
  * `array_distinct(transform(shingles(tokens(text)), polyHash))` which
  * yields [] there — its consumers filter on signature size). */
case class WordShingleHashes(child: Expression, k: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_word_shingle_hashes expects STRING, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    HashKernels.wordShingleHashes(child.eval(input).asInstanceOf[UTF8String], k)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        graft.functions.HashKernels.wordShingleHashes(${c.isNull} ? null : ${c.value}, $k);
    """,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }
  override protected def withNewChildInternal(c: Expression): WordShingleHashes =
    copy(child = c)
}

/** `graft_shingle_hashes64(text, k)` → ARRAY<BIGINT>: distinct FNV-1a-64
  * values of the doc's word-k-shingles, first-occurrence order; empty for
  * short/NULL docs. Full-width sibling of [[WordShingleHashes]] for
  * consumers doing SET arithmetic on the hash itself (32-bit birthday
  * collisions would merge distinct shingles' sets at corpus scale). */
case class WordShingleHashes64(child: Expression, k: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_shingle_hashes64 expects STRING, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    HashKernels.wordShingleHashes64(
      child.eval(input).asInstanceOf[UTF8String], k)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        graft.functions.HashKernels.wordShingleHashes64(${c.isNull} ? null : ${c.value}, $k);
    """,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }
  override protected def withNewChildInternal(c: Expression): WordShingleHashes64 =
    copy(child = c)
}

/** `graft_array_polyhash(arr)` → ARRAY<BIGINT>: PolyHash32 of each element
  * of a string array in one fused pass — lets consumers that already hold
  * shingle STRINGS (e.g. a cached verification set) derive hash-space
  * inputs without re-tokenizing the document. */
case class ArrayPolyHash(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_array_polyhash expects ARRAY<STRING>, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    HashKernels.arrayPolyHash(
      child.eval(input).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        graft.functions.HashKernels.arrayPolyHash(${c.isNull} ? null : ${c.value});
    """,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }
  override protected def withNewChildInternal(c: Expression): ArrayPolyHash =
    copy(child = c)
}

/** `graft_char_windows(text, L)` → ARRAY<STRING>: distinct L-character
  * windows, first-occurrence order; empty array for short/NULL docs. The
  * fused exact-substring-dedup scan kernel (q58). */
case class CharWindows(child: Expression, winLen: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_char_windows expects STRING, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    HashKernels.charWindows(child.eval(input).asInstanceOf[UTF8String], winLen)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        graft.functions.HashKernels.charWindows(${c.isNull} ? null : ${c.value}, $winLen);
    """,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }
  override protected def withNewChildInternal(c: Expression): CharWindows =
    copy(child = c)
}

/** `graft_char_window_hashes(text, L)` → ARRAY<STRUCT<h: BIGINT, pos: INT>>:
  * xxh64 of each distinct L-character window + its 1-based codepoint start,
  * first-occurrence order; empty for short/NULL docs. The allocation-free
  * df-count scan for exact-substring dedup (q58): window STRINGS are only
  * materialized downstream, for hashes that survive the count filter. */
case class CharWindowHashPos(child: Expression, winLen: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_char_window_hashes expects STRING, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("h", LongType, nullable = false),
      StructField("pos", IntegerType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    HashKernels.charWindowHashPos(child.eval(input).asInstanceOf[UTF8String], winLen)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        graft.functions.HashKernels.charWindowHashPos(${c.isNull} ? null : ${c.value}, $winLen);
    """,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }
  override protected def withNewChildInternal(c: Expression): CharWindowHashPos =
    copy(child = c)
}

/** `graft_cdc_chunk_hashes(text, m)` → ARRAY<BIGINT>: polyHash32 of each
  * content-defined chunk (token runs cut after hash-residue-0 tokens,
  * mod m), non-distinct, document order; empty for null/token-free docs.
  * The fused q147 scan kernel — the staged HOF form dispatches the
  * per-token hash and per-chunk slice/concat through the interpreter. */
case class CdcChunkHashes(child: Expression, m: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if m > 0 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      "graft_cdc_chunk_hashes modulus must be positive")
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_cdc_chunk_hashes expects STRING, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    HashKernels.cdcChunkHashes(child.eval(input).asInstanceOf[UTF8String], m)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        graft.functions.HashKernels.cdcChunkHashes(${c.isNull} ? null : ${c.value}, $m);
    """,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }
  override protected def withNewChildInternal(c: Expression): CdcChunkHashes =
    copy(child = c)
}

/** `graft_winnow(text, k, w)` → distinct winnowing fingerprints (see
  * [[HashKernels.winnowHashes]]). */
case class WinnowHashes(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if k > 0 && w > 0 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      "graft_winnow gram length and window must be positive")
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_winnow expects STRING, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    HashKernels.winnowHashes(child.eval(input).asInstanceOf[UTF8String], k, w)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        graft.functions.HashKernels.winnowHashes(${c.isNull} ? null : ${c.value}, $k, $w);
    """,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }
  override protected def withNewChildInternal(c: Expression): WinnowHashes =
    copy(child = c)
}

/** `graft_bucket_fracs(text, m)` → ARRAY<DOUBLE>: the m-bucket
  * hashed-feature vector of a document — fraction of tokens whose
  * PolyHash32 lands in each residue class (q246's feature build). One
  * tokenize pass and one integer histogram, vs the staged HOF form's m
  * interpreted `filter` passes over the hash list (measured 12.2 s → the
  * kernel's cost at sf1 on the q246 cache fill). EMPTY array for
  * null/token-free docs — arithmetic (count/nt double division) is
  * identical to the staged form, so the oracle's staged replay matches. */
case class BucketFracs(child: Expression, m: Int) extends UnaryExpression {
  require(m > 0)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_bucket_fracs expects STRING, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    HashKernels.bucketFracs(child.eval(input).asInstanceOf[UTF8String], m)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        graft.functions.HashKernels.bucketFracs(${c.isNull} ? null : ${c.value}, $m);
    """,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }
  override protected def withNewChildInternal(c: Expression): BucketFracs =
    copy(child = c)
}

object ShingleExpressions {
  def wordShingles(text: Column, k: Int): Column =
    Bridge.column(WordShingles(Bridge.expression(text), k))
  def wordShingleHashes(text: Column, k: Int): Column =
    Bridge.column(WordShingleHashes(Bridge.expression(text), k))
  def wordShingleHashes64(text: Column, k: Int): Column =
    Bridge.column(WordShingleHashes64(Bridge.expression(text), k))
  def arrayPolyHash(arr: Column): Column =
    Bridge.column(ArrayPolyHash(Bridge.expression(arr)))
  def charWindows(text: Column, winLen: Int): Column =
    Bridge.column(CharWindows(Bridge.expression(text), winLen))
  def charWindowHashPos(text: Column, winLen: Int): Column =
    Bridge.column(CharWindowHashPos(Bridge.expression(text), winLen))
  def cdcChunkHashes(text: Column, m: Int): Column =
    Bridge.column(CdcChunkHashes(Bridge.expression(text), m))
  def winnowHashes(text: Column, k: Int, w: Int): Column =
    Bridge.column(WinnowHashes(Bridge.expression(text), k, w))
  def bucketFracs(text: Column, m: Int): Column =
    Bridge.column(BucketFracs(Bridge.expression(text), m))
}
