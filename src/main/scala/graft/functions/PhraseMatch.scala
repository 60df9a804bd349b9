package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Multi-pattern substring matching (phrase blocklists, license markers,
  * contamination canaries) as ONE Aho–Corasick automaton pass per document.
  *
  * The naive plan — `|patterns|` separate `contains(text, p)` predicates —
  * is O(|patterns| · |text|) per row and regrows the plan every time the
  * blocklist grows; real curation blocklists run to 10⁴–10⁶ phrases, where
  * the automaton's O(|text| + matches) single scan is the only shape that
  * survives. The automaton is built ONCE on the driver from the literal
  * pattern list and shipped to executors inside the expression (standard
  * reference-object codegen), so per-row work never touches the pattern
  * count. Matching is case-sensitive raw-substring, exactly `contains`
  * (and DuckDB `contains`) semantics.
  *
  * Reference analog: flytemosaic curates scene lists by id/url membership
  * (flytemosaic/datasets/utils.py); the text-blocklist form is the same
  * gate at corpus scale.
  */
final class AhoCorasick(val patterns: Array[String]) extends Serializable {
  require(patterns.nonEmpty, "empty pattern list")
  require(patterns.forall(_.nonEmpty), "empty pattern")

  /** goto maps, fail links and merged output-id lists, built lazily on
    * first use per JVM (the arrays themselves never serialize — only the
    * pattern list does). */
  @transient private lazy val (gotoMap, fail, out):
      (Array[java.util.HashMap[Character, Integer]], Array[Int], Array[Array[Int]]) = {
    val gotoB = scala.collection.mutable.ArrayBuffer(
      new java.util.HashMap[Character, Integer]())
    val outB = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.ArrayBuffer.empty[Int])
    var id = 0
    while (id < patterns.length) {
      var s = 0
      val p = patterns(id)
      var i = 0
      while (i < p.length) {
        val c = Character.valueOf(p.charAt(i))
        val nxt = gotoB(s).get(c)
        s = if (nxt != null) nxt.intValue()
        else {
          gotoB += new java.util.HashMap[Character, Integer]()
          outB += scala.collection.mutable.ArrayBuffer.empty[Int]
          gotoB(s).put(c, Integer.valueOf(gotoB.size - 1))
          gotoB.size - 1
        }
        i += 1
      }
      outB(s) += id
      id += 1
    }
    val failA = new Array[Int](gotoB.size)
    val bfs = new java.util.ArrayDeque[Integer]()
    gotoB(0).forEach((_, s) => { failA(s) = 0; bfs.add(s) })
    while (!bfs.isEmpty) {
      val u = bfs.poll().intValue()
      gotoB(u).forEach { (c, vBox) =>
        val v = vBox.intValue()
        bfs.add(vBox)
        var f = failA(u)
        while (f != 0 && gotoB(f).get(c) == null) f = failA(f)
        val t = gotoB(f).get(c)
        failA(v) = if (t != null && t.intValue() != v) t.intValue() else 0
        // BFS visits shallower nodes first, so out(fail) is final here
        outB(v) ++= outB(failA(v))
      }
    }
    (gotoB.toArray, failA, outB.map(_.toArray).toArray)
  }

  /** Distinct matched pattern ids, ascending; EMPTY array for null text. */
  def matchIds(text: UTF8String): ArrayData = {
    if (text == null) return new GenericArrayData(Array.empty[Int])
    val s = text.toString
    val nWords = (patterns.length + 63) >>> 6
    val mask = new Array[Long](nWords)
    var state = 0
    var i = 0
    while (i < s.length) {
      val c = Character.valueOf(s.charAt(i))
      while (state != 0 && gotoMap(state).get(c) == null) state = fail(state)
      val t = gotoMap(state).get(c)
      state = if (t != null) t.intValue() else 0
      val ids = out(state)
      var j = 0
      while (j < ids.length) {
        mask(ids(j) >>> 6) |= 1L << (ids(j) & 63)
        j += 1
      }
      i += 1
    }
    val hits = scala.collection.mutable.ArrayBuffer.empty[Any]
    var id2 = 0
    while (id2 < patterns.length) {
      if ((mask(id2 >>> 6) & (1L << (id2 & 63))) != 0L) hits += id2
      id2 += 1
    }
    new GenericArrayData(hits.toArray)
  }
}

/** `graft_phrase_matches(text)` → ARRAY<INT> of distinct matched pattern
  * ids (ascending). Codegen keeps the enclosing WholeStageCodegen span
  * alive by calling the shared automaton through a reference object. */
case class PhraseMatches(child: Expression, patterns: Seq[String])
    extends UnaryExpression {
  @transient private lazy val ac = new AhoCorasick(patterns.toArray)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_phrase_matches expects STRING, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false
  override def eval(input: InternalRow): Any =
    ac.matchIds(child.eval(input).asInstanceOf[UTF8String])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val acRef = ctx.addReferenceObj("graftAc", ac, classOf[AhoCorasick].getName)
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        $acRef.matchIds(${c.isNull} ? null : ${c.value});
    """,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }
  override protected def withNewChildInternal(c: Expression): PhraseMatches =
    copy(child = c)
}

object PhraseMatch {
  /** Distinct matched pattern ids (ascending INT array) of `patterns`
    * inside `text` — one automaton scan regardless of pattern count. */
  def phraseMatches(text: Column, patterns: Seq[String]): Column =
    Bridge.column(PhraseMatches(Bridge.expression(text), patterns))
}
