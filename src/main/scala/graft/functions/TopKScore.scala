package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Bounded per-key top-k as a NATIVE Catalyst aggregate — the hot tail of
  * every ANN path (q31/q32/q35/q40/q45/q49). Same semantics as the typed
  * `graft.agg.TopKAgg` (score DESC, id ASC tiebreak; ≤ k rows shipped per
  * key per map task — shuffle volume independent of candidate count), but
  * the buffer is two primitive arrays mutated in place instead of an
  * immutable `Seq[(Long, Double)]` round-tripped through an
  * ExpressionEncoder on every update/merge. Measured ~0.2-0.3 s off the
  * per-query tail at sf0.1 (ProfQ32: typed tail ≈ 0.35 s of a 0.89 s
  * query).
  *
  * Output: `array<struct<cid:long, cos:double>>`, sorted best-first —
  * callers posexplode to (cid, cos, rank).
  */
final case class TopKScore(
    cid: Expression, score: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKScore.Buf] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(cid, score)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("cid", LongType, nullable = false),
    StructField("cos", DoubleType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): TopKScore.Buf =
    new TopKScore.Buf(new Array[Long](k), new Array[Double](k), 0)

  override def update(buf: TopKScore.Buf, input: InternalRow): TopKScore.Buf = {
    val c = cid.eval(input)
    val s = score.eval(input)
    if (c != null && s != null)
      buf.insert(c.asInstanceOf[Long], s.asInstanceOf[Double])
    buf
  }

  override def merge(buf: TopKScore.Buf, other: TopKScore.Buf): TopKScore.Buf = {
    var i = 0
    while (i < other.n) { buf.insert(other.ids(i), other.scores(i)); i += 1 }
    buf
  }

  override def eval(buf: TopKScore.Buf): Any = {
    // 0.0-normalized negation: a bare -score would order +0.0 before -0.0
    // (java.lang.Double total order) where the typed TopKAgg ties them and
    // breaks on id — keep the two implementations bit-identical
    val order = (0 until buf.n).sortBy(i =>
      (if (buf.scores(i) == 0.0) 0.0 else -buf.scores(i), buf.ids(i)))
    new GenericArrayData(order.map { i =>
      new GenericInternalRow(Array[Any](buf.ids(i), buf.scores(i)))
    }.toArray[Any])
  }

  override def serialize(buf: TopKScore.Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.n * 16)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putLong(buf.ids(i)); bb.putDouble(buf.scores(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKScore.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.insert(bb.getLong, bb.getDouble); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKScore =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKScore =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKScore =
    copy(cid = newChildren(0), score = newChildren(1))
  override def prettyName: String = "graft_topk_score"
}

object TopKScore {

  /** k-bounded accumulator: flat unsorted arrays, O(k) worst-slot scan on
    * insert-when-full (k is small; beats heap constant factors and stays
    * allocation-free per row). Order contract: (score DESC, id ASC). */
  final class Buf(val ids: Array[Long], val scores: Array[Double], var n: Int) {
    private def worse(i: Int, id: Long, s: Double): Boolean =
      scores(i) < s || (scores(i) == s && ids(i) > id)

    def insert(id: Long, s: Double): Unit = {
      if (n < ids.length) { ids(n) = id; scores(n) = s; n += 1 }
      else {
        // find the worst resident; replace it if the newcomer beats it
        var w = 0
        var i = 1
        while (i < n) { if (worse(w, ids(i), scores(i))) () else w = i; i += 1 }
        // w = index of the WORST entry (the one every other entry beats)
        if (worse(w, id, s)) { ids(w) = id; scores(w) = s }
      }
    }
  }

  /** Column form: `topKScore($"cid", $"cos", k)` under a groupBy. */
  def apply(cid: Column, score: Column, k: Int): Column =
    Bridge.column(TopKScore(Bridge.expression(cid),
      Bridge.expression(score), k).toAggregateExpression())
}
