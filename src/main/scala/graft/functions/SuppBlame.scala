package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** q195's per-order supplier-blame statistics as ONE native aggregate —
  * distinct-supplier count, distinct-FLAGGED-supplier count, and the
  * unique flagged supplier — over packed `suppkey << 1 | flag` longs.
  *
  * Same semantics as `collect_set(pk)` followed by in-row
  * `array_distinct(transform(...))` / `filter(...)` derivation, but the
  * buffer is one primitive sorted-distinct long array mutated in place
  * (no per-row boxing, no HashSet, no post-aggregation array kernels) and
  * the derivation runs once per GROUP at eval. The buffer is bounded by
  * the order's distinct (supplier, flag) count (~4-8), never by line
  * count — the multi-distinct Expand (which triples every fact row) and
  * the two-shuffle pre-aggregate alternative both stay dead.
  *
  * Output: `struct<n_supp:int, n_bad:int, bad_supp:long>`; `bad_supp` is
  * the MINIMUM flagged suppkey (callers filter `n_bad = 1`, making it the
  * unique one; −1 when no line is flagged).
  */
final case class SuppBlame(
    pk: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SuppBlame.Buf] {

  override def children: Seq[Expression] = Seq(pk)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n_supp", IntegerType, nullable = false),
    StructField("n_bad", IntegerType, nullable = false),
    StructField("bad_supp", LongType, nullable = false)))

  override def createAggregationBuffer(): SuppBlame.Buf =
    new SuppBlame.Buf(new Array[Long](8), 0)

  override def update(buf: SuppBlame.Buf, input: InternalRow): SuppBlame.Buf = {
    val v = pk.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: SuppBlame.Buf, other: SuppBlame.Buf): SuppBlame.Buf = {
    var i = 0
    while (i < other.n) { buf.insert(other.a(i)); i += 1 }
    buf
  }

  override def eval(buf: SuppBlame.Buf): Any = {
    // buffer is sorted-distinct pks; flag is the LSB, so pks of one
    // supplier are adjacent and supplier order == pk order
    var nSupp = 0; var nBad = 0; var badSupp = -1L
    var prevSupp = -1L
    var i = 0
    while (i < buf.n) {
      val supp = buf.a(i) >>> 1
      if (supp != prevSupp) { nSupp += 1; prevSupp = supp }
      if ((buf.a(i) & 1L) == 1L) {
        nBad += 1
        if (badSupp < 0) badSupp = supp
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](nSupp, nBad, badSupp))
  }

  override def serialize(buf: SuppBlame.Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.n * 8)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putLong(buf.a(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): SuppBlame.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.insert(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): SuppBlame =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SuppBlame =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SuppBlame =
    copy(pk = newChildren(0))
  override def prettyName: String = "graft_supp_blame"
}

object SuppBlame {

  /** Sorted-distinct long accumulator: binary-search insert into a flat
    * array (doubling growth). Sizes are order-bounded (~4-8 distinct
    * (supplier, flag) pks), so the O(n) shift on insert never matters. */
  final class Buf(var a: Array[Long], var n: Int) {
    def insert(v: Long): Unit = {
      var lo = 0; var hi = n
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (a(mid) < v) lo = mid + 1 else hi = mid
      }
      if (lo < n && a(lo) == v) return
      if (n == a.length) a = java.util.Arrays.copyOf(a, n * 2)
      System.arraycopy(a, lo, a, lo + 1, n - lo)
      a(lo) = v
      n += 1
    }
  }

  /** Column form: `SuppBlame(pk)` under a groupBy. */
  def apply(pk: Column): Column =
    Bridge.column(SuppBlame(Bridge.expression(pk)).toAggregateExpression())
}
