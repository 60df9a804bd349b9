package graft.agg

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded per-key top-k as a typed Aggregator — the scale-correct
  * replacement for `row_number().over(partitionBy(key))` ranking: the
  * window form shuffles EVERY scored row to its key's single reducer
  * (per-query corpus-sized partitions at kNN scale), while an Aggregator
  * gets hash-aggregate partial combine, so each map task ships at most k
  * rows per key — shuffle volume partitions × keys × k, independent of
  * corpus size.
  *
  * Total order: score DESC, then id ASC on ties — identical to
  * `Window.orderBy(cos.desc, cid)`, so rankings (and oracle hashes) match
  * the window form exactly. Buffer is a flat unsorted array trimmed to k
  * on insert/merge (k is small; O(k) insert beats heap constant factors).
  */
class TopKAgg(k: Int)
    extends Aggregator[(Long, Double), Seq[(Long, Double)], Seq[(Long, Double)]] {

  private def better(a: (Long, Double), b: (Long, Double)): Boolean =
    a._2 > b._2 || (a._2 == b._2 && a._1 < b._1)

  private def trim(xs: Seq[(Long, Double)]): Seq[(Long, Double)] =
    if (xs.length <= k) xs
    else xs.sortWith((a, b) => better(a, b)).take(k)

  override def zero: Seq[(Long, Double)] = Vector.empty

  override def reduce(buf: Seq[(Long, Double)], in: (Long, Double)): Seq[(Long, Double)] =
    trim(buf :+ ((in._1, in._2)))

  override def merge(a: Seq[(Long, Double)], b: Seq[(Long, Double)]): Seq[(Long, Double)] =
    trim(a ++ b)

  override def finish(buf: Seq[(Long, Double)]): Seq[(Long, Double)] =
    buf.sortWith((a, b) => better(a, b))

  override def bufferEncoder: Encoder[Seq[(Long, Double)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Double)]]()
  override def outputEncoder: Encoder[Seq[(Long, Double)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Double)]]()
}
