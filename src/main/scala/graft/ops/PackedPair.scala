package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Candidate-pair key packing: (idA, idB) → one 64-bit key
  * (`idA << 32 | idB`) so pair-level shuffles (dedupe `distinct`,
  * pair-count aggregations) carry half the grouping-key bytes and hash
  * once per row.
  *
  * Contract: BOTH ids must lie in [0, 2³²). `pack` enforces it — an
  * out-of-range id (negative, or ≥ 2³²) would sign-extend/overflow into
  * the other id's lane and silently corrupt the pair, so it raises a
  * runtime error instead. The check is two integer comparisons per row
  * inside codegen — noise next to the hash it feeds.
  */
private[graft] object PackedPair {
  val MaxId: Long = 0xFFFFFFFFL

  private def checked(id: Column): Column = {
    val idL = id.cast("long")
    when(idL < 0 || idL > lit(MaxId),
      raise_error(concat(
        lit("graft: pair-packed id outside [0, 2^32): "), idL.cast("string"))))
      .otherwise(idL)
  }

  /** One guarded packed key; unpack with [[idA]]/[[idB]]. */
  def pack(a: Column, b: Column): Column =
    shiftleft(checked(a), 32).bitwiseOR(checked(b))

  def idA(pair: Column): Column = shiftrightunsigned(pair, 32)
  def idB(pair: Column): Column = pair.bitwiseAND(lit(MaxId))
}
