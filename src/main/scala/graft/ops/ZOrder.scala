package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) keys as pure Column arithmetic — the multi-column
  * clustering key for data layout (cf. [[graft.store.CommitLog.compact]]):
  * sorting by the interleaved key keeps files tight in BOTH dimensions,
  * so min/max file stats prune scans filtered on either column. All
  * shift/mask steps are Catalyst built-ins (whole-stage codegen'd, and
  * reproducible in plain SQL — the DuckDB oracle twin runs the same
  * magic numbers), no UDF.
  */
object ZOrder {

  /** Spread the low 16 bits of `v` to even bit positions (0, 2, .., 30). */
  private def spread16(v: Column): Column = {
    val m1 = lit(0x00FF00FFL); val m2 = lit(0x0F0F0F0FL)
    val m3 = lit(0x33333333L); val m4 = lit(0x55555555L)
    val a = v.bitwiseAND(lit(0xFFFFL))
    val b = a.bitwiseOR(shiftleft(a, 8)).bitwiseAND(m1)
    val c = b.bitwiseOR(shiftleft(b, 4)).bitwiseAND(m2)
    val d = c.bitwiseOR(shiftleft(c, 2)).bitwiseAND(m3)
    d.bitwiseOR(shiftleft(d, 1)).bitwiseAND(m4)
  }

  /** 32-bit Morton interleave of two 16-bit non-negative values: bit i of
    * `x` lands at position 2i, bit i of `y` at 2i+1. Values are clamped
    * to [0, 65535] (clamping, not truncation: out-of-range values keep
    * their ORDER at the boundary instead of wrapping). */
  def interleave16(x: Column, y: Column): Column = {
    def clamp(c: Column) =
      least(greatest(c.cast("long"), lit(0L)), lit(65535L))
    spread16(clamp(x)).bitwiseOR(shiftleft(spread16(clamp(y)), 1))
  }
}
