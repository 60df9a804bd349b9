package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Left as-of join: for each left row, attach the right row with the
  * greatest `rightTime <= leftTime` for the same key (inclusive, like
  * DuckDB/kdb `ASOF JOIN`). Spark has no built-in as-of operator; the
  * naive formulation (range join + max per left row) explodes to
  * O(|L|·|R| per key) intermediate rows.
  *
  * Spark-first plan: tag both sides, `unionByName`, one hash shuffle on
  * the key, one in-partition sort by (time, side), and a running
  * `last(…, ignoreNulls)` window fill — linear in |L|+|R| regardless of
  * how many right rows precede each left row. At cluster scale this is a
  * single Exchange reused by the sort-based Window; per-key skew only
  * matters if one key holds billions of rows (then pre-bucket by time
  * range and stitch boundaries).
  *
  * Right payload travels as ONE struct column so that a right row whose
  * payload columns are legitimately null still wins the as-of race —
  * per-column `last(ignoreNulls)` would instead leak an older value
  * forward (struct non-null per right row ⇒ row-wise fill semantics).
  *
  * Ties: a right row AT the left timestamp matches (`<=`); the (time,
  * side) sort puts right rows first at equal times. Multiple right rows
  * on the exact same (key, time) are resolved by the caller pre-picking
  * one (as-of is undefined there in every engine).
  */
object AsOfJoin {

  def leftAsOf(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String): DataFrame = {
    val payload = right.columns.filterNot(c => keys.contains(c)).toSeq
    val clash = payload.filterNot(_ == rightTime).filter(left.columns.contains)
    require(clash.isEmpty,
      s"right payload columns ${clash.mkString(",")} collide with left schema; rename first")

    val rTagged = right
      .select(keys.map(col) :+
        struct(payload.map(col): _*).as("__asof_payload") :+
        col(rightTime).as("__t"): _*)
      .withColumn("__side", lit(0))
    val lTagged = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))

    val unioned = lTagged.unionByName(rTagged, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = unioned
      .withColumn("__asof_hit", last(col("__asof_payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val outCols = left.columns.map(col).toSeq ++
      payload.map(p => col(s"__asof_hit.$p").as(p))
    filled.select(outCols: _*)
  }
}
