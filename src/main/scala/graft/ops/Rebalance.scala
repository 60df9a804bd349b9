package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation (SURVEY O2 — the reference shuffles its region list to
  * spread heavy partitions, flyte/build.py:146).
  *
  * Spark-native toolkit: AQE skew-join handles joins automatically (we
  * leave it on); for skewed AGGREGATIONS the classic fix is two-phase
  * salting — pre-aggregate on (key, salt) to break a hot key across
  * reducers, then final-aggregate on key. Only worth it for algebraic
  * aggregates; `saltedSum`/`saltedCount` below keep the contract explicit.
  */
object Rebalance {

  /** Two-phase salted sum/count: `groupBy(key) agg sum(valueCol), count`
    * with the first shuffle on (key, salt % nSalts). Result is identical
    * to the unsalted aggregate (sum/count are algebraic); the hot key's
    * rows land on `nSalts` reducers instead of one. */
  def saltedSumCount(df: DataFrame, keyCols: Seq[String], valueCol: String,
                     nSalts: Int = 16): DataFrame = {
    val salt = pmod(spark_partition_id() + monotonically_increasing_id(), lit(nSalts))
    val keys = keyCols.map(col)
    val partial = df
      .withColumn("__salt", salt)
      .groupBy(keys :+ col("__salt"): _*)
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
    partial.groupBy(keys: _*)
      .agg(sum(col("__psum")).as(s"sum_$valueCol"),
        sum(col("__pcnt")).as("n"))
  }

  /** Round-robin rebalance of planned work units (the reference's
    * `shuffle(gti_partitions)`): even task sizes without a sort. */
  def rebalance(df: DataFrame, partitions: Int): DataFrame =
    df.repartition(partitions)
}
