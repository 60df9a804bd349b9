package graft.ops

import org.apache.spark.sql.DataFrame

/** Scan-parallelism guard for CPU-heavy kernels (shingling, window
  * hashing, edit distance, per-row feature math).
  *
  * Spark parallelizes a parquet scan by row-group splits. When the input
  * is physically small or written as a single row group — exactly the
  * shape of a compact documents/embeddings table whose EXPLODED form is
  * 100-1000× larger — the scan stage, and with it every codegen'd kernel
  * fused into it, runs in ONE task regardless of cores. A full-size
  * corpus never has this problem (thousands of splits), so the fix must
  * not cost anything there: `cpu()` consults the optimizer's size
  * estimate and inserts a round-robin repartition ONLY below a byte
  * threshold. Above it, the input's own splits provide the parallelism
  * and the call is the identity — no 100 TB corpus ever shuffles here.
  *
  * The threshold (`graft.fanout.maxInputBytes`, default 256 MiB) is the
  * point where a redistribution shuffle of the COMPACT pre-explode rows
  * is trivially cheap (sub-second) next to the fanned-out kernel work.
  */
object FanOut {
  val ConfKey = "graft.fanout.maxInputBytes"
  val DefaultMaxInputBytes: Long = 256L << 20

  /** Hash-repartition on `cols` with an EXPLICIT partition count (the
    * session's numShufflePartitions — scale-adaptive via conf, never a
    * constant). Used below every cache a key-equi self-join reads: a
    * keyless-count `repartition(col)` may be AQE-coalesced inside the
    * cached plan, which erases the HashPartitioning the downstream join
    * needs to skip its exchanges; an explicit count is left alone by AQE,
    * so InMemoryTableScan reports HashPartitioning(cols, N) and the join
    * reuses it on both sides. */
  def byKey(df: DataFrame, cols: org.apache.spark.sql.Column*): DataFrame =
    df.repartition(df.sparkSession.sessionState.conf.numShufflePartitions,
      cols: _*)

  def cpu(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val maxBytes = spark.conf.getOption(ConfKey).map(_.toLong)
      .getOrElse(DefaultMaxInputBytes)
    val size = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (size <= maxBytes)
      df.repartition(spark.sessionState.conf.numShufflePartitions)
    else df
  }
}
