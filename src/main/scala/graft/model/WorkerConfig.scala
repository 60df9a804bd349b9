package graft.model

/** Worker tuning heuristics — the engine twin of the reference's GDAL
  * worker config (flytemosaic/gdal_configs.py:1-32: cache fractions and IO
  * concurrency derived from worker memory). Spark's equivalents are SQL
  * confs; these are the settings the rest of this library is designed
  * around, scaled by executor shape the way the reference scales caches by
  * `memory_gb`.
  */
object WorkerConfig {

  /** Recommended per-session confs for executors with `memoryGb` heap and
    * `cores` slots over a corpus of roughly `datasetBytes`. Heuristics:
    * shuffle partitions sized so a post-shuffle partition is ~128 MiB
    * (floored at 2× total cores for small data); scan splits at 128 MiB;
    * ~30% of the heap for storage (the reference gives GDAL's VSI cache a
    * third); AQE left on to re-plan skew at runtime. */
  def recommended(memoryGb: Int, cores: Int, totalCores: Int,
                  datasetBytes: Long): Map[String, String] = {
    require(memoryGb > 0 && cores > 0 && totalCores > 0)
    val targetPartitionBytes = 128L * 1024 * 1024
    val shufflePartitions = math.max(2L * totalCores,
      datasetBytes / targetPartitionBytes + 1).toString
    Map(
      "spark.sql.shuffle.partitions" -> shufflePartitions,
      "spark.sql.files.maxPartitionBytes" -> targetPartitionBytes.toString,
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.memory.storageFraction" -> "0.3",
      // one in-flight remote fetch per core, like the reference's
      // one-VSI-cache-per-worker sizing
      "spark.reducer.maxReqsInFlight" -> (cores * 2).toString,
    )
  }

  /** Additional confs for RESTARTABLE streaming jobs (the q34/q48/q65
    * family run for real): RocksDB-backed state keeps streaming state on
    * local disk with incremental checkpoint uploads — the HDFS-backed
    * default holds every key in executor heap, which caps state at
    * memory size exactly where dedup registries and session maps grow
    * with the corpus. Changelog checkpointing ships deltas, not full
    * snapshots, per commit. (The engine's AvailableNow parity gates keep
    * the default store: their state is fixture-small and the oracle
    * contract cares about values, not store placement.) */
  def streamingRecommended: Map[String, String] = Map(
    "spark.sql.streaming.stateStore.providerClass" ->
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" ->
      "true",
    // no-data micro-batches only advance the watermark; for a long-lived
    // stream that IS wanted (state eviction) — keep them on
    "spark.sql.streaming.noDataMicroBatches.enabled" -> "true",
  )
}
