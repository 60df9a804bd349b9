package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.model.WorkerConfig

class WorkerConfigSpec extends AnyFunSuite {
  test("streaming confs pin the RocksDB state store with changelog uploads") {
    val c = graft.model.WorkerConfig.streamingRecommended
    assert(c("spark.sql.streaming.stateStore.providerClass")
      .endsWith("RocksDBStateStoreProvider"))
    assert(c("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled") == "true")
    assert(c("spark.sql.streaming.noDataMicroBatches.enabled") == "true")
    // the provider class must actually exist on this Spark classpath —
    // a typo here would surface only at stream start in production
    assert(scala.util.Try(Class.forName(
      c("spark.sql.streaming.stateStore.providerClass"))).isSuccess)
  }

  test("shuffle partitions scale with data volume, floored by cluster width") {
    val small = WorkerConfig.recommended(16, 8, 64, datasetBytes = 1L << 30)
    assert(small("spark.sql.shuffle.partitions").toLong == 128) // 2 x 64 floor
    val big = WorkerConfig.recommended(16, 8, 1024, datasetBytes = 100L * (1L << 40))
    // 100 TB / 128 MiB ≈ 819k post-shuffle partitions — not a fixed 200
    assert(big("spark.sql.shuffle.partitions").toLong > 800000)
    assert(big("spark.sql.files.maxPartitionBytes").toLong == 128L * 1024 * 1024)
    assert(big("spark.sql.adaptive.skewJoin.enabled") == "true")
  }
}
