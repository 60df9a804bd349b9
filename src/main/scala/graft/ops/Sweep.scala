package graft.ops

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Dataset}

/** Interval-overlap analytics: max concurrent intervals per group via a
  * DISTRIBUTED sweep line.
  *
  * The single-node form — `sum(delta) over (partition by g order by t)`
  * then `max` — funnels each group through one reducer: at 100 TB a hot
  * group (one event type, one tenant) is a straggler by construction.
  * This operator is the grouped generalization of the [[SizeBatch]] /
  * [[Skyline]] two-pass prefix scan:
  *
  *   1. Range-partition the ±1 endpoint stream by (g, t, delta) and sort
  *      within partitions — groups larger than a partition span SEVERAL
  *      consecutive partitions, which is exactly what removes the
  *      one-reducer-per-group bottleneck.
  *   2. Pass 1: per-partition, per-group delta subtotals — at most
  *      (groups-in-partition) rows each, collected to the driver. The
  *      driver holds O(P + G) counters, never endpoints.
  *   3. Driver: per-group exclusive prefix sums in partition order give
  *      each (partition, group) its running-count seed; broadcast.
  *   4. Pass 2: re-walk each partition with seeded per-group counters,
  *      tracking each group's local max; a final tiny groupBy takes the
  *      global max over ≤ P rows per group.
  *
  * Endpoint convention is half-open [s, e): at equal t the −1 (close)
  * sorts before the +1 (open), so touching intervals do not overlap.
  */
object Sweep {

  /** @param points (g, t, delta) endpoint stream: +1 at interval start,
    *               −1 at interval end
    * @param parts  range-exchange partition count
    * @return (g STRING, max_concurrent BIGINT) — bit-identical to the
    *         windowed running-sum formulation */
  def maxConcurrent(points: Dataset[(String, Long, Long)], parts: Int): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._
    val n = math.max(parts, 1)

    val ranged = ScratchCache.register(points
      .toDF("g", "t", "delta")
      .as[(String, Long, Long)]
      .repartitionByRange(n, $"g", $"t", $"delta")
      .sortWithinPartitions($"g", $"t", $"delta")
      .persist())

    // Pass 1: per-(partition, group) subtotals — sorted input means each
    // group is one contiguous run, so a single running entry suffices.
    val subtotals: Array[(Int, String, Long)] = ranged
      .mapPartitions { it =>
        val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, Long)]
        val pid = TaskContext.getPartitionId()
        var g: String = null
        var sum = 0L
        it.foreach { case (gg, _, d) =>
          if (g == null || g != gg) {
            if (g != null) out += ((pid, g, sum))
            g = gg; sum = 0L
          }
          sum += d
        }
        if (g != null) out += ((pid, g, sum))
        out.iterator
      }
      .collect()

    // Driver: per-group exclusive prefix sum in partition order.
    val offsets = scala.collection.mutable.HashMap.empty[(Int, String), Long]
    val acc = scala.collection.mutable.HashMap.empty[String, Long]
    subtotals.sortBy(_._1).foreach { case (pid, g, sum) =>
      val prev = acc.getOrElse(g, 0L)
      offsets((pid, g)) = prev
      acc(g) = prev + sum
    }
    val bcOffsets = spark.sparkContext.broadcast(offsets.toMap)

    // Pass 2: seeded running counts; one (group, localMax) row per
    // contiguous group run per partition.
    // mapPartitionsWithIndex, NOT TaskContext.getPartitionId(): must be
    // THIS RDD's index, which a downstream UnionRDD pipelining this
    // stage would shift (see GlobalIndex)
    spark.createDataset(ranged.rdd.mapPartitionsWithIndex { (pid, it) =>
        val off = bcOffsets.value
        val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
        var g: String = null
        var run = 0L
        var mx = Long.MinValue
        def flush(): Unit = if (g != null) out += ((g, mx))
        it.foreach { case (gg, _, d) =>
          if (g == null || g != gg) {
            flush()
            g = gg
            run = off.getOrElse((pid, gg), 0L)
            mx = Long.MinValue
          }
          run += d
          if (run > mx) mx = run
        }
        flush()
        out.iterator
      })
      .toDF("g", "m")
      .groupBy("g")
      .agg(org.apache.spark.sql.functions.max("m").as("max_concurrent"))
  }
}
