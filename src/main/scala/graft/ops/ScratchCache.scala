package graft.ops

import org.apache.spark.sql.Dataset

/** Lifecycle registry for operator-internal persisted intermediates.
  *
  * Multi-pass operators (dedup, similarity, size-batching) persist frames
  * that are consumed more than once INSIDE one logical result — the
  * postings index both sides of a self-join, the cell assignment feeds the
  * radii pass and both pair-join sides. Those frames must stay cached until
  * the caller materializes the result, so the operator cannot unpersist
  * them itself; but left alone in a long-lived session they accumulate
  * executor storage until eviction pressure degrades unrelated jobs.
  *
  * Every such persist registers here; a session-level caller releases them
  * between jobs with [[releaseAll]] (harness twins: `Bench` clears between
  * timed queries, `Verify` between dumped queries). Frames whose last
  * consumer is INSIDE the operator are not registered — they are
  * unpersisted eagerly at the internal materialization point instead.
  */
object ScratchCache {
  private val frames = scala.collection.mutable.ArrayBuffer.empty[Dataset[_]]

  /** Register an operator-internal persisted frame for later release. */
  private[graft] def register[T <: Dataset[_]](df: T): T = synchronized {
    frames += df
    df
  }

  /** Unpersist every registered frame (blocking=false) and forget them.
    * Safe to call between jobs; a released frame that is re-read simply
    * recomputes. */
  def releaseAll(): Unit = synchronized {
    frames.foreach(_.unpersist())
    frames.clear()
  }

  /** Number of currently-registered frames (monitoring/tests). */
  def registered: Int = synchronized(frames.size)
}
