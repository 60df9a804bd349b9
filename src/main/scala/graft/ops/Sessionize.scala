package graft.ops

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Open-session state for [[Sessionize.stateful]]. Top level: the state
  * store's codegen'd encoder cannot reference a case class nested inside
  * an object (observed Janino failure resolving member accessors). */
private[graft] final case class SessState(
    sessionId: Long, lastMicros: Long, startMicros: Long, n: Long)

/** Sessionization — gap-based event sessions per user.
  *
  * Two implementations with identical semantics:
  *  - `relational`: lag + running-sum session ids (the batch form; one
  *    shuffle on user_id, oracle-checkable in SQL);
  *  - `stateful`: Structured Streaming `flatMapGroupsWithState` with
  *    event-time timeout (the incremental form for live streams — custom
  *    state is the KeyValueGroupedDataset path SURVEY §1.3 points to).
  * Batch/stream parity is asserted in SessionizeSpec.
  */
object Sessionize {

  final case class SessionOut(
      user_id: Long, session_id: Long, n_events: Long,
      start_ts: Timestamp, end_ts: Timestamp)

  /** Batch sessionization: session breaks where the gap to the previous
    * event exceeds `gapMinutes`. */
  def relational(events: DataFrame, gapMinutes: Int): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    val gapSec = gapMinutes * 60L
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > gapSec * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("session_id",
        sum(col("new_session")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("start_ts"), max(col("ts")).as("end_ts"))
  }


  /** Streaming sessionization over a user-keyed stream.
    *
    * Default (`flushAll = false`): a session is emitted only when a later
    * event CLOSES it (gap exceeded) — the only sound emission rule for an
    * open-ended stream, where any open session may still grow; the open
    * tail stays in state.
    *
    * `flushAll = true` is the batch-catchup drain: after folding the
    * group's input, the still-open session is emitted too and state is
    * cleared. Correct exactly when this invocation sees each user's full
    * remaining history (batch execution, or the last AvailableNow batch) —
    * that is the mode whose output equals `relational`, asserted in
    * AdvancedSpec as full set equality. */
  def stateful(events: Dataset[(Long, Timestamp)], gapMinutes: Int,
               flushAll: Boolean = false): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMicros = gapMinutes * 60L * 1000000L
    events.groupByKey(_._1)
      .flatMapGroupsWithState[List[SessState], SessionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Timestamp)], state: GroupState[List[SessState]]) =>
          // micro-batch may carry any subset; order within user then fold
          val sorted = rows.map(r => r._2.getTime * 1000L +
            (r._2.getNanos % 1000000) / 1000).toSeq.sorted
          var st = state.getOption.flatMap(_.headOption)
          val out = scala.collection.mutable.ListBuffer.empty[SessionOut]
          def toTs(micros: Long): Timestamp = {
            val t = new Timestamp(micros / 1000000L * 1000L)
            t.setNanos(((micros % 1000000L) * 1000L).toInt)
            t
          }
          sorted.foreach { m =>
            st match {
              case Some(s) if m - s.lastMicros <= gapMicros =>
                st = Some(s.copy(lastMicros = m, n = s.n + 1))
              case Some(s) =>
                out += SessionOut(user, s.sessionId, s.n,
                  toTs(s.startMicros), toTs(s.lastMicros))
                st = Some(SessState(s.sessionId + 1, m, m, 1))
              case None =>
                st = Some(SessState(1, m, m, 1))
            }
          }
          if (flushAll) {
            st.foreach(s => out += SessionOut(user, s.sessionId, s.n,
              toTs(s.startMicros), toTs(s.lastMicros)))
            state.remove()
          } else {
            state.update(st.toList)
          }
          out.iterator
      }
  }
}
