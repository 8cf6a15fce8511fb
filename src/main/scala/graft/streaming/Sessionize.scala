package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming: per-user sessionization over the events
  * stream with `flatMapGroupsWithState` — the Spark-native form of "keep
  * arbitrary per-key state across micro-batches". State is one small
  * Session per live key, evicted by processing-time timeout, so memory is
  * bounded by the number of concurrently-active keys regardless of stream
  * volume.
  */
object Sessionize {

  case class Event(user_id: Long, ts_micros: Long, event_type: String)

  case class SessionState(
      start: Long, last: Long, n: Int, purchases: Int)

  case class SessionOut(
      user_id: Long, session_start: Long, session_end: Long,
      n_events: Int, n_purchases: Int)

  /** Gap-based sessionization: an event more than `gapMicros` after the
    * previous one closes the current session and opens a new one. Emits
    * closed sessions; the open session flushes on state timeout
    * (streaming) or immediately when `emitOpen` (batch mode, where end of
    * data closes every session — batch execution never fires timeouts).
    */
  def sessions(events: Dataset[Event], gapMicros: Long,
      emitOpen: Boolean = false): Dataset[SessionOut] = {
    implicit val outEnc = Encoders.product[SessionOut]
    implicit val stEnc = Encoders.product[SessionState]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout)(
        (userId: Long, it: Iterator[Event], state: GroupState[SessionState]) => {
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(userId, s.start, s.last, s.n, s.purchases))
          } else {
            val sorted = it.toSeq.sortBy(e => (e.ts_micros, e.event_type))
            val closed = Seq.newBuilder[SessionOut]
            var cur = state.getOption
            sorted.foreach { e =>
              cur match {
                case Some(s) if e.ts_micros - s.last <= gapMicros =>
                  cur = Some(s.copy(last = e.ts_micros, n = s.n + 1,
                    purchases = s.purchases + (if (e.event_type == "purchase") 1 else 0)))
                case Some(s) =>
                  closed += SessionOut(userId, s.start, s.last, s.n, s.purchases)
                  cur = Some(SessionState(e.ts_micros, e.ts_micros, 1,
                    if (e.event_type == "purchase") 1 else 0))
                case None =>
                  cur = Some(SessionState(e.ts_micros, e.ts_micros, 1,
                    if (e.event_type == "purchase") 1 else 0))
              }
            }
            if (emitOpen) {
              cur.foreach(s =>
                closed += SessionOut(userId, s.start, s.last, s.n, s.purchases))
            } else cur.foreach { s =>
              state.update(s)
              state.setTimeoutDuration("30 seconds")
            }
            closed.result().iterator
          }
        })
  }

  /** Batch-mode equivalent over the fixture table (flatMapGroupsWithState
    * runs in batch too — every group seen once, no timeouts). Used by the
    * spec to cross-check against a window-function formulation.
    */
  def sessionizeBatch(spark: SparkSession, sfDir: String,
      gapMicros: Long): Dataset[SessionOut] = {
    import spark.implicits._
    val ev = graft.Tables.t(spark, sfDir, "events")
      .select(col("user_id"),
        unix_micros(col("ts")).as("ts_micros"), col("event_type"))
      .as[Event]
    sessions(ev, gapMicros, emitOpen = true)
  }
}
