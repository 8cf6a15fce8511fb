package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom cross-batch streaming state #2 (besides [[Sessionize]]): a
  * per-key ADMISSION CAP — admit only the first `n` events per
  * (user, day), carrying the admitted count across micro-batches. The
  * shape of per-user daily caps, freemium metering, notification
  * throttling: state is one Int per active key, the smallest possible
  * stateful operator, and the one whose correctness depends entirely on
  * cross-batch state surviving the checkpoint.
  *
  * Within a micro-batch the group iterator is sorted by (ts, event_id)
  * before admission, so the admitted set is deterministic; across
  * batches determinism requires the source to deliver a key's events in
  * event-time order (the gated query stages ts-split files — the shape
  * of date-partitioned landing dirs, which arrive in order at a daily
  * pipeline). At scale the NoTimeout state here would be
  * EventTimeTimeout keyed to the watermark so past days evict;
  * AvailableNow drains never fire timeouts, so the gate pins the
  * admission semantics, not eviction.
  */
object RateLimit {

  case class Ev(user_id: Long, day: String, ts_us: Long, event_id: Long)
  case class Admitted(event_id: Long, user_id: Long, ts_us: Long)

  def admitFirstN(events: Dataset[Ev], n: Int): Dataset[Admitted] = {
    implicit val keyEnc = Encoders.tuple(Encoders.scalaLong, Encoders.STRING)
    implicit val outEnc = Encoders.product[Admitted]
    implicit val stEnc = Encoders.scalaInt
    events.groupByKey(e => (e.user_id, e.day))
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: (Long, String), it: Iterator[Ev], state: GroupState[Int]) => {
          val already = state.getOption.getOrElse(0)
          if (already >= n) Iterator.empty
          else {
            val sorted = it.toSeq.sortBy(e => (e.ts_us, e.event_id))
            val admit = sorted.take(n - already)
            state.update(already + admit.length)
            admit.iterator.map(e => Admitted(e.event_id, e.user_id, e.ts_us))
          }
        })
  }
}
