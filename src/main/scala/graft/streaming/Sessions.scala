package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming gap-based sessionization — the arbitrary-stateful-op surface
  * (`flatMapGroupsWithState` + event-time timeout). Batch twin:
  * [[graft.ops.Reports.sessionize]] (query `b15`).
  *
  * State per user is one open session (constant size); a session closes
  * and is emitted when (a) a new event arrives more than `gapMinutes`
  * after the last one, or (b) the event-time watermark passes the
  * session's gap horizon (the timeout) — so state is bounded by active
  * users, not history, and late events within the watermark still extend
  * their session. This is the streaming twin of the reference's
  * "open hour may still be written" rule applied to sessions.
  */
object Sessions {

  case class Ev(ts: Timestamp, user_id: Long, value: Double)
  case class OpenSession(startUs: Long, lastUs: Long, n: Long, sum: Double)
  case class ClosedSession(user_id: Long, session_start: Timestamp,
                           n_events: Long, duration_sec: Long, sum_value: Double)

  def sessionizeStream(events: Dataset[Ev], gapMinutes: Int,
                       watermark: String = "1 hour"): Dataset[ClosedSession] = {
    val gapUs = gapMinutes * 60L * 1000000L
    implicit val outEnc = Encoders.product[ClosedSession]
    implicit val stateEnc = Encoders.product[OpenSession]
    implicit val keyEnc = Encoders.scalaLong

    // microsecond-exact event time (getTime truncates to ms; getNanos
    // carries the fraction) — matches the batch twin's unix_micros math
    def micros(t: Timestamp): Long =
      t.getTime / 1000 * 1000000L + t.getNanos / 1000

    def close(userId: Long, s: OpenSession): ClosedSession =
      ClosedSession(userId, new Timestamp(s.startUs / 1000),
        s.n, (s.lastUs - s.startUs) / 1000000L, math.round(s.sum * 100) / 100.0)

    def fn(userId: Long, batch: Iterator[Ev],
           state: GroupState[OpenSession]): Iterator[ClosedSession] = {
      if (batch.isEmpty && state.hasTimedOut) {
        // watermark passed the gap horizon → the open session is final
        val out = state.getOption.map(close(userId, _)).iterator
        state.remove()
        return out
      }
      // Merge the open state session (an interval) and the batch's events
      // (points) exactly as the batch twin would see them: sort by start,
      // fold adjacent items whose gap is within gapUs. Late events within
      // the watermark therefore extend sessions BACKWARD, merge with each
      // other, and bridge into the open session — byte-identical grouping
      // to Reports.sessionize over the same data. Everything but the
      // latest merged session is separated by > gap on both sides and
      // closes now; the latest stays open for the next batch/timeout.
      val items = (state.getOption.toList ++
          batch.map { e =>
            val us = micros(e.ts); OpenSession(us, us, 1, e.value)
          })
        .sortBy(s => (s.startUs, s.lastUs))
      val merged = items.foldLeft(List.empty[OpenSession]) {
        case (head :: tail, it) if it.startUs - head.lastUs <= gapUs =>
          OpenSession(math.min(head.startUs, it.startUs),
            math.max(head.lastUs, it.lastUs),
            head.n + it.n, head.sum + it.sum) :: tail
        case (acc, it) => it :: acc
      } // head = latest session, tail = earlier closed ones (reversed)
      val closed = merged.tail.reverse.map(close(userId, _))
      merged.headOption.foreach { s =>
        state.update(s)
        // time out once the watermark passes last-event + gap
        state.setTimeoutTimestamp(s.lastUs / 1000 + gapMinutes * 60L * 1000)
      }
      closed.iterator
    }

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(fn)
  }
}
