package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sessionization with custom state — the stream-native version
  * of the reference's run-id assignment (`dvf/geoloc/task_functions.py:
  * 257-268`) via `flatMapGroupsWithState`: per-key session state
  * accumulates events, an event-time timeout at (last event + gap) closes
  * the session once the watermark passes it, and exactly one summary row
  * is emitted per closed session.
  *
  * State per key is O(1) (count + bounds), so executor state stores stay
  * bounded no matter how long the stream runs.
  */
object StatefulSessions {

  case class Ev(user_id: Long, ts: Timestamp)
  case class SessionState(count: Long, startUs: Long, lastUs: Long)
  case class Session(user_id: Long, session_start: Timestamp, n_events: Long,
                     duration_s: Double)

  def sessionize(events: Dataset[Ev], gapMs: Long,
                 watermarkDelay: String = "10 minutes"): Dataset[Session] = {
    implicit val sessionEnc = Encoders.product[Session]
    implicit val stateEnc = Encoders.product[SessionState]
    implicit val longEnc = Encoders.scalaLong

    def update(userId: Long, rows: Iterator[Ev],
               state: GroupState[SessionState]): Iterator[Session] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        Iterator(Session(userId, new Timestamp(s.startUs / 1000),
          s.count, (s.lastUs - s.startUs) / 1e6))
      } else {
        val batch = rows.toSeq
        val tsUs = batch.map(_.ts.getTime * 1000L)
        val (bMin, bMax) = (tsUs.min, tsUs.max)
        // A timeout only fires on watermark advance, which happens AFTER new
        // data is merged — so a gap larger than gapMs arriving in-data must
        // close the previous session here, not wait for the timer.
        val (closed, next) = state.getOption match {
          case Some(s) if bMin / 1000 > s.lastUs / 1000 + gapMs =>
            (Iterator(Session(userId, new Timestamp(s.startUs / 1000), s.count,
              (s.lastUs - s.startUs) / 1e6)),
              SessionState(batch.size, bMin, bMax))
          case Some(s) =>
            (Iterator.empty, SessionState(s.count + batch.size,
              math.min(s.startUs, bMin), math.max(s.lastUs, bMax)))
          case None => (Iterator.empty, SessionState(batch.size, bMin, bMax))
        }
        state.update(next)
        state.setTimeoutTimestamp(next.lastUs / 1000 + gapMs)
        closed
      }
    }

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }
}
