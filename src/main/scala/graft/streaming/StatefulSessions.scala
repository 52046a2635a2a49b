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
        // A timeout only fires on watermark advance, which happens AFTER new
        // data is merged — so gaps must close sessions here too, and a
        // single micro-batch (e.g. an AvailableNow backlog drain) can carry
        // MULTIPLE sessions: walk the batch in event-time order, splitting
        // on every gap, emitting all but the still-open tail session.
        val tsUs = rows.map(_.ts.getTime * 1000L).toSeq.sorted
        val start = state.getOption.toSeq
        val (closed, open) = tsUs.foldLeft((Vector.empty[Session], start.headOption)) {
          case ((done, cur), t) => cur match {
            case Some(s) if t / 1000 > s.lastUs / 1000 + gapMs =>
              (done :+ Session(userId, new Timestamp(s.startUs / 1000), s.count,
                (s.lastUs - s.startUs) / 1e6),
                Some(SessionState(1, t, t)))
            case Some(s) =>
              (done, Some(SessionState(s.count + 1,
                math.min(s.startUs, t), math.max(s.lastUs, t))))
            case None => (done, Some(SessionState(1, t, t)))
          }
        }
        val tail = open.get
        state.update(tail)
        state.setTimeoutTimestamp(tail.lastUs / 1000 + gapMs)
        closed.iterator
      }
    }

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }
}
