package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import StatefulSessions.Ev

class StatefulSessionsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("flatMapGroupsWithState closes sessions after the gap, once per session") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Ev]
    val sessions = StatefulSessions.sessionize(input.toDS(), gapMs = 5 * 60 * 1000,
      watermarkDelay = "1 minute")
    val q = sessions.writeStream.format("memory").queryName("sess")
      .outputMode(OutputMode.Append).start()
    try {
      // user 1: two tight events; user 2: one event
      input.addData(Ev(1, ts("2024-01-01 10:00:00")), Ev(1, ts("2024-01-01 10:02:00")),
        Ev(2, ts("2024-01-01 10:00:30")))
      q.processAllAvailable()
      assert(spark.table("sess").count() == 0) // nothing closed yet

      // much later events push the watermark past both sessions' timeouts
      input.addData(Ev(1, ts("2024-01-01 11:00:00")))
      q.processAllAvailable()
      input.addData(Ev(3, ts("2024-01-01 12:00:00")))
      q.processAllAvailable()

      val closed = spark.table("sess")
        .select("user_id", "session_start", "n_events", "duration_s")
        .as[(Long, Timestamp, Long, Double)].collect().toSet
      // all three sessions whose (last + gap) the watermark (11:59) passed
      // are closed exactly once; user 3's 12:00 session is still open
      assert(closed == Set(
        (1L, ts("2024-01-01 10:00:00"), 2L, 120.0),
        (2L, ts("2024-01-01 10:00:30"), 1L, 0.0),
        (1L, ts("2024-01-01 11:00:00"), 1L, 0.0)), s"got $closed")
      assert(!closed.exists(_._1 == 3L), s"got $closed")
    } finally q.stop()
  }

  test("a single micro-batch containing multiple sessions splits on in-batch gaps") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Ev]
    val sessions = StatefulSessions.sessionize(input.toDS(), gapMs = 5 * 60 * 1000,
      watermarkDelay = "1 minute")
    val q = sessions.writeStream.format("memory").queryName("sess2")
      .outputMode(OutputMode.Append).start()
    try {
      // one batch (a backlog drain): two sessions for user 9, hours apart
      input.addData(Ev(9, ts("2024-01-01 10:00:00")), Ev(9, ts("2024-01-01 10:01:00")),
        Ev(9, ts("2024-01-01 16:00:00")))
      q.processAllAvailable()
      input.addData(Ev(8, ts("2024-01-01 20:00:00"))) // advance watermark
      q.processAllAvailable()
      val closed = spark.table("sess2")
        .select("user_id", "session_start", "n_events", "duration_s")
        .as[(Long, Timestamp, Long, Double)].collect().toSet
      assert(closed == Set(
        (9L, ts("2024-01-01 10:00:00"), 2L, 60.0),
        (9L, ts("2024-01-01 16:00:00"), 1L, 0.0)), s"got $closed")
    } finally q.stop()
  }
}
