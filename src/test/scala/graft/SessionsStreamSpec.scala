package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.Sessions
import graft.streaming.Sessions.{ClosedSession, Ev}

/** Streaming sessionization: sessions close on in-batch gaps AND on
  * watermark timeout; open sessions are never emitted early.
  */
class SessionsStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("gap closes a session; watermark timeout flushes the open one") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = Sessions.sessionizeStream(mem.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sessions_test")
      .outputMode("append").start()
    try {
      // user 1: two events 10 min apart (one session), then a 2-hour gap
      mem.addData(
        Ev(ts("2024-01-01 10:00:00"), 1L, 1.0),
        Ev(ts("2024-01-01 10:10:00"), 1L, 2.0),
        Ev(ts("2024-01-01 12:10:00"), 1L, 4.0))
      q.processAllAvailable()
      val afterGap = spark.table("sessions_test").as[ClosedSession].collect()
      // the first session closed via the in-batch gap; the 12:10 one is open
      assert(afterGap.toSeq === Seq(
        ClosedSession(1L, ts("2024-01-01 10:00:00"), 2, 600, 3.0)))

      // advance the watermark far past 12:10 + gap → timeout flushes it
      mem.addData(Ev(ts("2024-01-01 15:00:00"), 2L, 8.0))
      q.processAllAvailable()
      mem.addData(Ev(ts("2024-01-01 16:00:00"), 2L, 16.0))
      q.processAllAvailable()
      val flushed = spark.table("sessions_test").as[ClosedSession].collect()
      assert(flushed.exists(s =>
        s.user_id == 1L && s.session_start == ts("2024-01-01 12:10:00") &&
          s.n_events == 1 && s.duration_sec == 0))
    } finally q.stop()
  }
}
