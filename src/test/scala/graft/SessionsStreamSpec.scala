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

  // ---- S7 on the stateful operator: sessions HELD IN STATE across a
  // kill must survive into the resumed run and close exactly once. The
  // final output (after a far-future flush) must EQUAL the batch twin —
  // a lost state store shows up as missing or split sessions, a replayed
  // batch as duplicates, and the planted torn sink file must stay
  // invisible throughout.
  test("checkpointed sessionization restart: state survives the kill; " +
    "final sessions equal the batch twin; torn sink files stay invisible") {
    import java.nio.file.{Files => JFiles, StandardCopyOption}
    import org.apache.spark.sql.functions._
    val tmp = JFiles.createTempDirectory("graft_sess_restart").toString
    val in = s"$tmp/in"; val ckpt = s"$tmp/ckpt"; val out = s"$tmp/out"
    JFiles.createDirectories(java.nio.file.Paths.get(in))

    // real events split into 4 event-time-ordered files, plus two flush
    // files whose far-future rows (user 99) drive the watermark past
    // every real horizon so the final comparison is total, not windowed
    val ev = graft.ops.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("ts"), col("user_id"), col("value"))
    val maxTs = ev.agg(max(col("ts"))).head().getTimestamp(0)
    val withQ = ev.withColumn("q", ntile(4).over(
      org.apache.spark.sql.expressions.Window.orderBy(col("ts"))))
    val staged = (1 to 6).map { i =>
      val stage = s"$tmp/stage_q$i"
      val df =
        if (i <= 4) withQ.filter(col("q") === i).drop("q")
        else Seq((new Timestamp(maxTs.getTime + i * 3600L * 1000L), 99L, 0.0))
          .toDF("ts", "user_id", "value")
      df.coalesce(1).write.parquet(stage)
      new java.io.File(stage).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
    }
    def arrive(i: Int): Unit = {
      val dst = new java.io.File(in, s"q$i.parquet")
      JFiles.copy(staged(i - 1).toPath, dst.toPath,
        StandardCopyOption.REPLACE_EXISTING)
      dst.setLastModified(1700000000000L + i * 1000L)
    }

    // Run 1: half the input; one file per micro-batch; kill mid-state.
    arrive(1); arrive(2)
    Sessions.startFromParquet(spark, in, ckpt, out, gapMinutes = 30,
      maxFilesPerTrigger = Some(1)).awaitTermination()
    val afterKill = spark.read.parquet(out).count()
    assert(afterKill > 0, "run 1 must have closed some sessions")

    // Plant the torn-sink artifact (a non-empty uncommitted data file).
    val torn = plantTornFile(out)

    // Run 2: the rest + the flush rows; same checkpoint + sink + state.
    (3 to 6).foreach(arrive)
    Sessions.startFromParquet(spark, in, ckpt, out, gapMinutes = 30,
      maxFilesPerTrigger = Some(1)).awaitTermination()

    // the batch twin formats session_start at SECOND granularity
    // (date_format "…HH:mm:ss"); truncate the stream's millis to match
    val emitted = spark.read.parquet(out)
      .filter(col("user_id") =!= 99L)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime / 1000 * 1000,
        r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(emitted.length === emitted.distinct.length,
      "restart produced duplicate sessions")
    // batch twin over exactly the real events (sessionize emits
    // session_start as a UTC-formatted string — parse it back as UTC)
    def utcMillis(s: String): Long =
      java.time.LocalDateTime.parse(s.replace(' ', 'T'))
        .toInstant(java.time.ZoneOffset.UTC).toEpochMilli
    val batchTwin = graft.ops.Reports.sessionize(
        ev.withColumn("event_id", unix_micros(col("ts"))), 30)
      .collect().map(r => (r.getLong(0), utcMillis(r.getString(3)),
        r.getLong(2), r.getLong(4), r.getDouble(5))).toSet
    assert(emitted.toSet === batchTwin,
      "after the flush, restart-streamed sessions must equal the batch twin")
    assertTornInvisible(torn)
  }

  test("late events: in-gap predecessor extends the session backward; " +
    "beyond-gap predecessor becomes its own session") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = Sessions.sessionizeStream(mem.toDS(), gapMinutes = 30,
        watermark = "6 hours")
      .writeStream.format("memory").queryName("sessions_late_test")
      .outputMode("append").start()
    try {
      mem.addData(Ev(ts("2024-01-01 10:00:00"), 1L, 1.0))
      q.processAllAvailable()
      // late, 10 min BEFORE the open session's start but within the gap →
      // must merge and move session_start back (batch twin sees it sorted)
      mem.addData(Ev(ts("2024-01-01 09:50:00"), 1L, 2.0))
      q.processAllAvailable()
      // late, 2 hours before start (beyond the gap) → its own session,
      // but HELD (not emitted) until the watermark passes its horizon —
      // a later in-gap event could still merge with it
      mem.addData(Ev(ts("2024-01-01 07:50:00"), 1L, 4.0))
      q.processAllAvailable()
      assert(spark.table("sessions_late_test").count() === 0)

      // flush via timeout: close the merged session, check the moved start
      mem.addData(Ev(ts("2024-01-01 20:00:00"), 2L, 8.0))
      q.processAllAvailable()
      mem.addData(Ev(ts("2024-01-01 23:00:00"), 2L, 16.0))
      q.processAllAvailable()
      val all = spark.table("sessions_late_test").as[ClosedSession].collect()
      assert(all.exists(s =>
        s.user_id == 1L && s.session_start == ts("2024-01-01 09:50:00") &&
          s.n_events == 2 && s.duration_sec == 600 && s.sum_value == 3.0))
      assert(all.exists(s =>
        s.user_id == 1L && s.session_start == ts("2024-01-01 07:50:00") &&
          s.n_events == 1 && s.duration_sec == 0))
    } finally q.stop()
  }

  test("randomized cross-batch delivery reproduces the batch twin exactly") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.{col, unix_micros}
    // fixed-seed random events for 4 users across 3 hours, delivered in
    // 3 shuffled batches (every event inside the 24h watermark), then a
    // far-future flush — the emitted sessions must equal the batch twin
    val rnd = new scala.util.Random(42)
    val events = (0 until 60).map { i =>
      Ev(ts(f"2024-01-01 ${9 + rnd.nextInt(3)}%02d:${rnd.nextInt(60)}%02d:${rnd.nextInt(60)}%02d"),
        1L + rnd.nextInt(4), (i % 10).toDouble)
    }
    val batches = rnd.shuffle(events).grouped(20).toSeq
    val mem = MemoryStream[Ev]
    val q = Sessions.sessionizeStream(mem.toDS(), gapMinutes = 10,
        watermark = "24 hours")
      .writeStream.format("memory").queryName("sessions_random_test")
      .outputMode("append").start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      // flush: advance the watermark far past every horizon
      mem.addData(Ev(ts("2024-01-03 12:00:00"), 99L, 0.0))
      q.processAllAvailable()
      mem.addData(Ev(ts("2024-01-03 13:00:00"), 99L, 0.0))
      q.processAllAvailable()
      val streamed = spark.table("sessions_random_test").as[ClosedSession]
        .collect().filter(_.user_id != 99L)
        .map(s => (s.user_id, s.session_start.getTime, s.n_events,
          s.duration_sec, s.sum_value)).toSet
      // sessionize formats session_start in the UTC session timezone;
      // parse it back AS UTC (Timestamp.valueOf would use the JVM
      // default zone and shift the epoch on non-UTC machines)
      def utcMillis(s: String): Long =
        java.time.LocalDateTime.parse(s.replace(' ', 'T'))
          .toInstant(java.time.ZoneOffset.UTC).toEpochMilli
      val batchTwin = graft.ops.Reports.sessionize(
          events.toDF("ts", "user_id", "value")
            .withColumn("event_id", unix_micros(col("ts"))), 10)
        .collect().map(r => (r.getLong(0), utcMillis(r.getString(3)),
          r.getLong(2), r.getLong(4), r.getDouble(5))).toSet
      assert(streamed === batchTwin)
    } finally q.stop()
  }

  test("late event merges with an EARLIER gap-separated session still " +
    "inside the watermark (no spurious singleton)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = Sessions.sessionizeStream(mem.toDS(), gapMinutes = 30,
        watermark = "6 hours")
      .writeStream.format("memory").queryName("sessions_heldmerge_test")
      .outputMode("append").start()
    try {
      mem.addData(Ev(ts("2024-01-01 10:00:00"), 1L, 1.0))
      q.processAllAvailable()
      // 12:00 is > gap after 10:00 → two separate sessions, BOTH held
      // (the old code emitted {10:00} here, so the late 10:10 below
      // became a spurious singleton)
      mem.addData(Ev(ts("2024-01-01 12:00:00"), 1L, 2.0))
      q.processAllAvailable()
      assert(spark.table("sessions_heldmerge_test").count() === 0)
      // late event predating the earlier CLOSED-by-gap session: merges
      mem.addData(Ev(ts("2024-01-01 10:10:00"), 1L, 4.0))
      q.processAllAvailable()
      // flush: watermark far past both horizons
      mem.addData(Ev(ts("2024-01-01 20:00:00"), 2L, 8.0))
      q.processAllAvailable()
      mem.addData(Ev(ts("2024-01-01 23:00:00"), 2L, 16.0))
      q.processAllAvailable()
      val got = spark.table("sessions_heldmerge_test").as[ClosedSession]
        .collect().filter(_.user_id == 1L).sortBy(_.session_start.getTime)
      assert(got.toSeq === Seq(
        ClosedSession(1L, ts("2024-01-01 10:00:00"), 2, 600, 5.0),
        ClosedSession(1L, ts("2024-01-01 12:00:00"), 1, 0, 2.0)))
    } finally q.stop()
  }

  test("multiple beyond-gap late events in one batch sessionize together " +
    "and bridge into the open session, matching the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = Sessions.sessionizeStream(mem.toDS(), gapMinutes = 30,
        watermark = "6 hours")
      .writeStream.format("memory").queryName("sessions_multi_late_test")
      .outputMode("append").start()
    try {
      mem.addData(Ev(ts("2024-01-01 10:00:00"), 1L, 1.0))
      q.processAllAvailable()
      // 09:20 is > gap before the open session start, but 09:40 bridges:
      // batch-sorted these are ONE session {09:20, 09:40, 10:00} — the
      // old per-event logic emitted 09:20 as a spurious singleton
      mem.addData(
        Ev(ts("2024-01-01 09:20:00"), 1L, 2.0),
        Ev(ts("2024-01-01 09:40:00"), 1L, 4.0))
      q.processAllAvailable()
      assert(spark.table("sessions_multi_late_test").count() === 0)
      // flush and check the single merged session
      mem.addData(Ev(ts("2024-01-01 20:00:00"), 2L, 8.0))
      q.processAllAvailable()
      mem.addData(Ev(ts("2024-01-01 23:00:00"), 2L, 16.0))
      q.processAllAvailable()
      val got = spark.table("sessions_multi_late_test").as[ClosedSession]
        .collect().filter(_.user_id == 1L)
      assert(got.toSeq === Seq(ClosedSession(1L,
        ts("2024-01-01 09:20:00"), 3, 2400, 7.0)))
    } finally q.stop()
  }
}
