package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.Enrich

/** Streaming dedup, stream-static enrichment, and the foreachBatch
  * idempotent sink, driven through MemoryStream.
  */
class EnrichStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("dropDuplicatesWithinWatermark removes replayed events") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val q = Enrich.dedupStream(
        mem.toDF().toDF("event_id", "ts", "value"))
      .writeStream.format("memory").queryName("dedup_test")
      .outputMode("append").start()
    try {
      mem.addData((1L, ts("2024-01-01 10:00:00"), 1.0),
        (2L, ts("2024-01-01 10:01:00"), 2.0))
      q.processAllAvailable()
      // replay event 1 (at-least-once delivery) + a new event
      mem.addData((1L, ts("2024-01-01 10:00:00"), 1.0),
        (3L, ts("2024-01-01 10:02:00"), 4.0))
      q.processAllAvailable()
      val ids = spark.table("dedup_test").select("event_id")
        .as[Long].collect().sorted
      assert(ids.toSeq === Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  // ---- S7 on the dedup ingest: the SEEN-ID state must survive a kill —
  // an id ingested before the restart must still suppress its duplicate
  // arriving after it, and the resumed run must neither lose nor
  // re-emit anything (torn sink file planted and asserted invisible).
  test("checkpointed dedup restart: pre-kill ids suppress post-resume " +
    "duplicates; no dupes, no losses; torn sink files stay invisible") {
    import java.nio.file.{Files => JFiles, StandardCopyOption}
    val tmp = JFiles.createTempDirectory("graft_dedup_restart").toString
    val in = s"$tmp/in"; val ckpt = s"$tmp/ckpt"; val out = s"$tmp/out"
    JFiles.createDirectories(java.nio.file.Paths.get(in))
    def ts(s: String) = Timestamp.valueOf(s)
    // duplicates planted WITHIN one file (201), ACROSS pre-kill files
    // (101 in q1 and q2), and ACROSS the kill (102 in q2 and q3 — the
    // one only a recovered state store can suppress); all inside the
    // 1h watermark horizon of their first arrival
    val files = Seq(
      Seq((101L, ts("2024-01-01 10:00:00"), "a"),
        (201L, ts("2024-01-01 10:05:00"), "b"),
        (201L, ts("2024-01-01 10:05:00"), "b")),
      Seq((101L, ts("2024-01-01 10:10:00"), "a"),
        (102L, ts("2024-01-01 10:20:00"), "c")),
      Seq((102L, ts("2024-01-01 10:30:00"), "c"),
        (301L, ts("2024-01-01 10:40:00"), "d")),
      Seq((401L, ts("2024-01-01 11:50:00"), "e")))
    val staged = files.zipWithIndex.map { case (rows, i) =>
      val stage = s"$tmp/stage_q${i + 1}"
      rows.toDF("event_id", "ts", "event_type").coalesce(1).write.parquet(stage)
      new java.io.File(stage).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
    }
    def arrive(i: Int): Unit = {
      val dst = new java.io.File(in, s"q$i.parquet")
      JFiles.copy(staged(i - 1).toPath, dst.toPath,
        StandardCopyOption.REPLACE_EXISTING)
      dst.setLastModified(1700000000000L + i * 1000L)
    }

    arrive(1); arrive(2)
    Enrich.startDedupFromParquet(spark, in, ckpt, out,
      maxFilesPerTrigger = Some(1)).awaitTermination()
    val afterKill = spark.read.parquet(out).count()
    assert(afterKill === 3L, "run 1 must emit exactly {101, 201, 102}")

    val torn = plantTornFile(out)

    arrive(3); arrive(4)
    Enrich.startDedupFromParquet(spark, in, ckpt, out,
      maxFilesPerTrigger = Some(1)).awaitTermination()

    val emitted = spark.read.parquet(out)
      .collect().map(r => r.getAs[Long]("event_id"))
    assert(emitted.length === emitted.distinct.length,
      "restart re-emitted a deduplicated id")
    assert(emitted.sorted.toSeq === Seq(101L, 102L, 201L, 301L, 401L),
      "exactly one row per distinct id must survive — 102's post-kill " +
        "duplicate must be suppressed by the RECOVERED state store")
    assertTornInvisible(torn)
  }

  test("streaming near-dup: reordered duplicate docs are suppressed") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, String)]
    val q = graft.streaming.Enrich.dedupDocsStream(
        mem.toDF().toDF("ts", "doc_id", "text"))
      .writeStream.format("memory").queryName("docdedup_test")
      .outputMode("append").start()
    try {
      mem.addData(
        (ts("2024-01-01 10:00:00"), 1L, "the quick brown fox"),
        (ts("2024-01-01 10:01:00"), 2L, "fox brown quick the"), // same set
        (ts("2024-01-01 10:02:00"), 3L, "entirely different words"))
      q.processAllAvailable()
      val kept = spark.table("docdedup_test").select("doc_id")
        .as[Long].collect().sorted
      assert(kept.toSeq === Seq(1L, 3L))
    } finally q.stop()
  }

  test("maxFilesPerTrigger paces one log file per micro-batch (S1 pagination analog)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pace").toString
    Seq("a").toDF("v").write.parquet(s"$dir/f1")
    Seq("b").toDF("v").write.parquet(s"$dir/f2")
    Seq("c").toDF("v").write.parquet(s"$dir/f3")
    val batches = new java.util.concurrent.atomic.AtomicInteger(0)
    val q = spark.readStream
      .schema("v string")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/f*")
      .writeStream.outputMode("append")
      .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) => {
        if (b.count() > 0) batches.incrementAndGet(); ()
      })
      .start()
    try {
      q.processAllAvailable()
      assert(batches.get() === 3) // one file per micro-batch
    } finally q.stop()
  }

  test("stream-static enrichment joins the dimension per micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((8L, "gold"), (46L, "silver")).toDF("user_id", "tier")
    val mem = MemoryStream[(Long, Timestamp)]
    val q = Enrich.enrich(mem.toDF().toDF("user_id", "ts"), dim, "user_id")
      .writeStream.format("memory").queryName("enrich_test")
      .outputMode("append").start()
    try {
      mem.addData((8L, ts("2024-01-01 10:00:00")),
        (99L, ts("2024-01-01 10:01:00")))
      q.processAllAvailable()
      val got = spark.table("enrich_test")
        .select("user_id", "tier").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got === Map(8L -> "gold", 99L -> null))
    } finally q.stop()
  }

  test("stream-stream interval join matches the batch attribution twin") {
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq( // (event_id, ts, user_id, event_type)
      (1L, ts("2024-01-01 10:00:00"), 1L, "click"),
      (2L, ts("2024-01-01 10:10:00"), 1L, "click"),
      (3L, ts("2024-01-01 10:20:00"), 1L, "purchase"), // ← clicks 1, 2
      (4L, ts("2024-01-01 09:40:00"), 1L, "click"),    // 40 min before → out
      (5L, ts("2024-01-01 11:30:00"), 1L, "purchase"), // no click in window
      (6L, ts("2024-01-01 10:15:00"), 2L, "click"),
      (7L, ts("2024-01-01 10:30:00"), 2L, "purchase")) // ← click 6 only
    val cMem = MemoryStream[(Long, Timestamp, Long)]
    val pMem = MemoryStream[(Long, Timestamp, Long)]
    val q = graft.streaming.Enrich.attributeStream(
        cMem.toDF().toDF("event_id", "ts", "user_id"),
        pMem.toDF().toDF("event_id", "ts", "user_id"))
      .writeStream.format("memory").queryName("attr_test")
      .outputMode("append").start()
    try {
      rows.filter(_._4 == "click").foreach { r =>
        cMem.addData((r._1, r._2, r._3))
      }
      rows.filter(_._4 == "purchase").foreach { r =>
        pMem.addData((r._1, r._2, r._3))
      }
      q.processAllAvailable()
      val got = spark.table("attr_test")
        .select("purchase_id", "click_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted
      // batch twin over the identical rows
      val batch = graft.ops.Reports.clickAttribution(
          rows.toDF("event_id", "ts", "user_id", "event_type")
            .withColumn("value", lit(1.0)), 30)
        .select("purchase_id", "click_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted
      assert(got.toSeq === batch.toSeq)
      assert(got.toSeq === Seq((3L, 1L), (3L, 2L), (7L, 6L)))
    } finally q.stop()
  }

  // ---- S7 on the stream-stream join: BOTH sides' join state must
  // survive a kill — the decisive row is a purchase arriving after the
  // resume whose attributable clicks were ingested before the kill.
  test("checkpointed attribution restart: pre-kill clicks match a " +
    "post-resume purchase; output equals the batch twin; torn sink " +
    "files stay invisible") {
    import java.nio.file.{Files => JFiles, StandardCopyOption}
    val tmp = JFiles.createTempDirectory("graft_attr_restart").toString
    val cin = s"$tmp/clicks"; val pin = s"$tmp/purchases"
    val ckpt = s"$tmp/ckpt"; val out = s"$tmp/out"
    Seq(cin, pin).foreach(d =>
      JFiles.createDirectories(java.nio.file.Paths.get(d)))
    // rows: (event_id, ts, user_id); the join also needs a value-free
    // events shape for the batch twin below
    val clicks1 = Seq((1L, ts("2024-01-01 10:00:00"), 1L),
      (2L, ts("2024-01-01 10:10:00"), 1L))
    val purchases1 = Seq((3L, ts("2024-01-01 10:20:00"), 1L))
    val clicks2 = Seq((6L, ts("2024-01-01 10:15:00"), 2L))
    val purchases2 = Seq(
      (8L, ts("2024-01-01 10:25:00"), 1L), // ← matches PRE-KILL clicks 1, 2
      (7L, ts("2024-01-01 10:30:00"), 2L)) // ← matches post-resume click 6
    def stage(rows: Seq[(Long, Timestamp, Long)], dir: String,
              name: String): Unit = {
      val s = s"$tmp/stage_$name"
      rows.toDF("event_id", "ts", "user_id").coalesce(1).write.parquet(s)
      val part = new java.io.File(s).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(dir, s"$name.parquet")
      JFiles.copy(part.toPath, dst.toPath,
        StandardCopyOption.REPLACE_EXISTING)
    }

    // Run 1: clicks 1-2 and purchase 3 → emits (3,1), (3,2); kill.
    stage(clicks1, cin, "c1"); stage(purchases1, pin, "p1")
    graft.streaming.Enrich.startAttributionFromParquet(
      spark, cin, pin, ckpt, out).awaitTermination()
    assert(spark.read.parquet(out).count() === 2L,
      "run 1 must emit purchase 3's two attributed clicks")

    val torn = plantTornFile(out)

    // Run 2: click 6 and purchases 7-8; same checkpoint + join state.
    stage(clicks2, cin, "c2"); stage(purchases2, pin, "p2")
    graft.streaming.Enrich.startAttributionFromParquet(
      spark, cin, pin, ckpt, out).awaitTermination()

    val got = spark.read.parquet(out)
      .select("purchase_id", "click_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    // batch twin over ALL rows delivered across both runs
    val events = (clicks1 ++ clicks2).map(r => (r._1, r._2, r._3, "click")) ++
      (purchases1 ++ purchases2).map(r => (r._1, r._2, r._3, "purchase"))
    val batch = graft.ops.Reports.clickAttribution(
        events.toDF("event_id", "ts", "user_id", "event_type")
          .withColumn("value", lit(1.0)), 30)
      .select("purchase_id", "click_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got === batch,
      "restarted join must equal the batch twin — purchase 8's match " +
        "against pre-kill clicks requires the recovered join state")
    assert(got.contains((8L, 1L)) && got.contains((8L, 2L)))
    assert(got.length === got.distinct.length, "no replay duplicates")
    assertTornInvisible(torn)
  }

  test("foreachBatch sink replays idempotently (dynamic partition overwrite)") {
    implicit val sqlCtx = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("graft_fb").toString
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val q = mem.toDF().toDF("event_id", "ts", "value")
      .writeStream.outputMode("append")
      .foreachBatch(Enrich.writeBatchIdempotent(out) _)
      .start()
    try {
      mem.addData((1L, ts("2024-01-01 10:00:00"), 1.0),
        (2L, ts("2024-01-02 10:00:00"), 2.0))
      q.processAllAvailable()
      assert(spark.read.parquet(out).count() === 2L)
      // a LATER batch touching the same day must not clobber earlier rows
      mem.addData((3L, ts("2024-01-02 11:00:00"), 4.0))
      q.processAllAvailable()
      assert(spark.read.parquet(out).count() === 3L)
    } finally q.stop()
    // a REPLAY (same batchId, as Spark does on recovery) overwrites
    // exactly its own partitions — no duplicates
    import spark.implicits._
    val replay = Seq((9L, ts("2024-01-03 10:00:00"), 8.0))
      .toDF("event_id", "ts", "value")
    Enrich.writeBatchIdempotent(out)(replay, 7L)
    Enrich.writeBatchIdempotent(out)(replay, 7L)
    val day3 = spark.read.parquet(out)
      .filter(col("p_day") === "2024-01-03").count()
    assert(day3 === 1L)
  }
}
