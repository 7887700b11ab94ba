package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.Drift

/** The windowed drift monitor: chained streaming aggregations must hold
  * windows to the watermark, and a closed window's KL must be bit-equal
  * to the same core run on the same rows as a batch frame.
  */
class DriftStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // reference corpus: "a" 3/5, "b" 2/5 of all tokens
  private val refDocs = Seq("a a b", "a b").toDF("text")

  private val rows = Seq(
    (ts("2024-01-01 10:05:00"), "s1", "a a b"),
    (ts("2024-01-01 10:20:00"), "s1", "a"),
    (ts("2024-01-01 10:25:00"), "s2", "b b"),
    (ts("2024-01-01 11:10:00"), "s1", "a b"),
    // watermark pusher: closes hour 10 (wm = 12:30 − 1h past 11:00)
    (ts("2024-01-01 12:30:00"), "s2", "a"))

  test("closed drift windows equal the batch twin bit-exactly; " +
    "reference cache is released when the stream terminates") {
    implicit val sqlCtx = spark.sqlContext
    val refCache = Drift.cacheReference(refDocs)
    val ref = refCache.df
    val mem = MemoryStream[(Timestamp, String, String)]
    val streamDf = mem.toDF().toDF("ts", "source", "text")
    val q = Drift.sourceDriftWindows(streamDf, ref)
      .writeStream.format("memory").queryName("drift_test")
      .outputMode("append").start()
    Drift.releaseOnTermination(refCache, q)
    assert(refCache.isCached, "handle must hold a live cache while running")
    try {
      mem.addData(rows.take(4))
      q.processAllAvailable()
      assert(spark.table("drift_test").count() === 0L,
        "no window may be emitted before the watermark passes it")

      mem.addData(rows.drop(4))
      q.processAllAvailable()
      val got = spark.table("drift_test")
        .orderBy(col("window_start"), col("source")).collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getDouble(2)))

      // batch twin on exactly the hour-10 rows (the closed window)
      val batch = Drift.sourceDriftWindows(
          rows.take(3).toDF("ts", "source", "text"), ref)
        .orderBy(col("window_start"), col("source")).collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getDouble(2)))
      assert(got.toSeq === batch.toSeq)

      // hand check via the decomposition KL = A/cs − ln(cs):
      // s1 hour 10 = "a a b" + "a" → a:3, b:1, cs=4;
      // A = dec(3·ln(3/(3/5))) + dec(1·ln(1/(2/5)))
      def dec(d: Double): BigDecimal =
        BigDecimal(d).setScale(10, BigDecimal.RoundingMode.HALF_UP)
      val a = dec(3.0 * math.log(3.0 / (3.0 / 5))) +
        dec(1.0 * math.log(1.0 / (2.0 / 5)))
      val expS1 = BigDecimal(a.toDouble / 4 - math.log(4.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got.collect { case (_, "s1", kl) => kl }.toSeq === Seq(expS1))
    } finally q.stop()
    // the termination listener fires asynchronously after stop(); the
    // stopped stream must not leak the vocabulary frame in the CacheManager
    val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
    while (refCache.isCached && System.nanoTime() < deadline)
      Thread.sleep(50)
    assert(!refCache.isCached,
      "reference cache must be unpersisted once the stream terminates")
  }

  test("releaseOnTermination on an ALREADY-terminated query still releases " +
    "the cache (the terminated event is not replayed to late listeners)") {
    implicit val sqlCtx = spark.sqlContext
    val refCache = Drift.cacheReference(refDocs)
    refCache.df.count() // actually materialize the cache
    assert(refCache.isCached)
    val mem = MemoryStream[Int]
    val q = mem.toDF().writeStream.format("memory")
      .queryName("drift_dead_test").outputMode("append").start()
    mem.addData(1); q.processAllAvailable()
    q.stop()
    q.awaitTermination()
    // registering AFTER death: no event will ever fire for this listener
    Drift.releaseOnTermination(refCache, q)
    assert(!refCache.isCached,
      "a dead query must release synchronously via the isActive check")
  }

  // ---- S7 on the monitor: a drift job killed mid-stream must neither
  // double-count nor lose a window's KL on resume — same contract (and
  // same two leftovers exercised) as the hourly-report restart proof:
  // un-ingested input processed exactly once, and a planted torn sink
  // file that stays invisible while physically present.
  test("checkpointed drift monitor restart: resume after kill has no dupes, " +
    "no losses; torn sink files stay invisible") {
    import java.nio.file.{Files => JFiles, StandardCopyOption}
    val tmp = JFiles.createTempDirectory("graft_drift_restart").toString
    val in = s"$tmp/in"; val ckpt = s"$tmp/ckpt"; val out = s"$tmp/out"
    JFiles.createDirectories(java.nio.file.Paths.get(in))
    val ref = Drift.referenceDistribution(refDocs)

    // four event-time-ordered arrival files; the last row of each pushes
    // the watermark so earlier hours close batch by batch
    val arrivals: Seq[Seq[(Timestamp, String, String)]] = Seq(
      Seq((ts("2024-01-01 10:05:00"), "s1", "a a b"),
        (ts("2024-01-01 10:20:00"), "s1", "a"),
        (ts("2024-01-01 10:25:00"), "s2", "b b")),
      Seq((ts("2024-01-01 11:10:00"), "s1", "a b"),
        (ts("2024-01-01 12:30:00"), "s2", "a")), // wm 11:30 → closes h10
      Seq((ts("2024-01-01 13:40:00"), "s1", "b a")), // wm 12:40 → h11, h12
      Seq((ts("2024-01-01 15:00:00"), "s2", "a a"))) // wm 14:00 → h13
    val staged = arrivals.zipWithIndex.map { case (rows, i) =>
      val stage = s"$tmp/stage_q${i + 1}"
      rows.toDF("ts", "source", "text").coalesce(1).write.parquet(stage)
      new java.io.File(stage).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
    }
    def arrive(i: Int): Unit = { // distinct ascending mtimes → stable order
      val dst = new java.io.File(in, s"q$i.parquet")
      JFiles.copy(staged(i - 1).toPath, dst.toPath,
        StandardCopyOption.REPLACE_EXISTING)
      dst.setLastModified(1700000000000L + i * 1000L)
    }

    // Run 1: half the input; one file per micro-batch.
    arrive(1); arrive(2)
    Drift.startFromParquet(spark, in, ckpt, out, ref,
      maxFilesPerTrigger = Some(1)).awaitTermination()
    val afterKill = spark.read.parquet(out).count()
    assert(afterKill > 0, "run 1 must have committed some closed windows")

    // Plant the mid-batch-kill artifact: an uncommitted data file.
    val torn = plantTornFile(out)

    // Run 2: the rest arrives; same checkpoint + sink.
    arrive(3); arrive(4)
    Drift.startFromParquet(spark, in, ckpt, out, ref,
      maxFilesPerTrigger = Some(1)).awaitTermination()

    val emitted = spark.read.parquet(out)
    val batch = Drift.sourceDriftWindows(
      arrivals.flatten.toDF("ts", "source", "text"), ref)
    assert(emitted.count() > afterKill, "run 2 must have made progress")
    // no dupes / no spurious rows (multiset containment in the batch twin)
    assert(emitted.exceptAll(batch).count() === 0,
      "restart produced duplicate or spurious KL rows")
    // no losses: only windows the final watermark left open may be missing
    val maxClosed = emitted.agg(max(col("window_start"))).head().getTimestamp(0)
    assert(batch.exceptAll(emitted)
      .filter(col("window_start") < maxClosed).count() === 0,
      "restart lost closed windows")
    // the torn file is physically present, non-empty, and yet unread
    assertTornInvisible(torn)
  }

  test("reference distribution sums to 1 over the vocabulary") {
    val total = Drift.referenceDistribution(refDocs)
      .agg(sum(col("q"))).as[Double].collect().head
    assert(math.abs(total - 1.0) < 1e-12)
  }
}
