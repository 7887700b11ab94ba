package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Sinks
import graft.streaming.SemanticIngest

/** The streaming near-dup-suppressed ingest composite: greedy-stream
  * dedup policy, versioned survivor index, idempotent batch replay
  * across the torn crash orders, and the foreachBatch wiring.
  * Exact-copy vectors keep every expectation bucket-independent.
  */
class SemanticIngestSpec extends SparkSpec {
  import spark.implicits._

  private val A = Array(1f, 0f, 0f)
  private val B = Array(-1f, 5f, 2f)
  private val C = Array(0f, 3f, -4f)

  private def df(rows: (Long, Array[Float], Int)*) =
    rows.toDF("vec_id", "embedding", "label")
      .select(col("vec_id"), col("label"), col("embedding"))

  private def sinkRows(out: String) =
    spark.read.parquet(out)
      // partition-dir inference types batch_id=0 as int — normalize
      .select(col("batch_id").cast("long"), col("vec_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("greedy-stream policy across batches: index survivors win; a " +
    "dropped vector never drops later arrivals") {
    val tmp = Files.createTempDirectory("graft_semingest").toString
    val (table, out) = (s"$tmp/index", s"$tmp/out")
    // batch 0: 1=A kept; 2=A dropped (near-dup of 1 in-batch)
    assert(SemanticIngest.ingestBatch(
      df((1L, A, 0), (2L, A, 0)), 0L, table, out, 0.3, 4) === 1L)
    // batch 1: 3=A dropped (near-dup of INDEXED 1 — not of dropped 2);
    // 4=B kept (novel)
    assert(SemanticIngest.ingestBatch(
      df((3L, A, 0), (4L, B, 1)), 1L, table, out, 0.3, 4) === 1L)
    assert(sinkRows(out) === Set((0L, 1L), (1L, 4L)))
    // the published index holds exactly the survivors, batch-stamped
    val idx = Sinks.Versioned.read(spark, table)
      .select(col("vec_id"), col("batch_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(idx === Set((1L, 0L), (4L, 1L)))
  }

  test("replay idempotence, both torn orders: after-publish replay " +
    "reuses the stamped survivors; before-publish replay recomputes") {
    val tmp = Files.createTempDirectory("graft_semingest_rp").toString
    val (table, out) = (s"$tmp/index", s"$tmp/out")
    val b0 = df((1L, A, 0), (2L, A, 0))
    SemanticIngest.ingestBatch(b0, 0L, table, out, 0.3, 4)
    val b1 = df((3L, A, 0), (4L, B, 1), (5L, B, 1))

    // CRASH AFTER PUBLISH, BEFORE SINK WRITE: run the publish half by
    // hand (what a kill mid-ingestBatch leaves behind — the same
    // append-only commit ingestBatch makes), then replay
    val index = Sinks.Versioned.read(spark, table)
    val kept = graft.ops.Similarity.incrementalSemanticDedup(
      b1, index.select(col("vec_id"), col("embedding")), 0.3, 4)
    Sinks.Versioned.append(
      b1.join(kept.select(col("vec_id")), Seq("vec_id"), "left_semi")
        .withColumn("batch_id", lit(1L)), table,
      meta = Map("max_batch_id" -> "1"))
    // the replay must NOT re-dedup against the post-batch index (4 would
    // look like a near-dup of its own published copy) and must NOT
    // publish a second index version for batch 1
    val versionsBefore = new java.io.File(table).listFiles()
      .map(_.getName).count(_.startsWith("v-"))
    assert(SemanticIngest.ingestBatch(b1, 1L, table, out, 0.3, 4) === 1L)
    assert(new java.io.File(table).listFiles()
      .map(_.getName).count(_.startsWith("v-")) === versionsBefore,
      "an after-publish replay must not publish again")
    assert(sinkRows(out) === Set((0L, 1L), (1L, 4L)))

    // full same-batch replay (Spark's failed-sink retry): still one
    // survivor set, sink partition rewritten in place
    assert(SemanticIngest.ingestBatch(b1, 1L, table, out, 0.3, 4) === 1L)
    assert(sinkRows(out) === Set((0L, 1L), (1L, 4L)))

    // CRASH BEFORE PUBLISH (nothing published for batch 2): the replay
    // recomputes against the pre-batch index — the normal arm
    assert(SemanticIngest.ingestBatch(
      df((6L, C, 2), (7L, C, 2)), 2L, table, out, 0.3, 4) === 1L)
    assert(sinkRows(out) === Set((0L, 1L), (1L, 4L), (2L, 6L)))
  }

  test("a crashed holder's publish lease does not stall the restarted " +
    "single-writer ingest") {
    val tmp = Files.createTempDirectory("graft_semingest_lk").toString
    val (table, out) = (s"$tmp/index", s"$tmp/out")
    SemanticIngest.ingestBatch(df((1L, A, 0)), 0L, table, out, 0.3, 4)
    // a kill inside Versioned.publish leaves the lease on disk
    java.nio.file.Files.createFile(
      java.nio.file.Paths.get(table, "_publish.lock"))
    assert(Sinks.Versioned.breakLease(spark, table))
    assert(SemanticIngest.ingestBatch(
      df((4L, B, 1)), 1L, table, out, 0.3, 4) === 1L)
  }

  test("append-only publish: B batches write O(total new rows) bytes — " +
    "the index is never rewritten per batch") {
    val tmp = Files.createTempDirectory("graft_semingest_ob").toString
    val (table, out) = (s"$tmp/index", s"$tmp/out")
    def parquetBytesByFile(dir: String): Map[String, Long] = {
      val root = java.nio.file.Paths.get(dir)
      if (!java.nio.file.Files.exists(root)) Map.empty
      else {
        val s = java.nio.file.Files.walk(root)
        try {
          import scala.jdk.CollectionConverters._
          s.iterator().asScala
            .filter(p => p.toString.endsWith(".parquet"))
            .map(p => p.toString -> java.nio.file.Files.size(p)).toMap
        } finally s.close()
      }
    }
    // 12 constant-size batches of mutually-ORTHOGONAL vectors (one-hot
    // over 96 dims — every pairwise cosine is 0, so all survive): under
    // the old full-rewrite publish, batch b rewrote all b·|batch| index
    // rows — new-bytes-per-batch GREW with b (quadratic total); under
    // the append commit it must stay ~flat (one batch-sized commit dir)
    def oneHot(id: Int) = Array.tabulate(96)(j => if (j == id) 1f else 0f)
    val perBatchNewBytes = (0 until 12).map { b =>
      val before = parquetBytesByFile(table)
      SemanticIngest.ingestBatch(
        df((0 until 8).map(i => (b * 8L + i, oneHot(b * 8 + i), b)): _*),
        b.toLong, table, out, 0.3, 4)
      val after = parquetBytesByFile(table)
      // bytes in files that did not exist before this batch
      after.collect {
        case (p, n) if !before.contains(p) => n
      }.sum
    }
    // every batch's newly-written bytes stay within a small constant
    // factor of the FIRST batch's (parquet framing noise), instead of
    // growing ~12x by the last batch as a full rewrite would
    val base = perBatchNewBytes.head
    perBatchNewBytes.zipWithIndex.foreach { case (n, b) =>
      assert(n <= base * 2,
        s"batch $b wrote $n new bytes (batch 0 wrote $base) — " +
          "per-batch publish cost must not grow with index size")
    }
    // and the index still reads complete: every survivor, batch-stamped
    assert(Sinks.Versioned.read(spark, table).count() === 96L)
    // the replay high-water mark rides the version metadata
    assert(SemanticIngest.maxPublished(spark, table) === 11L)
  }

  test("maxPublished reads version metadata with ZERO Spark jobs — no " +
    "per-batch index scan in the ingest") {
    val tmp = Files.createTempDirectory("graft_semingest_mj").toString
    val (table, out) = (s"$tmp/index", s"$tmp/out")
    SemanticIngest.ingestBatch(df((1L, A, 0)), 0L, table, out, 0.3, 4)
    SemanticIngest.ingestBatch(df((4L, B, 1)), 1L, table, out, 0.3, 4)
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      assert(SemanticIngest.maxPublished(spark, table) === 1L)
      // listener delivery is async; a started job's event lands well
      // inside this window (the expectation is zero, so the sleep can
      // only catch a regression, never flake a pass into a failure)
      Thread.sleep(1000)
      assert(jobs.get() === 0,
        "the high-water mark must come from the manifest metadata, " +
          "not an index aggregate")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("compaction between batches carries the high-water mark and " +
    "collapses the per-batch commit dirs") {
    val tmp = Files.createTempDirectory("graft_semingest_cp").toString
    val (table, out) = (s"$tmp/index", s"$tmp/out")
    // one-hot vectors: pairwise cosine 0 < threshold, so every batch's
    // vector survives regardless of bucket collisions
    def oneHot(id: Int) = Array.tabulate(16)(j => if (j == id) 1f else 0f)
    (0 until 6).foreach(b => SemanticIngest.ingestBatch(
      df((b.toLong, oneHot(b), b)), b.toLong, table, out, 0.3, 4))
    Sinks.Versioned.compact(spark, table, 1)
    assert(SemanticIngest.maxPublished(spark, table) === 5L,
      "compact must carry the max_batch_id metadata forward")
    // a later batch keeps ingesting normally over the compacted index
    assert(SemanticIngest.ingestBatch(
      df((100L, oneHot(8), 9)), 6L, table, out, 0.3, 4) === 1L)
    assert(Sinks.Versioned.read(spark, table).count() === 7L)
    // after one more commit cycles retention, the pre-compaction commit
    // dirs are GC'd — the data dir holds only post-compaction commits
    SemanticIngest.ingestBatch(
      df((101L, oneHot(9), 9)), 7L, table, out, 0.3, 4)
    val commits = new java.io.File(s"$table/data").listFiles()
      .map(_.getName).filter(_.startsWith("c-")).sorted
    assert(commits.forall(_.drop(2).takeWhile(_ != '-').toLong > 6),
      s"pre-compaction commit dirs must be GC'd, found: ${commits.mkString(",")}")
  }

  test("foreachBatch wiring end-to-end: AvailableNow over staged files " +
    "equals the per-batch core, one file per batch") {
    val tmp = Files.createTempDirectory("graft_semingest_st").toString
    val in = s"$tmp/in"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    def stage(name: String, rows: (Long, Array[Float], Int)*): Unit = {
      val staged = s"$tmp/stage_$name"
      df(rows: _*).coalesce(1).write.parquet(staged)
      val part = new java.io.File(staged).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(part.toPath,
        java.nio.file.Paths.get(in, s"$name.parquet"))
    }
    stage("b0", (1L, A, 0), (2L, A, 0))
    stage("b1", (3L, A, 0), (4L, B, 1))
    val q = SemanticIngest.startFromParquet(spark, in, s"$tmp/ckpt",
      s"$tmp/index", s"$tmp/out", threshold = 0.3, bucketBits = 4,
      maxFilesPerTrigger = Some(1))
    q.awaitTermination(120000)
    assert(q.exception.isEmpty, s"ingest stream failed: ${q.exception}")
    // one file per trigger → file-order batches; survivors as in the
    // per-batch core test
    assert(sinkRows(s"$tmp/out").map(_._2) === Set(1L, 4L))
    assert(Sinks.Versioned.read(spark, s"$tmp/index").count() === 2L)
  }

  test("compactEvery: the stream compacts its own index between " +
    "batches — data dirs stay bounded, content and high-water survive") {
    val tmp = Files.createTempDirectory("graft_semingest_cp").toString
    val in = s"$tmp/in"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    def stage(name: String, rows: (Long, Array[Float], Int)*): Unit = {
      val staged = s"$tmp/stage_$name"
      df(rows: _*).coalesce(1).write.parquet(staged)
      val part = new java.io.File(staged).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(part.toPath,
        java.nio.file.Paths.get(in, s"$name.parquet"))
    }
    // six batches with pairwise |cos| <= 0.58: every vector survives, so
    // each append commit adds a data dir — without compaction data/
    // grows per batch
    val vecs = Seq(Array(1f, 0f, 0f), Array(0f, 1f, 0f), Array(0f, 0f, 1f),
      Array(-1f, 1f, 1f), Array(1f, -1f, 1f), Array(1f, 1f, -1f))
    for (b <- 0 until 6) stage(s"b$b", (10L + b, vecs(b), b))
    val q = SemanticIngest.startFromParquet(spark, in, s"$tmp/ckpt",
      s"$tmp/index", s"$tmp/out", threshold = 0.99, bucketBits = 4,
      maxFilesPerTrigger = Some(1), compactEvery = 2)
    q.awaitTermination(180000)
    assert(q.exception.isEmpty, s"ingest stream failed: ${q.exception}")
    assert(Sinks.Versioned.read(spark, s"$tmp/index").count() === 6L)
    // batches 2 and 4 triggered compacts (full rewrites); the remaining
    // append commit dirs are only those since the LAST compact — bounded
    // by compactEvery, not by stream length
    val dataDirs = Option(new java.io.File(s"$tmp/index/data").listFiles())
      .map(_.count(_.getName.startsWith("c-"))).getOrElse(0)
    assert(dataDirs <= 2,
      s"auto-compaction must bound append commit dirs, got $dataDirs")
    // the high-water mark survived the compacts: a replay of the final
    // batch is recognized as already published
    assert(SemanticIngest.maxPublished(spark, s"$tmp/index") === 5L)
  }
}
