package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ops.TextAnalysis
import graft.sources.Sinks
import graft.streaming.ParagraphIngest

/** The streaming paragraph-dedup ingest: fold ≡ batch-mode n140,
  * deterministic replay across the publish-then-crash torn order, and
  * the foreachBatch wiring. (No original-vs-emitted index probe here,
  * unlike SubstringIngestSpec: a removed paragraph is BY DEFINITION an
  * exact copy of an already-indexed one, so the index from originals
  * equals the index from survivors plus priors — paragraph granularity
  * has no straddle-gram analog.)
  */
class ParagraphIngestSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  private def sinkRows(out: String) =
    spark.read.parquet(out)
      .select(col("doc_id"), col("n_paras"), col("n_removed"),
        col("text_dedup"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap

  // 3-word blocks: d2 copies d1's first block; d5 is d1's second block
  // whole (cross-batch removal to empty); d6 is fresh incl. a 1-word
  // tail block
  private val d1 = (1L, "a1 a2 a3 b1 b2 b3")
  private val d2 = (2L, "a1 a2 a3 c1 c2 c3")
  private val d5 = (5L, "b1 b2 b3")
  private val d6 = (6L, "f1 f2 f3 f4")

  test("cross-batch keep-first: fold ≡ batch-mode n140; the index pass " +
    "streams map-side past the broadcast batch hash set") {
    val tmp = Files.createTempDirectory("graft_paraingest").toString
    val (table, out) = (s"$tmp/index", s"$tmp/out")
    assert(ParagraphIngest.ingestBatch(df(d1, d2), 0L, table, out, 3) === 2L)
    assert(ParagraphIngest.ingestBatch(df(d5, d6), 1L, table, out, 3) === 2L)
    val got = sinkRows(out)
    assert(got(1L) === ((2L, 0L, "a1 a2 a3 b1 b2 b3")))
    assert(got(2L) === ((2L, 1L, "c1 c2 c3")))
    // cross-batch: d5's one block was first seen in batch 0 → removed
    // whole, the doc row survives with empty text
    assert(got(5L) === ((1L, 1L, "")))
    assert(got(6L) === ((2L, 0L, "f1 f2 f3 f4")))
    // end-to-end fold equivalence with batch-mode n140
    val whole = TextAnalysis.paragraphDedupBlocks(df(d1, d2, d5, d6), 3)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    assert(got === whole)
    // the index stores (h, batch_id) and never text/doc ids; the one
    // pass over it is a LEFT SEMI with the batch hash set BROADCAST
    val idx = Sinks.Versioned.read(spark, table)
    assert(idx.columns.sorted.toSeq === Seq("batch_id", "h"))
    val probe = idx.select(col("h")).join(
      broadcast(TextAnalysis.paragraphIndex(df(d5), 3)), Seq("h"),
      "left_semi").queryExecution.executedPlan.toString
    assert(probe.contains("BroadcastHashJoin") && probe.contains("LeftSemi"),
      probe)
  }

  test("replay idempotence incl. the publish-then-crash torn order: the " +
    "sink partition rebuilds by deterministic recompute against the " +
    "PRE-batch index state; the index never double-publishes") {
    val tmp = Files.createTempDirectory("graft_paraingest_rp").toString
    val (table, out) = (s"$tmp/index", s"$tmp/out")
    ParagraphIngest.ingestBatch(df(d1, d2), 0L, table, out, 3)
    val b1 = df(d5, d6)
    assert(ParagraphIngest.ingestBatch(b1, 1L, table, out, 3) === 2L)
    val before = sinkRows(out)
    val versionsBefore = Sinks.Versioned.versions(spark, table)
    val idxBefore = Sinks.Versioned.read(spark, table).collect()
      .map(_.toString).sorted.toSeq
    // CRASH AFTER PUBLISH, BEFORE SINK WRITE: lose the sink partition,
    // keep the index
    val part = new java.io.File(out, "batch_id=1")
    part.listFiles().foreach(_.delete()); part.delete()
    assert(sinkRows(out).keySet === Set(1L, 2L))
    // the replayed batch recomputes against batch_id < 1 (its own
    // published hashes drop out) and restores the partition bit-same
    assert(ParagraphIngest.ingestBatch(b1, 1L, table, out, 3) === 2L)
    assert(sinkRows(out) === before)
    assert(Sinks.Versioned.versions(spark, table) === versionsBefore)
    assert(Sinks.Versioned.read(spark, table).collect()
      .map(_.toString).sorted.toSeq === idxBefore)
  }

  test("foreachBatch wiring end-to-end: AvailableNow over staged files " +
    "equals the per-batch core; a re-run on the same checkpoint is a " +
    "no-op") {
    val tmp = Files.createTempDirectory("graft_paraingest_st").toString
    val in = s"$tmp/in"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    stageParquetFile(df(d1, d2), s"$tmp/stage_b0", in, "b0", 1000000L)
    stageParquetFile(df(d5, d6), s"$tmp/stage_b1", in, "b1", 2000000L)
    val q = ParagraphIngest.startFromParquet(spark, in, s"$tmp/ckpt",
      s"$tmp/index", s"$tmp/out", k = 3, maxFilesPerTrigger = Some(1))
    q.awaitTermination(120000)
    assert(q.exception.isEmpty, s"ingest stream failed: ${q.exception}")
    val got = sinkRows(s"$tmp/out")
    assert(got(2L)._3 === "c1 c2 c3" && got(5L)._3 === "")
    val idxCount = Sinks.Versioned.read(spark, s"$tmp/index").count()
    // resume on the same checkpoint with no new files: nothing changes
    val q2 = ParagraphIngest.startFromParquet(spark, in, s"$tmp/ckpt",
      s"$tmp/index", s"$tmp/out", k = 3, maxFilesPerTrigger = Some(1))
    q2.awaitTermination(120000)
    assert(q2.exception.isEmpty)
    assert(sinkRows(s"$tmp/out") === got)
    assert(Sinks.Versioned.read(spark, s"$tmp/index").count() === idxCount)
  }
}
