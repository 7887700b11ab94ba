package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ops.TextAnalysis
import graft.sources.Sinks
import graft.streaming.SubstringIngest

/** The streaming keep-first substring-dedup ingest: fold ≡ batch-mode
  * n122, index built from ORIGINAL text (grams surviving only in cut
  * regions still suppress later arrivals), deterministic replay across
  * the publish-then-crash torn order, and the foreachBatch wiring.
  */
class SubstringIngestSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  private def sinkRows(out: String) =
    spark.read.parquet(out)
      .select(col("doc_id"), col("n_tokens"), col("n_removed"),
        col("text_dedup"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap

  // d1's grams are all globally first; d2 loses its copied prefix
  // (positions 0..5) and keeps the g-tail. The probe gram
  // "u3 u4 u5 u6 g1" (d2 pos 2) exists ONLY inside d2's CUT region —
  // it appears in no emitted output — so a later doc made of exactly it
  // is removed iff the index is built from ORIGINAL batch text.
  private val d1 = (1L, "u1 u2 u3 u4 u5 u6")
  private val d2 = (2L, "u1 u2 u3 u4 u5 u6 g1 g2 g3 g4 g5")
  private val d5 = (5L, "u3 u4 u5 u6 g1")
  private val d6 = (6L, "fresh w a b c x")

  test("cross-batch keep-first: fold ≡ batch-mode n122; the index " +
    "carries ORIGINAL grams (cut-region grams still suppress); the " +
    "index pass streams map-side past the broadcast batch gram set") {
    val tmp = Files.createTempDirectory("graft_ssingest").toString
    val (table, out) = (s"$tmp/index", s"$tmp/out")
    assert(SubstringIngest.ingestBatch(df(d1, d2), 0L, table, out) === 2L)
    assert(SubstringIngest.ingestBatch(df(d5, d6), 1L, table, out) === 2L)
    val got = sinkRows(out)
    assert(got(1L) === ((6L, 0L, "u1 u2 u3 u4 u5 u6")))
    assert(got(2L) === ((11L, 6L, "g1 g2 g3 g4 g5")))
    // the probe: removed whole although its gram text never reached
    // any emitted output — the index saw the original
    assert(got(5L) === ((5L, 5L, "")))
    assert(got(6L) === ((6L, 0L, "fresh w a b c x")))
    // end-to-end fold equivalence with batch-mode n122
    val whole = TextAnalysis.dupSubstringDedup(df(d1, d2, d5, d6), 5)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    assert(got === whole)
    // the index stores (g, batch_id) and never text/doc ids; the one
    // pass over it is a LEFT SEMI with the batch gram set BROADCAST —
    // the index side never shuffles (the SimhashIngest discipline)
    val idx = Sinks.Versioned.read(spark, table)
    assert(idx.columns.sorted.toSeq === Seq("batch_id", "g"))
    val probe = idx.select(col("g")).join(
      broadcast(TextAnalysis.dupSubstringIndex(df(d5), 5)), Seq("g"),
      "left_semi").queryExecution.executedPlan.toString
    assert(probe.contains("BroadcastHashJoin") && probe.contains("LeftSemi"),
      probe)
  }

  test("replay idempotence incl. the publish-then-crash torn order: " +
    "the sink partition rebuilds by deterministic recompute against " +
    "the PRE-batch index state; the index never double-publishes") {
    val tmp = Files.createTempDirectory("graft_ssingest_rp").toString
    val (table, out) = (s"$tmp/index", s"$tmp/out")
    SubstringIngest.ingestBatch(df(d1, d2), 0L, table, out)
    val b1 = df(d5, d6)
    assert(SubstringIngest.ingestBatch(b1, 1L, table, out) === 2L)
    val before = sinkRows(out)
    val versionsBefore = Sinks.Versioned.versions(spark, table)
    val idxBefore = Sinks.Versioned.read(spark, table).collect()
      .map(_.toString).sorted.toSeq
    // CRASH AFTER PUBLISH, BEFORE SINK WRITE: lose the sink partition,
    // keep the index — exactly what a kill between the two leaves
    val part = new java.io.File(out, "batch_id=1")
    part.listFiles().foreach(_.delete()); part.delete()
    assert(sinkRows(out).keySet === Set(1L, 2L))
    // the replayed batch recomputes against batch_id < 1 (its own
    // published grams drop out) and restores the partition bit-same
    assert(SubstringIngest.ingestBatch(b1, 1L, table, out) === 2L)
    assert(sinkRows(out) === before)
    assert(Sinks.Versioned.versions(spark, table) === versionsBefore)
    assert(Sinks.Versioned.read(spark, table).collect()
      .map(_.toString).sorted.toSeq === idxBefore)
  }

  test("foreachBatch wiring end-to-end: AvailableNow over staged files " +
    "equals the per-batch core; a re-run on the same checkpoint is a " +
    "no-op") {
    val tmp = Files.createTempDirectory("graft_ssingest_st").toString
    val in = s"$tmp/in"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    stageParquetFile(df(d1, d2), s"$tmp/stage_b0", in, "b0", 1000000L)
    stageParquetFile(df(d5, d6), s"$tmp/stage_b1", in, "b1", 2000000L)
    val q = SubstringIngest.startFromParquet(spark, in, s"$tmp/ckpt",
      s"$tmp/index", s"$tmp/out", maxFilesPerTrigger = Some(1))
    q.awaitTermination(120000)
    assert(q.exception.isEmpty, s"ingest stream failed: ${q.exception}")
    val got = sinkRows(s"$tmp/out")
    assert(got(2L)._3 === "g1 g2 g3 g4 g5" && got(5L)._3 === "")
    val idxCount = Sinks.Versioned.read(spark, s"$tmp/index").count()
    // resume on the same checkpoint with no new files: nothing changes
    val q2 = SubstringIngest.startFromParquet(spark, in, s"$tmp/ckpt",
      s"$tmp/index", s"$tmp/out", maxFilesPerTrigger = Some(1))
    q2.awaitTermination(120000)
    assert(q2.exception.isEmpty)
    assert(sinkRows(s"$tmp/out") === got)
    assert(Sinks.Versioned.read(spark, s"$tmp/index").count() === idxCount)
  }
}
