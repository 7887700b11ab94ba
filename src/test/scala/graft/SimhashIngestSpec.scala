package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Sinks
import graft.streaming.SimhashIngest

/** The text-side streaming near-dup ingest: greedy-stream policy over
  * the 60-bit simhash index, text-free signature index, idempotent
  * replay across the publish-then-crash torn order, and the
  * foreachBatch wiring. Exact-copy texts (hamming 0) keep every
  * expectation block-independent.
  */
class SimhashIngestSpec extends SparkSpec {
  import spark.implicits._

  private val X = "the quick brown fox jumps over the lazy dog"
  private val Y = "completely different words here entirely now"

  private def df(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  private def sinkRows(out: String) =
    spark.read.parquet(out)
      .select(col("batch_id").cast("long"), col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("greedy-stream policy across batches; the index carries " +
    "signatures, never text") {
    val tmp = Files.createTempDirectory("graft_shingest").toString
    val (table, out) = (s"$tmp/index", s"$tmp/out")
    // batch 0: 1=X kept; 2=X dropped (smaller-id twin in-batch)
    assert(SimhashIngest.ingestBatch(df((1L, X), (2L, X)), 0L, table, out)
      === 1L)
    // batch 1: 3=X dropped (vs INDEXED 1 — not vs dropped 2); 4=Y kept
    assert(SimhashIngest.ingestBatch(df((3L, X), (4L, Y)), 1L, table, out)
      === 1L)
    assert(sinkRows(out) === Set((0L, 1L), (1L, 4L)))
    val idx = Sinks.Versioned.read(spark, table)
    assert(!idx.columns.contains("text"),
      "the signature index must stay text-free")
    assert(idx.select(col("doc_id"), col("batch_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet ===
      Set((1L, 0L), (4L, 1L)))
    // the sink DOES carry the surviving documents' text
    assert(spark.read.parquet(out).columns.contains("text"))
  }

  test("replay idempotence incl. the publish-then-crash torn order: " +
    "the sink partition rebuilds from the stamped survivors, the " +
    "index never double-publishes") {
    val tmp = Files.createTempDirectory("graft_shingest_rp").toString
    val (table, out) = (s"$tmp/index", s"$tmp/out")
    SimhashIngest.ingestBatch(df((1L, X), (2L, X)), 0L, table, out)
    val b1 = df((3L, X), (4L, Y), (5L, Y))
    assert(SimhashIngest.ingestBatch(b1, 1L, table, out) === 1L) // 4 only
    val versionsBefore = Sinks.Versioned.versions(spark, table)
    val idxBefore = Sinks.Versioned.read(spark, table).collect()
      .map(_.toString).sorted.toSeq
    // CRASH AFTER PUBLISH, BEFORE SINK WRITE: lose the sink partition,
    // keep the index — exactly what a kill between the two leaves
    val part = new java.io.File(out, "batch_id=1")
    part.listFiles().foreach(_.delete()); part.delete()
    assert(sinkRows(out) === Set((0L, 1L)))
    // the replayed batch (same id, same contents) restores the sink
    // from the stamped survivors and publishes NOTHING new
    assert(SimhashIngest.ingestBatch(b1, 1L, table, out) === 1L)
    assert(sinkRows(out) === Set((0L, 1L), (1L, 4L)))
    assert(Sinks.Versioned.versions(spark, table) === versionsBefore)
    assert(Sinks.Versioned.read(spark, table).collect()
      .map(_.toString).sorted.toSeq === idxBefore)
  }

  test("foreachBatch wiring end-to-end: AvailableNow over staged files " +
    "equals the per-batch core; a re-run on the same checkpoint is a " +
    "no-op") {
    val tmp = Files.createTempDirectory("graft_shingest_st").toString
    val in = s"$tmp/in"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    stageParquetFile(df((1L, X), (2L, X)), s"$tmp/stage_b0", in, "b0",
      1000000L)
    stageParquetFile(df((3L, X), (4L, Y)), s"$tmp/stage_b1", in, "b1",
      2000000L)
    val q = SimhashIngest.startFromParquet(spark, in, s"$tmp/ckpt",
      s"$tmp/index", s"$tmp/out", maxFilesPerTrigger = Some(1))
    q.awaitTermination(120000)
    assert(q.exception.isEmpty, s"ingest stream failed: ${q.exception}")
    assert(sinkRows(s"$tmp/out").map(_._2) === Set(1L, 4L))
    assert(Sinks.Versioned.read(spark, s"$tmp/index").count() === 2L)
    // resume on the same checkpoint with no new files: nothing changes
    val q2 = SimhashIngest.startFromParquet(spark, in, s"$tmp/ckpt",
      s"$tmp/index", s"$tmp/out", maxFilesPerTrigger = Some(1))
    q2.awaitTermination(120000)
    assert(q2.exception.isEmpty)
    assert(sinkRows(s"$tmp/out").map(_._2) === Set(1L, 4L))
    assert(Sinks.Versioned.read(spark, s"$tmp/index").count() === 2L)
  }
}
