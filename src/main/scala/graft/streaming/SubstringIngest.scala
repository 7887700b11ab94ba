package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.TextAnalysis
import graft.sources.Sinks

/** Streaming keep-first SUBSTRING-dedup ingest — the operational form
  * of [[TextAnalysis.dupSubstringDedupFromIndex]] (n124), the
  * [[SimhashIngest]] discipline applied to exact-substring dedup: each
  * micro-batch of documents is trimmed against the PUBLISHED GRAM INDEX
  * (every k-word window text seen in any earlier batch) plus its own
  * internal firsts, the batch's NEW grams are appended to the index,
  * and the trimmed documents are emitted partitioned by batch id.
  * Folding doc_id-ordered batches through this equals batch-mode n122
  * restricted to each batch (spec-pinned end to end through the
  * versioned table).
  *
  * The index stores (g, batch_id) — one row per DISTINCT window text,
  * stamped with the batch that FIRST saw it, never positions or
  * documents. Presence is the whole signal: any later occurrence of an
  * indexed gram is non-first wherever it sits.
  *
  * SCALE SHAPE — the index NEVER shuffles: the batch's distinct gram
  * set is bounded by the trigger size and broadcasts; the index streams
  * map-side past it once per batch (a LEFT SEMI with the batch side
  * broadcast — plan-pinned), producing the small `hitGrams` ⊆ batch
  * grams that alone feeds the dedup join, and the append delta is the
  * equally small batch-local anti join batchGrams ∖ hitGrams. Compare
  * n124's registry form, where the "batch" is half the corpus and the
  * gram frames deliberately shuffle instead (the n73→n109 lesson) —
  * here smallness is a CONTRACT of the trigger, so broadcasting is the
  * honest 100 TB shape, exactly as in [[SimhashIngest]]'s screening.
  * The publish is an O(new grams) [[Sinks.Versioned.append]] manifest
  * commit.
  *
  * EXACTLY-ONCE REPLAY: deterministic reconstruction, not stamped
  * survivors — every batch screens against `index WHERE batch_id <
  * id`, which for a FRESH batch is the whole published index and for a
  * REPLAYED one is exactly the pre-batch state (its own grams are
  * stamped with its id and drop out), so recomputation emits the
  * original rows bit-for-bit and only rewrites its own sink partition
  * via dynamic partition overwrite; the publish is skipped (its grams
  * are already in). A crash between the index publish and the sink
  * write resumes without double-publishing or altering output;
  * SubstringIngestSpec drives the torn order.
  */
object SubstringIngest {

  def maxPublished(spark: SparkSession, table: String): Long =
    VersionedIngest.maxPublished(spark, table)

  /** The published gram index (g, batch_id), empty-but-typed before the
    * first publish.
    */
  def readIndex(spark: SparkSession, table: String): DataFrame =
    VersionedIngest.readIndexOr(spark, table, {
      import spark.implicits._
      Seq.empty[(String, Long)].toDF("g", "batch_id")
    })

  /** Process ONE batch of (doc_id, text, ...) rows: trim against the
    * pre-batch index + the batch's own firsts, append the new grams,
    * emit (doc_id, n_tokens, n_removed, text_dedup) to
    * `out/batch_id=<id>/`. Idempotent per (batch contents, batchId).
    * Returns the emitted row count (every doc survives, trimmed).
    */
  def ingestBatch(batch: DataFrame, batchId: Long, indexTable: String,
                  out: String, k: Int = 5): Long = {
    val spark = batch.sparkSession
    // pre-batch index state: for a fresh batch every published row
    // qualifies; for a replay the batch's own stamped grams drop out,
    // making the recompute deterministic
    val pre = readIndex(spark, indexTable)
      .filter(col("batch_id") < batchId)
    // cut: feeds the semi probe AND the append delta — uncut, the
    // batch's gram explode would run twice
    val batchGrams = graft.ops.Checkpoints.cut(
      TextAnalysis.dupSubstringIndex(batch, k))
    // the ONLY pass over the index: map-side stream past the broadcast
    // batch gram set; everything after is batch-sized
    val hitGrams = graft.ops.Checkpoints.cut(
      pre.select(col("g")).join(broadcast(batchGrams), Seq("g"),
        "left_semi"))
    // cut: the sink write AND the returned count both consume the
    // result — uncut, the whole dedup (gram explode, firsts shuffle,
    // rebuild) would run twice per batch (the SimhashIngest `kept`
    // lesson; review-caught here)
    val result = graft.ops.Checkpoints.cut(TextAnalysis
      .dupSubstringDedupFromIndex(hitGrams, batch, k))
    if (batchId > maxPublished(spark, indexTable))
      VersionedIngest.commit(spark, indexTable,
        batchGrams.join(hitGrams, Seq("g"), "left_anti")
          .withColumn("batch_id", lit(batchId)), batchId)
    // sink write AFTER the publish: a crash in between replays into the
    // deterministic recompute, which rewrites exactly this partition
    val rows = result.withColumn("batch_id", lit(batchId))
    VersionedIngest.writeBatchPartition(rows, out)
  }

  /** Checkpointed streaming ingest over a parquet directory of document
    * rows — [[ingestBatch]] in foreachBatch; `compactEvery` as in
    * [[SimhashIngest.startFromParquet]] (same measured cadence).
    */
  def startFromParquet(spark: SparkSession, dir: String, checkpoint: String,
                       indexTable: String, out: String, k: Int = 5,
                       glob: String = "*.parquet",
                       maxFilesPerTrigger: Option[Int] = None,
                       schema: Option[org.apache.spark.sql.types.StructType] =
                         None,
                       compactEvery: Int = 0,
                       compactTargetFiles: Int = 8)
      : org.apache.spark.sql.streaming.StreamingQuery =
    VersionedIngest.runStream(spark, dir, checkpoint, indexTable, glob,
      maxFilesPerTrigger, schema, compactEvery, compactTargetFiles) {
      (batch, id) => ingestBatch(batch, id, indexTable, out, k); ()
    }
}
