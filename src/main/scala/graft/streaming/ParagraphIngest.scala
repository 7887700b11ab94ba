package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.TextAnalysis
import graft.sources.Sinks

/** Streaming PARAGRAPH-dedup ingest — the operational form of
  * [[TextAnalysis.paragraphDedupFromIndex]] (n144), CCNet's first pass
  * run incrementally under the [[SubstringIngest]] discipline: each
  * micro-batch of documents is deduped against the PUBLISHED
  * PARAGRAPH-HASH INDEX (every block hash seen in any earlier batch)
  * plus its own internal firsts, the batch's NEW hashes are appended to
  * the index, and the deduped documents are emitted partitioned by
  * batch id. Folding doc_id-ordered batches through this equals
  * batch-mode n140 restricted to each batch (spec-pinned end to end
  * through the versioned table).
  *
  * The index stores (h, batch_id) — one 32-hex md5 row per DISTINCT
  * paragraph text, stamped with the batch that FIRST saw it, never
  * text or positions. Presence is the whole signal.
  *
  * SCALE SHAPE — identical to [[SubstringIngest]] but with far fewer
  * rows (paragraphs, not k-windows): the batch's distinct hash set is
  * trigger-bounded and broadcasts; the index streams map-side past it
  * once per batch (LEFT SEMI, batch side broadcast), producing the
  * small hit set that alone feeds the dedup join; the append delta is
  * the batch-local anti join; the publish is an O(new hashes)
  * [[Sinks.Versioned.append]] manifest commit. Compare n144's registry
  * form, where the "batch" is half the corpus and the hash frames
  * deliberately shuffle instead (the n73→n109 lesson) — here smallness
  * is a CONTRACT of the trigger.
  *
  * EXACTLY-ONCE REPLAY: the [[SubstringIngest]] construction verbatim —
  * every batch screens against `index WHERE batch_id < id` (a replayed
  * batch's own stamped hashes drop out, so the recompute is
  * deterministic and rewrites exactly its own sink partition via
  * dynamic partition overwrite; the publish is skipped).
  * ParagraphIngestSpec drives kill points and the torn order.
  */
object ParagraphIngest {

  def maxPublished(spark: SparkSession, table: String): Long =
    VersionedIngest.maxPublished(spark, table)

  /** The published hash index (h, batch_id), empty-but-typed before the
    * first publish.
    */
  def readIndex(spark: SparkSession, table: String): DataFrame =
    VersionedIngest.readIndexOr(spark, table, {
      import spark.implicits._
      Seq.empty[(String, Long)].toDF("h", "batch_id")
    })

  /** Process ONE batch of (doc_id, text, ...) rows: dedup against the
    * pre-batch index + the batch's own firsts, append the new hashes,
    * emit (doc_id, n_paras, n_removed, text_dedup) to
    * `out/batch_id=<id>/`. Idempotent per (batch contents, batchId).
    * Returns the emitted row count (every doc survives, deduped).
    */
  def ingestBatch(batch: DataFrame, batchId: Long, indexTable: String,
                  out: String, k: Int = 20): Long = {
    val spark = batch.sparkSession
    val pre = readIndex(spark, indexTable)
      .filter(col("batch_id") < batchId)
    // cut: feeds the semi probe AND the append delta — uncut, the
    // batch's block explode would run twice
    val batchHashes = graft.ops.Checkpoints.cut(
      TextAnalysis.paragraphIndex(batch, k))
    // the ONLY pass over the index: map-side stream past the broadcast
    // batch hash set; everything after is batch-sized
    val hitHashes = graft.ops.Checkpoints.cut(
      pre.select(col("h")).join(broadcast(batchHashes), Seq("h"),
        "left_semi"))
    // cut: the sink write AND the returned count both consume the
    // result (the SubstringIngest lesson)
    val result = graft.ops.Checkpoints.cut(TextAnalysis
      .paragraphDedupFromIndex(hitHashes, batch, k))
    if (batchId > maxPublished(spark, indexTable))
      VersionedIngest.commit(spark, indexTable,
        batchHashes.join(hitHashes, Seq("h"), "left_anti")
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
                       indexTable: String, out: String, k: Int = 20,
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
