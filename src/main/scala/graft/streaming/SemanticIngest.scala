package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Similarity
import graft.sources.Sinks

/** Streaming near-dup-suppressed ingest — the production composite the
  * round-7 pieces exist for: each micro-batch of embeddings is deduped
  * against the PUBLISHED SURVIVOR INDEX (plus itself) via
  * [[Similarity.incrementalSemanticDedup]], the survivors are appended
  * to the index — a [[Sinks.Versioned]] table, so concurrent readers
  * always see a complete snapshot — and emitted to the sink partitioned
  * by batch id.
  *
  * POLICY: this is the greedy STREAM variant of semantic dedup — a
  * vector dropped in batch b is not in the index, so it can never drop
  * a later arrival (unlike the one-pass batch policy n46, where a
  * dropped vector still drops others). Arrival order is part of the
  * contract, exactly as in every streaming dedup.
  *
  * EXACTLY-ONCE REPLAY: Spark replays a failed micro-batch with the
  * SAME batch id. The index carries a `batch_id` column; a replay
  * whose id is already present in the index recomputes NOTHING — its
  * survivors are by definition the index rows stamped with that id
  * (deterministic: they were computed against the pre-batch index
  * state) — and only rewrites its own sink partition via dynamic
  * partition overwrite. A crash between the index publish and the sink
  * write therefore resumes without double-publishing the index or
  * duplicating sink rows. SemanticIngestSpec drives the torn orders.
  *
  * Scale shape: the per-batch work is [[Similarity
  * .incrementalSemanticDedup]]'s — the index streams map-side against
  * the broadcast batch, never shuffling per batch — and the per-batch
  * PUBLISH is [[Sinks.Versioned.append]]: an O(batch) manifest commit
  * (only the batch's survivors are written; the index data is inherited
  * by reference), so B batches write O(total survivors) bytes, not
  * O(B·index). The replay high-water mark rides the version METADATA
  * (`max_batch_id`) — one tiny manifest read per batch, never an index
  * scan. Small per-batch files accumulate across commits; compact on a
  * schedule via [[Sinks.Versioned.compact]] (it carries the metadata
  * forward) and size `keepVersions` to reader lifetimes.
  */
object SemanticIngest {

  def maxPublished(spark: SparkSession, table: String): Long =
    VersionedIngest.maxPublished(spark, table)

  /** The published survivor index (vec_id, label, embedding, batch_id),
    * empty-but-typed when nothing has been published yet.
    */
  def readIndex(spark: SparkSession, table: String,
                like: DataFrame): DataFrame =
    VersionedIngest.readIndexOr(spark, table,
      like.select(col("vec_id"), col("label"), col("embedding"))
        .withColumn("batch_id", lit(0L)).limit(0))

  /** Process ONE batch: dedup against the index + itself, publish the
    * survivors into the index, emit them to `out/batch_id=<id>/`.
    * Idempotent per (batch contents, batchId) — the foreachBatch
    * contract. Returns the number of survivors.
    */
  def ingestBatch(batch: DataFrame, batchId: Long, indexTable: String,
                  out: String, threshold: Double,
                  bucketBits: Int): Long = {
    val spark = batch.sparkSession
    val index = readIndex(spark, indexTable, batch)
    val survivors =
      if (batchId <= maxPublished(spark, indexTable))
        // replay of an already-published batch: its survivors ARE the
        // index rows it stamped (computed against the pre-batch index —
        // recomputing here against the POST-batch index would wrongly
        // drop them as near-dups of themselves)
        index.filter(col("batch_id") === batchId)
          .select(col("vec_id"), col("label"))
      else {
        val kept = Similarity.incrementalSemanticDedup(
          batch, index.select(col("vec_id"), col("embedding")),
          threshold, bucketBits)
        val enriched = batch
          .join(kept.select(col("vec_id")), Seq("vec_id"), "left_semi")
          .select(col("vec_id"), col("label"), col("embedding"))
          .withColumn("batch_id", lit(batchId))
        // append-only manifest commit: O(batch) — only the survivors are
        // written; the index data is inherited by reference. The old
        // `publish(index ∪ batch)` rewrote the WHOLE index per batch —
        // quadratic over the stream's life.
        VersionedIngest.commit(spark, indexTable, enriched, batchId)
        enriched.select(col("vec_id"), col("label"))
      }
    // sink write AFTER the publish: a crash in between replays into the
    // `batchId <= maxPublished` arm above, which rewrites exactly this
    // partition from the index — no dupes, no losses. Dynamic overwrite
    // is a PER-WRITE option, not a session-conf mutation that would
    // silently change every later partitioned write on this session.
    val rows = survivors.withColumn("batch_id", lit(batchId))
    VersionedIngest.writeBatchPartition(rows, out)
  }

  /** Start the checkpointed streaming ingest over a parquet directory of
    * (vec_id, label, embedding) rows — [[ingestBatch]] wired into
    * foreachBatch; `schema` lets it start ahead of the first file.
    *
    * `compactEvery = k` (0 = off) compacts the index table after every
    * k-th batch: append commits are O(batch) but accumulate one small
    * data dir per batch, and a long-lived stream would otherwise leave
    * the index a thousand-dir parquet scan. Compaction is the owning
    * stream's job exactly because it holds the single-writer role; it
    * runs BETWEEN batches under the same lease, carries the high-water
    * metadata forward, and a replay after a crash mid-compact is safe
    * (compact publishes a full version or nothing — the pointer swap is
    * atomic). Amortized cost stays linear: each row is rewritten once
    * per compaction cycle, not once per batch.
    *
    * Cadence (measured, BENCH_NOTES round 9, 200-commit chain): read
    * wall is flat to ~50 commit dirs and then grows linearly at ~3 ms
    * per dir of listing overhead, while a compact costs ~one batch-write
    * and resets it. `compactEvery ≈ 50` (anywhere ≤ 100) keeps reader
    * amplification under ~2.5× of compacted at ~2-3% of the stream's
    * batch budget.
    */
  def startFromParquet(spark: SparkSession, dir: String, checkpoint: String,
                       indexTable: String, out: String,
                       threshold: Double = 0.3, bucketBits: Int = 0,
                       glob: String = "*.parquet",
                       maxFilesPerTrigger: Option[Int] = None,
                       schema: Option[org.apache.spark.sql.types.StructType] =
                         None,
                       compactEvery: Int = 0,
                       compactTargetFiles: Int = 8)
      : org.apache.spark.sql.streaming.StreamingQuery =
    VersionedIngest.runStream(spark, dir, checkpoint, indexTable, glob,
      maxFilesPerTrigger, schema, compactEvery, compactTargetFiles) {
      (batch, id) =>
        ingestBatch(batch, id, indexTable, out, threshold, bucketBits); ()
    }
}
