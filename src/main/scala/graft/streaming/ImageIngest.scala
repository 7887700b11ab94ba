package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Multimodal

/** Streaming IMAGE-dedup ingest — the [[SimhashIngest]] discipline on
  * the image modality: each micro-batch of media rows has its images
  * dHashed once ([[Multimodal.imagePhash]], batched map-side, the m1
  * corrupt-payload policy), screened against the PUBLISHED signature
  * index at hamming ≤ `maxDist`
  * ([[Multimodal.imagePhashDedupFromIndex]] — the signature-generic
  * screening core, batch reps broadcast, index streaming map-side),
  * survivors' 16-byte signatures appended to the index, and surviving
  * MEDIA rows emitted partitioned by batch id.
  *
  * Row policy (never lose rows silently): rows whose kind is not
  * exactly "image" — including a NULL kind (null-safe test) — pass
  * through unscreened, as does an image whose payload fails to decode
  * (no signature to screen; its decode_err surfaces via m4's
  * accounting). Only decodable images are subject to dedup.
  *
  * EXACTLY-ONCE REPLAY: the [[SimhashIngest]] construction — a
  * replayed batch's screened survivors ARE the signatures it stamped
  * (`batch_id = id` in the index; recomputing against the post-batch
  * index would drop them as near-dups of themselves), and the
  * pass-through rows are a pure deterministic filter of the batch
  * (kind + decode success), so the sink partition rewrites bit-same
  * via dynamic partition overwrite and the publish is skipped.
  */
object ImageIngest {

  def maxPublished(spark: SparkSession, table: String): Long =
    VersionedIngest.maxPublished(spark, table)

  /** The published signature index (media_id, phash, batch_id),
    * empty-but-typed before the first publish.
    */
  def readIndex(spark: SparkSession, table: String): DataFrame =
    VersionedIngest.readIndexOr(spark, table, {
      import spark.implicits._
      Seq.empty[(Long, Long, Long)].toDF("media_id", "phash", "batch_id")
    })

  /** Process ONE batch of media rows: dHash the images, screen against
    * the index + the batch itself, append the survivors' signatures,
    * emit surviving media rows (plus all pass-throughs) to
    * `out/batch_id=<id>/`. Idempotent per (batch contents, batchId).
    * Returns the emitted row count.
    */
  def ingestBatch(batch: DataFrame, batchId: Long, indexTable: String,
                  out: String, maxDist: Int = 4): Long = {
    val spark = batch.sparkSession
    val index = readIndex(spark, indexTable)
    // images only — screening and the undecodable pass-through must
    // both be scoped to image rows (a non-image row sharing a media_id
    // with an undecodable image would otherwise emit twice;
    // review-caught)
    val images = batch.filter(col("kind") <=> "image")
    // decode ONCE: the phash frame feeds the screening and the
    // unscreenable pass-through — uncut, both would re-pay the codecs
    val phash = graft.ops.Checkpoints.cut(Multimodal.imagePhash(images))
    // pass-throughs are a PURE deterministic function of the batch
    // (kind + decode success), so both the fresh and replay arms emit
    // them identically; the null-safe kind test keeps a NULL-kind row
    // from vanishing (=!= would filter it out of BOTH arms)
    val passThrough = batch.filter(!(col("kind") <=> "image"))
      .unionByName(images.join(
        phash.filter(col("phash").isNull).select(col("media_id")),
        Seq("media_id"), "left_semi"))
    val screened =
      if (batchId <= VersionedIngest.maxPublished(spark, indexTable))
        // replay: the stamped signatures ARE this batch's survivors
        images.join(index.filter(col("batch_id") === batchId)
          .select(col("media_id")), Seq("media_id"), "left_semi")
      else {
        val kept = graft.ops.Checkpoints.cut(
          Multimodal.imagePhashDedupFromIndex(
            index.select(col("media_id"), col("phash")), phash, maxDist))
        VersionedIngest.commit(spark, indexTable,
          kept.withColumn("batch_id", lit(batchId)), batchId)
        images.join(kept.select(col("media_id")), Seq("media_id"),
          "left_semi")
      }
    // sink write AFTER the publish: a crash in between replays into the
    // stamped-survivors arm, which rewrites exactly this partition
    val rows = screened.unionByName(passThrough)
      .withColumn("batch_id", lit(batchId))
    rows.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(out)
    rows.count()
  }

  /** Checkpointed streaming ingest over a parquet directory of media
    * rows — [[ingestBatch]] in the shared [[VersionedIngest]] wiring.
    */
  def startFromParquet(spark: SparkSession, dir: String, checkpoint: String,
                       indexTable: String, out: String, maxDist: Int = 4,
                       glob: String = "*.parquet",
                       maxFilesPerTrigger: Option[Int] = None,
                       schema: Option[org.apache.spark.sql.types.StructType] =
                         None,
                       compactEvery: Int = 0,
                       compactTargetFiles: Int = 8)
      : org.apache.spark.sql.streaming.StreamingQuery =
    VersionedIngest.runStream(spark, dir, checkpoint, indexTable, glob,
      maxFilesPerTrigger, schema, compactEvery, compactTargetFiles) {
      (batch, id) => ingestBatch(batch, id, indexTable, out, maxDist); ()
    }
}
