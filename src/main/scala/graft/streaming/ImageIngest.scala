package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.{Multimodal, Sinks}

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
  * Row policy (never lose rows silently): non-image rows (audio,
  * video) pass through unscreened — near-dup hashing is an image
  * signal; an image whose payload fails to decode has no signature to
  * screen and passes through too (its decode_err surfaces downstream
  * via m4's accounting, the m1 convention). Only decodable images are
  * subject to dedup.
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

  private val BatchIdMeta = "max_batch_id"

  private def indexExists(spark: SparkSession, table: String): Boolean = {
    val ptr = new org.apache.hadoop.fs.Path(table, "_current")
    ptr.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(ptr)
  }

  /** Highest batch id already published — from version metadata (O(1),
    * zero Spark jobs).
    */
  def maxPublished(spark: SparkSession, table: String): Long =
    if (!indexExists(spark, table)) -1L
    else Sinks.Versioned.meta(spark, table).get(BatchIdMeta) match {
      case Some(v) => v.toLong
      case None =>
        Sinks.Versioned.read(spark, table)
          .agg(max(col("batch_id"))).head() match {
            case r if r.isNullAt(0) => -1L
            case r => r.getLong(0)
          }
    }

  /** The published signature index (media_id, phash, batch_id),
    * empty-but-typed before the first publish.
    */
  def readIndex(spark: SparkSession, table: String): DataFrame =
    if (indexExists(spark, table)) Sinks.Versioned.read(spark, table)
    else {
      import spark.implicits._
      Seq.empty[(Long, Long, Long)].toDF("media_id", "phash", "batch_id")
    }

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
    // decode ONCE: the phash frame feeds the screening, the survivor
    // semi join, and the unscreenable pass-through — uncut, every
    // consumer would re-pay the codec pass
    val phash = graft.ops.Checkpoints.cut(
      Multimodal.imagePhash(batch.filter(col("kind") === "image")))
    // pass-throughs are a PURE deterministic function of the batch
    // (kind + decode success), so both the fresh and replay arms emit
    // them identically
    val passThrough = batch.filter(col("kind") =!= "image")
      .unionByName(batch.join(
        phash.filter(col("phash").isNull).select(col("media_id")),
        Seq("media_id"), "left_semi"))
    val screened =
      if (batchId <= maxPublished(spark, indexTable))
        // replay: the stamped signatures ARE this batch's survivors
        batch.join(index.filter(col("batch_id") === batchId)
          .select(col("media_id")), Seq("media_id"), "left_semi")
      else {
        val kept = graft.ops.Checkpoints.cut(
          Multimodal.imagePhashDedupFromIndex(
            index.select(col("media_id"), col("phash")), phash, maxDist))
        val stamped = kept.withColumn("batch_id", lit(batchId))
        if (indexExists(spark, indexTable))
          Sinks.Versioned.append(stamped, indexTable,
            meta = Map(BatchIdMeta -> batchId.toString))
        else
          Sinks.Versioned.publish(stamped, indexTable,
            meta = Map(BatchIdMeta -> batchId.toString))
        batch.join(kept.select(col("media_id")), Seq("media_id"),
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
    * rows — [[ingestBatch]] in foreachBatch; `compactEvery` as in
    * [[SimhashIngest.startFromParquet]].
    */
  def startFromParquet(spark: SparkSession, dir: String, checkpoint: String,
                       indexTable: String, out: String, maxDist: Int = 4,
                       glob: String = "*.parquet",
                       maxFilesPerTrigger: Option[Int] = None,
                       schema: Option[org.apache.spark.sql.types.StructType] =
                         None,
                       compactEvery: Int = 0,
                       compactTargetFiles: Int = 8)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    Sinks.Versioned.breakLease(spark, indexTable)
    FileStreams.readParquetStream(spark, dir, glob, maxFilesPerTrigger,
        schema)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        ingestBatch(batch, id, indexTable, out, maxDist)
        if (compactEvery > 0 && id > 0 && id % compactEvery == 0 &&
            indexExists(spark, indexTable))
          Sinks.Versioned.compact(spark, indexTable, compactTargetFiles)
        ()
      }
      .start()
  }
}
