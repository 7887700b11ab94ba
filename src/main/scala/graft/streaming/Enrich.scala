package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Remaining streaming building blocks of a production ingest path:
  * watermarked streaming deduplication, stream-static enrichment joins,
  * and an idempotent `foreachBatch` sink.
  */
object Enrich {

  /** Exactly-once-per-key ingestion: drop duplicate events by id while
    * only retaining state within the watermark — the streaming twin of
    * exact dedup (`n1`), with state bounded by the dedup horizon instead
    * of history.
    */
  def dedupStream(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Start the checkpointed [[dedupStream]] over a parquet directory and
    * return the running query — the restartable S7 shape of the dedup
    * ingest. Restart recovers the SEEN-ID state store: an id ingested
    * before the kill must still suppress its duplicates arriving after
    * the resume (EnrichStreamSpec proves it with duplicates planted on
    * both sides of the kill).
    */
  def startDedupFromParquet(spark: org.apache.spark.sql.SparkSession,
                            dir: String, checkpoint: String, out: String,
                            watermark: String = "1 hour",
                            glob: String = "*.parquet",
                            maxFilesPerTrigger: Option[Int] = None,
                            schema: Option[org.apache.spark.sql.types.StructType] =
                              None)
      : org.apache.spark.sql.streaming.StreamingQuery =
    // `schema` lets the ingest start AHEAD of its first data file — the
    // inference fallback needs one matching file to exist
    FileStreams.startParquetSink(spark, dir, checkpoint, out, glob,
      maxFilesPerTrigger, schema)(dedupStream(_, watermark))

  /** Stream-static enrichment: each micro-batch joins the (small, cached)
    * static dimension — broadcast per batch, no stream-side state.
    */
  def enrich(stream: DataFrame, dim: DataFrame, key: String): DataFrame =
    stream.join(broadcast(dim), Seq(key), "left_outer")

  /** Streaming near-dup suppression: fingerprint each incoming document
    * (order/multiplicity-insensitive word-set signature) and keep only the
    * first arrival per fingerprint within the watermark — the streaming
    * twin of fingerprint dedup (`n15`/`n16`), state bounded by the
    * horizon. Input needs (ts, doc_id, text).
    */
  def dedupDocsStream(docs: DataFrame, watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("fingerprint", graft.ops.TextAnalysis.fingerprintCol)
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("fingerprint")

  /** Stream-stream interval join: each purchase matched to the same
    * user's clicks in the `window` before it (click attribution). Both
    * sides are watermarked and the join carries an event-time range
    * condition, so Spark bounds join state to watermark + window and
    * evicts old rows — without the range condition state grows forever.
    * Batch twin: [[graft.ops.Reports.clickAttribution]] (query `b25`);
    * EnrichStreamSpec proves stream output equals the batch twin.
    */
  def attributeStream(clicks: DataFrame, purchases: DataFrame,
                      window: String = "30 minutes",
                      watermark: String = "1 hour"): DataFrame = {
    val c = clicks.select(col("user_id"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
      .withWatermark("click_ts", watermark)
    val p = purchases.select(col("user_id").as("p_user"),
        col("ts").as("purchase_ts"), col("event_id").as("purchase_id"))
      .withWatermark("purchase_ts", watermark)
    c.join(p, col("user_id") === col("p_user") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr(s"interval $window"))
      .select(col("user_id"), col("purchase_id"), col("purchase_ts"),
        col("click_id"), col("click_ts"))
  }

  /** Start the checkpointed click-attribution join over two parquet
    * directories and return the running query — the restartable S7 shape
    * of the stream-stream interval join. Restart recovers the JOIN state
    * stores on both sides: a click ingested before the kill must still
    * match a purchase arriving after the resume (inner-join rows emit as
    * matches are found; the watermark + range condition bound how long
    * each side's rows are held). EnrichStreamSpec proves it with a
    * purchase planted on the far side of the kill from its clicks.
    */
  def startAttributionFromParquet(spark: org.apache.spark.sql.SparkSession,
                                  clicksDir: String, purchasesDir: String,
                                  checkpoint: String, out: String,
                                  window: String = "30 minutes",
                                  watermark: String = "1 hour",
                                  glob: String = "*.parquet",
                                  maxFilesPerTrigger: Option[Int] = None,
                                  clicksSchema: Option[org.apache.spark.sql.types.StructType] =
                                    None,
                                  purchasesSchema: Option[org.apache.spark.sql.types.StructType] =
                                    None)
      : org.apache.spark.sql.streaming.StreamingQuery =
    // per-side schemas let either leg start AHEAD of its first data file —
    // the inference fallback needs one matching file per directory
    FileStreams.startParquetSink(
      attributeStream(
        FileStreams.readParquetStream(spark, clicksDir, glob,
          maxFilesPerTrigger, clicksSchema),
        FileStreams.readParquetStream(spark, purchasesDir, glob,
          maxFilesPerTrigger, purchasesSchema),
        window, watermark),
      checkpoint, out)

  /** foreachBatch sink with exactly-once replay semantics: partitions are
    * keyed by (day, batch_id), so a re-run of a failed batch (same
    * batchId — Spark replays with the original id) overwrites exactly its
    * own partitions, while later batches that touch the same day land in
    * their own batch_id partitions and never clobber earlier ones.
    * (Partitioning by day alone would silently drop prior batches' rows
    * whenever two batches share a day.)
    */
  def writeBatchIdempotent(out: String)(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    batch
      .withColumn("p_day", date_format(col("ts"), "yyyy-MM-dd"))
      .withColumn("batch_id", lit(batchId))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy("p_day", "batch_id")
      .parquet(out)
  }
}
