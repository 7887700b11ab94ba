package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Shared file-source → checkpointed-parquet-sink plumbing for the
  * restartable streaming entry points (hourly report, drift monitor,
  * sessionization, dedup ingest): infer the on-disk schema from a batch
  * read (a streaming file source requires an explicit schema),
  * glob-filter to the table's files, optionally pace micro-batches by
  * file count, apply the pipeline's transform, and drain through a
  * checkpointed parquet sink with `AvailableNow`.
  *
  * Exactly-once across kills is carried by two logs the caller never
  * manages — the checkpoint's offset/commit log (a committed micro-batch
  * is never re-read; an uncommitted one replays from its recorded
  * offsets) and the file sink's `_spark_metadata` (data files register
  * only when their batch commits, so files a mid-batch kill left behind
  * stay invisible to readers). Each pipeline's restart spec proves the
  * contract end-to-end.
  */
private[streaming] object FileStreams {

  /** Streaming parquet source over `dir`, glob-filtered to the table's
    * files, optionally paced by file count per micro-batch. A streaming
    * file source requires a schema up front: pass one explicitly
    * (`schema`) when the pipeline knows its input shape — REQUIRED for a
    * monitor deployed AHEAD of its data, because the inference fallback
    * is an eager batch read that throws AnalysisException while the
    * directory holds no matching files yet (a normal pre-arrival state).
    * With no explicit schema the shape is inferred from the files
    * present, as before.
    */
  def readParquetStream(spark: SparkSession, dir: String, glob: String,
                        maxFilesPerTrigger: Option[Int],
                        schema: Option[org.apache.spark.sql.types.StructType] =
                          None): DataFrame = {
    // tz-naive parquet timestamps must surface as session-zone (UTC)
    // TimestampType, not TIMESTAMP_NTZ — watermarks require TIMESTAMP,
    // and the batch twins read through Tables with the same conf
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    val resolved = schema.getOrElse(
      spark.read.option("pathGlobFilter", glob).parquet(dir).schema)
    var reader = spark.readStream.schema(resolved).option("pathGlobFilter", glob)
    maxFilesPerTrigger.foreach(m =>
      reader = reader.option("maxFilesPerTrigger", m.toString))
    reader.parquet(dir)
  }

  /** Drain `df` through a checkpointed parquet sink with `AvailableNow`. */
  def startParquetSink(df: DataFrame, checkpoint: String,
                       out: String): StreamingQuery =
    df.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .format("parquet")
      .start(out)

  def startParquetSink(spark: SparkSession, dir: String, checkpoint: String,
                       out: String, glob: String,
                       maxFilesPerTrigger: Option[Int],
                       schema: Option[org.apache.spark.sql.types.StructType] =
                         None)
                      (transform: DataFrame => DataFrame): StreamingQuery =
    startParquetSink(
      transform(
        readParquetStream(spark, dir, glob, maxFilesPerTrigger, schema)),
      checkpoint, out)
}
