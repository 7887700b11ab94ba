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

  /** Streaming parquet source over `dir`, schema inferred from a batch
    * read (a streaming file source requires one), glob-filtered to the
    * table's files, optionally paced by file count per micro-batch.
    */
  def readParquetStream(spark: SparkSession, dir: String, glob: String,
                        maxFilesPerTrigger: Option[Int]): DataFrame = {
    val schema = spark.read.option("pathGlobFilter", glob).parquet(dir).schema
    var reader = spark.readStream.schema(schema).option("pathGlobFilter", glob)
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
                       maxFilesPerTrigger: Option[Int])
                      (transform: DataFrame => DataFrame): StreamingQuery =
    startParquetSink(
      transform(readParquetStream(spark, dir, glob, maxFilesPerTrigger)),
      checkpoint, out)
}
