package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured Streaming twin of the hourly report aggregation (SURVEY §2.9).
  *
  * The reference encodes micro-batch semantics by hand: one run per hour,
  * skip the still-open hour file "as entries could still be written"
  * (/root/reference/rds_pgbadger.py:112-115), re-list the previous day when
  * the window straddles midnight (:104-110), and memoize finished outputs
  * (:25-26,44-49). Those map one-to-one onto Structured Streaming:
  *
  *   - tumbling `window(ts, "1 hour")`  ← one log file per hour;
  *   - `withWatermark("ts", "1 hour")`  ← open-hour exclusion: a window is
  *     only emitted (Append mode) once the watermark passes its end, i.e.
  *     never while "entries could still be written";
  *   - watermark lateness tolerance     ← midnight-straddle catch-up;
  *   - checkpointed file sink           ← exactly-once memoization.
  *
  * At scale this is shuffle-per-microbatch on (window, event_type) only —
  * state is one row per open hour per class, bounded by the watermark.
  */
object Hourly {

  /** Event-time hourly aggregation over any `ts/event_type/value` frame.
    * Works identically on a batch frame or a `readStream` frame — the same
    * plan is the batch oracle for the streaming test.
    */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** File-source streaming variant over the events parquet directory —
    * `AvailableNow` replays the whole directory as micro-batches, the
    * streaming analog of the reference's scheduled hourly run.
    */
  def streamFromParquet(spark: SparkSession, dir: String,
                        checkpoint: String, out: String): Unit = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Stream with the RAW on-disk schema (ts as nano-long), then apply the
    // same µs conversion Tables.events does for batch.
    val rawSchema = spark.read.parquet(s"$dir/events.parquet").schema
    // the file source needs a directory; glob-filter down to the table file
    val raw = spark.readStream.schema(rawSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    // same schema guard as Tables.events: only nano-long ts needs converting
    val stream =
      if (rawSchema("ts").dataType == org.apache.spark.sql.types.LongType)
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else raw
    hourlyAgg(stream)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .format("parquet")
      .start(out)
      .awaitTermination()
  }
}
