package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (north star, BASELINE.json): image/audio/
  * video payloads travel as opaque `binary` columns next to typed metadata;
  * decode / feature-extraction runs as a per-partition batch transform.
  *
  * The Spark-side machinery here — schema, partitioning, the
  * `mapPartitions` batch shape (the JVM analog of an arrow-batched pandas
  * UDF), real and tested. The actual codec call is STUBBED with a
  * deterministic fake (`fakeDecode`), clearly marked below, because no
  * image/audio library ships in this container; swapping in a real decoder
  * changes only that one function.
  *
  * Scale notes: payload bytes never pass through a shuffle — the transform
  * is map-side only; binary columns ride parquet page compression;
  * `spark.sql.files.maxPartitionBytes` bounds per-task memory since rows
  * are wide. Feature vectors (small) are what downstream joins/aggs touch.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true))),
      nullable = true)))

  /** Synthesize a deterministic media table from `events`: payload bytes
    * derived from the row content (stands in for real image/audio blobs).
    */
  def mediaFromEvents(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.ops.Tables.events(spark, dir)
    ev.select(
      col("event_id").as("media_id"),
      when(pmod(col("event_id"), lit(3)) === 0, "image")
        .when(pmod(col("event_id"), lit(3)) === 1, "audio")
        .otherwise("video").as("kind"),
      // fake payload: repeated md5-hex bytes, length keyed to the row
      repeat(md5(col("event_id").cast("string")),
        (pmod(col("event_id"), lit(8)) + 1).cast("int"))
        .cast("binary").as("payload"),
      struct(
        (pmod(col("event_id"), lit(640)) + 32).cast("int").as("width"),
        (pmod(col("event_id"), lit(480)) + 32).cast("int").as("height"),
        lit(16000).as("sample_rate")).as("meta"))
  }

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("feature", ArrayType(FloatType), nullable = false)))

  /** ======== STUB: deterministic fake decoder ========
    * A real implementation would decode the payload (JPEG/WAV/MP4) and
    * extract features; this fake derives an 8-dim feature from the raw
    * bytes so the pipeline is deterministic and testable end-to-end.
    */
  def fakeDecode(payload: Array[Byte]): Array[Float] = {
    val f = new Array[Float](8)
    if (payload != null) {
      var i = 0
      while (i < payload.length) {
        f(i % 8) += (payload(i) & 0xff) / 255.0f
        i += 1
      }
    }
    f
  }

  /** Per-partition batched decode — the `mapPartitions` shape a real
    * decoder needs (amortize codec init across the partition, stream rows,
    * never collect). Returns (media_id, kind, n_bytes, feature).
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val enc = ExpressionEncoder(RowEncoder.encoderFor(featureSchema))
    media.select(col("media_id"), col("kind"), col("payload"))
      .mapPartitions { rows =>
        // (real codec would be initialized once here, per partition)
        rows.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          Row(r.getLong(0), r.getString(1),
            if (payload == null) 0 else payload.length,
            fakeDecode(payload).toSeq)
        }
      }(enc)
  }

  /** Feature roll-up per kind — the downstream consumer a training
    * pipeline would run (rows-only check: stub features are not
    * SQL-oracle material).
    */
  def featureStats(spark: SparkSession, dir: String): DataFrame =
    extractFeatures(mediaFromEvents(spark, dir))
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n"),
        sum(col("n_bytes")).as("total_bytes"),
        round(avg(element_at(col("feature"), 1)), 4).as("avg_f0"))
      .orderBy(col("kind"))
}
