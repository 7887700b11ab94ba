package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL (one JSON object per line) corpus ingestion — the interchange
  * format most published training corpora actually ship as. Reads with an
  * EXPLICIT schema (schema inference = an extra full pass over 100 TB)
  * in PERMISSIVE mode, routing unparseable lines into a corrupt-record
  * column instead of failing the job — at corpus scale a handful of
  * mangled lines is the normal case, and dropping them silently
  * (DROPMALFORMED) hides feed breakage.
  *
  * The result splits into [[JsonlCorpus.good]] rows (documents-table
  * shape, ready for every `ops.*` operator) and a [[JsonlCorpus
  * .corruptStats]] accounting frame — the ingest-health signal a feed
  * monitor alerts on. Both derive from ONE scan frame; the reader is a
  * plain `FileScan json`, so file listing parallelizes and predicate
  * pushdown/column pruning apply as usual.
  */
object JsonlCorpus {

  /** documents-table schema plus the corrupt-record capture column. */
  val CorruptCol = "_corrupt_record"

  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField(CorruptCol, StringType)))

  /** Raw permissive read; callers fork [[good]] / [[corruptStats]] off
    * this one frame.
    */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)

  /** Clean rows in the documents-table shape. A line is good when it
    * parsed AND carries the two columns every downstream operator keys
    * on (doc_id, text) — a parsed-but-idless row is as unusable as a
    * mangled one.
    */
  def good(raw: DataFrame): DataFrame =
    raw.filter(col(CorruptCol).isNull &&
        col("doc_id").isNotNull && col("text").isNotNull)
      .drop(CorruptCol)

  /** Ingest-health accounting: good / corrupt / missing-required counts.
    * One pass, one tiny aggregate row.
    */
  def corruptStats(raw: DataFrame): DataFrame =
    raw.agg(
      count(lit(1)).as("n_lines"),
      count(when(col(CorruptCol).isNotNull, 1)).as("n_corrupt"),
      count(when(col(CorruptCol).isNull &&
        (col("doc_id").isNull || col("text").isNull), 1))
        .as("n_missing_required"))
}
