package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the harness parquet tables (TESTDATA.md / FIXTURES.md §1).
  *
  * Every operator query takes `(SparkSession, sfDir)` and reads from here so
  * the DuckDB oracle (which gets the same parquet registered under bare table
  * names) sees identical inputs. Filters/projections applied downstream push
  * into these parquet scans via Catalyst (PushedFilters / ReadSchema), so at
  * 100 TB a date-partitioned layout prunes before any shuffle.
  */
object Tables {
  /** All fixture reads go through one reader that pins how parquet
    * timestamps surface:
    *
    *   - `inferTimestampNTZ.enabled=false`: the harness parquet stores
    *     tz-NAIVE µs timestamps (`isAdjustedToUTC=false`); by default
    *     Spark 4 reads those as TIMESTAMP_NTZ, which breaks every
    *     TIMESTAMP-typed consumer (`unix_micros`, watermarks) and which
    *     the DuckDB oracle does not distinguish anyway. With the conf
    *     off they read as session-zone TimestampType — the session is
    *     pinned UTC, so the wall-clock values equal DuckDB's naive read.
    *     Doing this via conf (not a post-read cast) keeps predicate
    *     pushdown on timestamp columns intact — a cast on top of the
    *     scan would strip PushedFilters at 100 TB.
    *   - `nanosAsLong=true`: back-compat with fixtures that stored
    *     TIMESTAMP(NANOS), which the vectorized reader rejects.
    *
    * Both are runtime SQLConfs, safe to set per-session.
    */
  private def reader(s: SparkSession) = {
    s.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.read
  }
  def region(s: SparkSession, dir: String): DataFrame    = reader(s).parquet(s"$dir/region.parquet")
  def nation(s: SparkSession, dir: String): DataFrame    = reader(s).parquet(s"$dir/nation.parquet")
  def customer(s: SparkSession, dir: String): DataFrame  = reader(s).parquet(s"$dir/customer.parquet")
  def supplier(s: SparkSession, dir: String): DataFrame  = reader(s).parquet(s"$dir/supplier.parquet")
  def part(s: SparkSession, dir: String): DataFrame      = reader(s).parquet(s"$dir/part.parquet")
  def orders(s: SparkSession, dir: String): DataFrame    = reader(s).parquet(s"$dir/orders.parquet")
  def lineitem(s: SparkSession, dir: String): DataFrame  = reader(s).parquet(s"$dir/lineitem.parquet")
  /** `ts` arrives as µs TimestampType via [[reader]]; a nano-long `ts`
    * (the TIMESTAMP(NANOS) legacy layout) converts to µs TimestampType
    * (lossless — the generator emits µs precision).
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    val raw = reader(s).parquet(s"$dir/events.parquet")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }
  def documents(s: SparkSession, dir: String): DataFrame = reader(s).parquet(s"$dir/documents.parquet")
  def embeddings(s: SparkSession, dir: String): DataFrame = reader(s).parquet(s"$dir/embeddings.parquet")
}
