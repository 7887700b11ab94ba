package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.TextAnalysis

/** Streaming twin of the n45 source-drift check: per event-time window and
  * source, KL(window-source word distribution ‖ a static reference
  * distribution) — the production monitor that flags a feed collapsing
  * onto boilerplate or diverging from the corpus its mix was tuned on,
  * while the feed is still flowing.
  *
  * Shape: two CHAINED watermarked streaming aggregations (supported since
  * the multiple-stateful-operator work in Spark 3.4 — the second groups on
  * `window_time` of the first's finalized windows):
  *
  *   1. (window, source, word) token counts — state bounded per window by
  *      the active vocabulary, closed by the watermark;
  *   2. join the static reference distribution (stream-static, no state)
  *      and roll up per (window, source) using the decomposition
  *      KL = (Σ c_w·ln(c_w/q_w))/c − ln(c) with c = Σ c_w, so the word
  *      level needs no second pass for the totals.
  *
  * The ln terms go through decimal(28,10) — wider than n45's because the
  * decomposition multiplies each term by its count, so the magnitude
  * grows with window size — making the roll-up order-independent: the
  * streaming result is bit-equal to running the same core on the same
  * rows as a batch frame (spec-proven).
  *
  * Unseen words (not in the reference) carry q = null → the row is
  * EXCLUDED from the sum, mirroring the batch n45 join semantics where
  * the reference is the corpus itself and every word is present. At 100 TB
  * the reference frame is vocabulary-sized and shuffles once per
  * micro-batch on the word key; counts never leave their window state.
  */
object Drift {

  /** Static reference distribution (word, q) from a batch corpus — the
    * denominator of the KL terms. q is each word's share of all corpus
    * tokens. PURE definition, deliberately uncached: as the static side of
    * a per-micro-batch stream-static join it should be wrapped in
    * [[cacheReference]], whose handle OWNS the cache lifetime (the bare
    * `.cache()` this used to do was held strongly by the CacheManager with
    * release delegated to a comment — the leak class the round-4 verdict
    * flagged). In production, persist it to a table once and read that.
    */
  def referenceDistribution(docs: DataFrame): DataFrame = {
    val wc = docs
      .select(explode(TextAnalysis.words(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cw"))
    wc.crossJoin(broadcast(wc.agg(sum(col("cw")).as("ct"))))
      .select(col("w"), (col("cw").cast("double") / col("ct")).as("q"))
  }

  /** Owning handle for a cached reference distribution. The cache is
    * load-bearing (without materialization every micro-batch rescans the
    * reference corpus twice — the word counts feed both the shares and,
    * via the self crossJoin, the total), so release must be explicit:
    * call [[release]] when the stream stops, or hand the handle to
    * [[releaseOnTermination]] so a stopped stream cannot leak it.
    */
  final class ReferenceCache private[streaming] (val df: DataFrame) {
    def release(): Unit = df.unpersist(blocking = true)
    def isCached: Boolean =
      df.storageLevel != org.apache.spark.storage.StorageLevel.NONE
  }

  /** Cache the reference distribution and return the owning handle. */
  def cacheReference(docs: DataFrame): ReferenceCache =
    new ReferenceCache(referenceDistribution(docs).cache())

  /** Tie `ref`'s lifetime to `query`: a self-removing listener releases
    * the cache when exactly that query terminates (stop or failure), so
    * the CacheManager cannot hold the vocabulary frame past the stream.
    */
  def releaseOnTermination(
      ref: ReferenceCache,
      query: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    val streams = ref.df.sparkSession.streams
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
        if (e.id == query.id) {
          ref.release()
          streams.removeListener(this)
        }
    }
    streams.addListener(listener)
    // The terminated event is NOT replayed to listeners added after the
    // fact: a query that died between start() and this call would
    // otherwise leak the cache forever. Check activity AFTER registering
    // (the reverse order would race the other way); a double release is
    // harmless — unpersist is idempotent.
    if (!query.isActive) {
      ref.release()
      streams.removeListener(listener)
    }
  }

  /** Start the checkpointed drift monitor over a parquet directory of
    * timestamped documents and return the running query — the restartable
    * S7 shape of the monitor, carried by the same two logs as
    * [[Hourly.startFromParquet]]: the checkpoint's offset/commit log (a
    * committed micro-batch is never re-read; an uncommitted one replays
    * from its recorded offsets) and the file sink's `_spark_metadata`
    * (files of a killed batch stay invisible to readers). A production
    * monitor that dies mid-window must not double-count its KL rows on
    * resume — DriftStreamSpec proves exactly that with a kill/resume plus
    * a planted torn sink file.
    */
  def startFromParquet(spark: org.apache.spark.sql.SparkSession,
                       dir: String, checkpoint: String, out: String,
                       ref: DataFrame, glob: String = "*.parquet",
                       maxFilesPerTrigger: Option[Int] = None,
                       schema: Option[org.apache.spark.sql.types.StructType] =
                         None)
      : org.apache.spark.sql.streaming.StreamingQuery =
    // `schema` (ts/source/text) lets the monitor start AHEAD of its first
    // data file — the inference fallback needs one matching file to exist
    FileStreams.startParquetSink(spark, dir, checkpoint, out, glob,
      maxFilesPerTrigger, schema)(sourceDriftWindows(_, ref))

  /** The drift core — identical plan for a batch frame (the oracle twin)
    * and a `readStream` frame (`docs` needs ts/source/text; `ref` is the
    * static (w, q) frame).
    */
  def sourceDriftWindows(docs: DataFrame, ref: DataFrame,
                         windowLen: String = "1 hour",
                         lateness: String = "1 hour"): DataFrame = {
    val counts = docs
      .withWatermark("ts", lateness)
      .select(col("ts"), col("source"),
        explode(TextAnalysis.words(col("text"))).as("w"))
      .groupBy(window(col("ts"), windowLen), col("source"), col("w"))
      .agg(count(lit(1)).as("csw"))
    counts
      .join(ref, Seq("w"))
      .groupBy(window(window_time(col("window")), windowLen), col("source"))
      .agg(
        sum((col("csw").cast("double") *
            log(col("csw").cast("double") / col("q")))
          .cast("decimal(28,10)")).as("a"),
        sum(col("csw")).as("cs"))
      .select(col("window.start").as("window_start"), col("source"),
        round(col("a").cast("double") / col("cs") -
          log(col("cs").cast("double")), 6).as("kl_vs_ref"))
  }
}
