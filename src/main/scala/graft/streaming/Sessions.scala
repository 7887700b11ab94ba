package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming gap-based sessionization — the arbitrary-stateful-op surface
  * (`flatMapGroupsWithState` + event-time timeout). Batch twin:
  * [[graft.ops.Reports.sessionize]] (query `b15`).
  *
  * State per user is the list of merged sessions whose gap horizon
  * (last event + gap) the watermark has not yet passed. A session is
  * emitted ONLY once the watermark passes its horizon — never eagerly on
  * an in-batch gap — because a late event still inside the watermark may
  * predate an earlier gap-separated session and must merge with it (the
  * same reason Spark's built-in `session_window` holds sessions in state
  * until the watermark closes them). Within that watermark contract the
  * emitted grouping is identical to the batch twin over the same data;
  * events later than the watermark are dropped by the engine before they
  * reach this operator, exactly as the batch twin never sees rows outside
  * its input. State is bounded by (active users × sessions inside the
  * watermark window), not history.
  */
object Sessions {

  case class Ev(ts: Timestamp, user_id: Long, value: Double)
  // `cents` holds the value sum as exact decimal(18,2) cents — the batch
  // twin sums through `decSum` (cast to decimal(18,2), exact, order-
  // independent), and a double accumulator here would drift a cent on
  // multi-event sessions whose partial sums fold across micro-batches
  // (caught by the restart spec's full-equality check on real values).
  // STATE-SCHEMA MIGRATION NOTE: this replaced `sum: Double` — the state
  // store rejects the changed value schema on restart
  // (STATE_STORE_VALUE_SCHEMA_NOT_COMPATIBLE), so a checkpoint written by
  // the double-summing version must be drained (flush all held sessions,
  // stop cleanly) before upgrading, or discarded and reprocessed.
  case class OpenSession(startUs: Long, lastUs: Long, n: Long, cents: Long)
  case class Held(sessions: Seq[OpenSession])
  case class ClosedSession(user_id: Long, session_start: Timestamp,
                           n_events: Long, duration_sec: Long, sum_value: Double)

  def sessionizeStream(events: Dataset[Ev], gapMinutes: Int,
                       watermark: String = "1 hour"): Dataset[ClosedSession] = {
    val gapUs = gapMinutes * 60L * 1000000L
    val gapMs = gapMinutes * 60L * 1000L
    implicit val outEnc = Encoders.product[ClosedSession]
    implicit val stateEnc = Encoders.product[Held]
    implicit val keyEnc = Encoders.scalaLong

    // microsecond-exact event time (getTime truncates to ms; getNanos
    // carries the fraction) — matches the batch twin's unix_micros math
    def micros(t: Timestamp): Long =
      t.getTime / 1000 * 1000000L + t.getNanos / 1000

    // the same rounding Spark's double→decimal(18,2) cast applies: the
    // double's shortest decimal form (BigDecimal.valueOf), HALF_UP at
    // scale 2 — so each event contributes identical cents in both engines
    def cents(v: Double): Long =
      java.math.BigDecimal.valueOf(v)
        .setScale(2, java.math.RoundingMode.HALF_UP)
        .movePointRight(2).longValueExact()

    def close(userId: Long, s: OpenSession): ClosedSession =
      ClosedSession(userId, new Timestamp(s.startUs / 1000),
        s.n, (s.lastUs - s.startUs) / 1000000L, s.cents / 100.0)

    def fn(userId: Long, batch: Iterator[Ev],
           state: GroupState[Held]): Iterator[ClosedSession] = {
      // Merge the held sessions (intervals) and the batch's events
      // (points) exactly as the batch twin would see them: sort by start,
      // fold adjacent items whose gap is within gapUs. Late events within
      // the watermark therefore extend sessions BACKWARD, merge with each
      // other, and bridge across previously gap-separated sessions.
      val items = (state.getOption.map(_.sessions).getOrElse(Seq.empty) ++
          batch.map { e =>
            val us = micros(e.ts); OpenSession(us, us, 1, cents(e.value))
          })
        .sortBy(s => (s.startUs, s.lastUs))
      val merged = items.foldLeft(List.empty[OpenSession]) {
        case (head :: tail, it) if it.startUs - head.lastUs <= gapUs =>
          OpenSession(math.min(head.startUs, it.startUs),
            math.max(head.lastUs, it.lastUs),
            head.n + it.n, head.cents + it.cents) :: tail
        case (acc, it) => it :: acc
      }.reverse // chronological

      // A session is final only when the watermark strictly passes its
      // horizon (strict: an event AT the watermark is still admitted by
      // the engine and may merge).
      val wmMs = state.getCurrentWatermarkMs()
      val (closable, held) =
        merged.partition(s => s.lastUs / 1000 + gapMs < wmMs)
      if (held.isEmpty) state.remove()
      else {
        state.update(Held(held))
        // fire when the watermark passes the earliest held horizon; the
        // max() guards the engine's timeout > watermark requirement on
        // the horizon == watermark boundary
        state.setTimeoutTimestamp(
          math.max(held.map(_.lastUs / 1000 + gapMs).min, wmMs + 1))
      }
      closable.map(close(userId, _)).iterator
    }

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(fn)
  }

  /** Start the checkpointed sessionization over a parquet directory of
    * (ts, user_id, value) rows and return the running query — the
    * restartable S7 shape of the arbitrary-stateful operator. On top of
    * the two logs every file-sink stream carries (checkpoint offset log,
    * sink `_spark_metadata`), restart here also recovers the STATE STORE:
    * sessions held open across the kill must survive into the resumed run
    * and close exactly once — SessionsStreamSpec proves it with a
    * kill/resume whose final output is compared against the batch twin.
    */
  def startFromParquet(spark: org.apache.spark.sql.SparkSession,
                       dir: String, checkpoint: String, out: String,
                       gapMinutes: Int = 30, watermark: String = "1 hour",
                       glob: String = "*.parquet",
                       maxFilesPerTrigger: Option[Int] = None,
                       schema: Option[org.apache.spark.sql.types.StructType] =
                         None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    import org.apache.spark.sql.functions.col
    implicit val evEnc = Encoders.product[Ev]
    // `schema` (at least ts/user_id/value — Encoders.product[Ev].schema
    // fits) lets the pipeline start AHEAD of its first data file; the
    // inference fallback needs one matching file to exist. A checkpoint
    // written by the pre-cents build of [[OpenSession]] fails restart with
    // STATE_STORE_VALUE_SCHEMA_NOT_COMPATIBLE — rethrown here (or mapped
    // via [[stateSchemaMigrationHint]] when it surfaces asynchronously)
    // with the drain-or-discard instructions attached.
    rethrowWithMigrationHint(
    FileStreams.startParquetSink(spark, dir, checkpoint, out, glob,
        maxFilesPerTrigger, schema) { df =>
      sessionizeStream(
        df.select(col("ts"), col("user_id"), col("value")).as[Ev],
        gapMinutes, watermark).toDF()
    })
  }

  /** Actionable message for the one known restart-breaking upgrade: the
    * [[OpenSession]] state value schema changed (`sum: Double` →
    * `cents: Long`), and the state store rejects a checkpoint written by
    * the old build rather than silently misreading it.
    */
  val StateSchemaMigrationMsg: String =
    "This checkpoint was written by a pre-cents build of graft sessionization " +
      "(OpenSession held `sum: Double`; it now holds `cents: Long`), and the " +
      "state store refuses the changed value schema. Either DRAIN the old " +
      "build first (run it until the watermark closes every held session, " +
      "stop cleanly, then start this build on a FRESH checkpoint over the " +
      "remaining input), or DISCARD the checkpoint and sink and reprocess " +
      "the source from scratch — the pipeline is deterministic, so a full " +
      "reprocess converges to the same sessions."

  private def isStateSchemaError(e: Throwable): Boolean =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(10).exists(t =>
      String.valueOf(t.getMessage).contains("STATE_STORE_VALUE_SCHEMA") ||
        t.getClass.getName.contains("StateSchemaNotCompatible"))

  /** The drain-or-discard instructions, iff `e` (or a cause) is the state
    * schema incompatibility — for callers that hit the error ASYNCHRONOUSLY
    * as a StreamingQueryException from `awaitTermination`/
    * `processAllAvailable`, where [[startFromParquet]]'s synchronous wrap
    * cannot intercept it.
    */
  def stateSchemaMigrationHint(e: Throwable): Option[String] =
    if (isStateSchemaError(e)) Some(StateSchemaMigrationMsg) else None

  private def rethrowWithMigrationHint[T](body: => T): T =
    try body catch {
      case e: Throwable if isStateSchemaError(e) =>
        throw new IllegalStateException(StateSchemaMigrationMsg, e)
    }
}
