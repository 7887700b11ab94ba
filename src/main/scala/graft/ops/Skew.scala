package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation building blocks (SURVEY "Optimize for scale": salting,
  * two-stage aggregation). AQE's skew-join splitting covers most cases at
  * runtime; these are the explicit forms for when a key is *known* hot —
  * e.g. one pathological normalized-query class holding half the log
  * corpus, the realistic skew in pgbadger-style workloads.
  *
  * Both forms are proven result-identical to their naive twins in
  * SkewSpec; they only change the shuffle layout:
  *   - two-stage agg: stage 1 shuffles (key, salt) spreading a hot key
  *     over `nSalts` reducers; stage 2 merges the tiny per-salt partials;
  *   - salted broadcast-side replication: the dim side is exploded
  *     `nSalts`× and the fact side picks a deterministic salt, so a hot
  *     join key spreads across `nSalts` tasks.
  */
object Skew {

  /** Deterministic salt from arbitrary distinguishing columns. */
  def saltOf(nSalts: Int, cols: Column*): Column =
    pmod(hash(cols: _*), lit(nSalts))

  /** Two-stage salted sum+count per key — algebraic aggregates re-merge
    * exactly; result equals the direct groupBy.
    */
  def saltedSumCount(df: DataFrame, key: Column, value: Column,
                     salt: Column, nSalts: Int): DataFrame =
    df.groupBy(key.as("k"), pmod(salt, lit(nSalts)).as("s"))
      .agg(sum(value.cast("decimal(18,2)")).as("ps"), count(lit(1)).as("pc"))
      .groupBy(col("k"))
      .agg(sum(col("ps")).cast("double").as("total"),
        sum(col("pc")).as("n"))

  /** Skew-safe equi join against a small dimension: the dim is replicated
    * once per salt (broadcast stays small — nSalts × |dim|), the fact side
    * derives its salt from a row-unique column.
    */
  def saltedBroadcastJoin(fact: DataFrame, dim: DataFrame, key: String,
                          factSaltFrom: Column, nSalts: Int): DataFrame = {
    val saltedDim = dim.withColumn("s",
      explode(sequence(lit(0), lit(nSalts - 1))))
    val saltedFact = fact.withColumn("s", saltOf(nSalts, factSaltFrom))
    saltedFact.join(broadcast(saltedDim), Seq(key, "s")).drop("s")
  }
}
