package graft

import org.apache.spark.sql.functions._

import graft.sources.Sinks

/** The co-located join story: two fact tables bucketed on the join key
  * at write time must join and aggregate with ZERO shuffle exchange —
  * the 100 TB shape where paying the shuffle once at write replaces
  * paying it on every query. Plan-level proofs, same discipline as
  * PlanSpec.
  */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  private def withSmj[T](body: => T): T = {
    // force the sort-merge path: a broadcast join would hide the absent
    // exchange this suite exists to prove
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  override def afterAll(): Unit = {
    Seq("bj_orders", "bj_items", "bj_items_16").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS $t"))
    super.afterAll()
  }

  test("equi-join of two tables bucketed on the key: zero exchange; " +
    "same-key aggregate: zero exchange") {
    val orders = spark.range(0, 10000)
      .select(col("id").as("o_key"), (col("id") % 97).as("o_val"))
    val items = spark.range(0, 30000)
      .select((col("id") % 10000).as("i_key"), (col("id") % 13).as("i_qty"))
    Sinks.writeBucketedBy(orders, "o_key", 8, "bj_orders")
    Sinks.writeBucketedBy(items.withColumnRenamed("i_key", "o_key"),
      "o_key", 8, "bj_items")
    withSmj {
      val joined = spark.table("bj_orders")
        .join(spark.table("bj_items"), "o_key")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"),
        "bucketed-on-key tables must join without any shuffle:\n" + plan)
      // a within-partition Sort remains: since Spark 3.0 the bucketed
      // scan deliberately does not report write-time ordering (the
      // spark.sql.legacy.bucketedTableScan.outputOrdering trade — single-
      // file reads vs a cheap local sort). The EXPENSIVE property is the
      // absent Exchange; the local sort moves no data between executors.
      assert(plan.contains("Bucketed: true"), plan)
      assert(joined.count() === 30000L) // every item hits exactly one order
      // aggregation on the bucketing key: partial+final collapse into one
      // exchange-free stage
      val agg = spark.table("bj_items")
        .groupBy(col("o_key")).agg(sum(col("i_qty")).as("q"))
      val aplan = agg.queryExecution.executedPlan.toString
      assert(!aplan.contains("Exchange"),
        "aggregate on the bucketing key must not shuffle:\n" + aplan)
      assert(agg.count() === 10000L)
    }
  }

  test("mismatched bucket counts still join correctly (one side " +
    "re-shuffles or coalesces buckets) — bucketing is a plan hint, " +
    "never a correctness dependency") {
    val items16 = spark.range(0, 1000)
      .select((col("id") % 100).as("o_key"), col("id").as("v"))
    Sinks.writeBucketedBy(items16, "o_key", 16, "bj_items_16")
    withSmj {
      val joined = spark.table("bj_orders")
        .join(spark.table("bj_items_16"), "o_key")
      assert(joined.count() === 1000L)
    }
  }
}
