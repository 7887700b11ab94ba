package graft

import org.apache.spark.sql.functions._
import graft.ops.{Skew, Tables}

/** Salted forms must be result-identical to their naive twins. */
class SkewSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("two-stage salted sum/count equals direct groupBy") {
    val ev = Tables.events(spark, dir)
    val direct = ev.groupBy(col("event_type").as("k"))
      .agg(sum(col("value").cast("decimal(18,2)")).cast("double").as("total"),
        count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val salted = Skew.saltedSumCount(ev, col("event_type"), col("value"),
        Skew.saltOf(8, col("event_id")), 8)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(salted === direct)
  }

  test("skew-aware running-sum twins equal the one-window forms") {
    import graft.ops.{TextAnalysis => TA}
    val docs = Tables.documents(spark, dir)
    // uniform sources AND a pathological one: one source holds ~90% of rows
    val skewed = docs.withColumn("source",
      when(pmod(col("doc_id"), lit(10)) < 9, lit("dominant"))
        .otherwise(col("source")))
    for (d <- Seq(docs, skewed)) {
      val mix0 = TA.tokenBudgetMix(d, 5000L).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      val mix1 = TA.tokenBudgetMixSkewAware(d, 5000L).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(mix1 === mix0)
      val pack0 = TA.sequencePacking(d, 512L).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      val pack1 = TA.sequencePackingSkewAware(d, 512L).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(pack1 === pack0)
    }
  }

  test("salted broadcast join equals plain join") {
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val plain = o.join(c, o("o_custkey") === c("c_custkey"))
      .select("o_orderkey", "c_name")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val salted = Skew.saltedBroadcastJoin(
        o.withColumnRenamed("o_custkey", "ck"),
        c.withColumnRenamed("c_custkey", "ck"), "ck",
        col("o_orderkey"), 4)
      .select("o_orderkey", "c_name")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(salted === plain)
  }
}
