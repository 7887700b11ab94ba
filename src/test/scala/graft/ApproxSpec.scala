package graft

import org.apache.spark.sql.functions._
import graft.ops.Tables

/** The approximate scale-path operators must be *near* their exact twins,
  * not just run: HLL++ distinct counts and approx percentiles within
  * tolerance on real data.
  */
class ApproxSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("approx_count_distinct within 5% of exact") {
    val ev = Tables.events(spark, dir)
    val r = ev.agg(countDistinct(col("user_id")).as("exact"),
      approx_count_distinct(col("user_id")).as("approx")).head()
    val (exact, approx) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
    assert(math.abs(approx - exact) / exact <= 0.05,
      s"exact=$exact approx=$approx")
  }

  test("percentile_approx within 2% of exact at accuracy 10000") {
    val ev = Tables.events(spark, dir)
    val r = ev.agg(
      expr("percentile(value, 0.9)").as("exact"),
      expr("percentile_approx(value, 0.9, 10000)").as("approx")).head()
    val (exact, approx) = (r.getDouble(0), r.getDouble(1))
    assert(math.abs(approx - exact) / math.max(exact, 1e-9) <= 0.02,
      s"exact=$exact approx=$approx")
  }
}
