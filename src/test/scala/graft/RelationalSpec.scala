package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.ops.{Relational, Tables}

/** Hand-computed relational expectations + structural join properties. */
class RelationalSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("pricingSummary on a literal lineitem matches hand math") {
    val li = Seq(
      (1.0, 100.0, 0.1, "A", "F", "2000-01-01 00:00:00"),
      (2.0, 200.0, 0.0, "A", "F", "2000-01-02 00:00:00"),
      (3.0, 300.0, 0.5, "N", "O", "2000-01-03 00:00:00"),
      (9.0, 900.0, 0.9, "N", "O", "2001-12-31 00:00:00") // filtered out
    ).toDF("l_quantity", "l_extendedprice", "l_discount",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .withColumn("l_shipdate", col("l_shipdate").cast("timestamp"))
    val got = Relational.pricingSummary(li).collect()
      .map(r => (r.getString(0), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getLong(6)))
    assert(got.toSeq === Seq(
      ("A", 3.0, 300.0, 90.0 + 200.0, 1.5, 2L),
      ("N", 3.0, 300.0, 150.0, 3.0, 1L)))
  }

  test("semi ∪ anti partitions the customer set (disjoint, exhaustive)") {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    val semi = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select("c_custkey").as[Long].collect().toSet
    val anti = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select("c_custkey").as[Long].collect().toSet
    val all = c.select("c_custkey").as[Long].collect().toSet
    assert((semi & anti).isEmpty)
    assert((semi | anti) === all)
  }

  test("churn statuses partition the union of both months") {
    val got = Relational.customerChurn(Tables.orders(spark, dir)).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(got.map(_._1).distinct.length === got.length) // one row per customer
    assert(got.map(_._2).toSet.subsetOf(Set("gained", "lost", "retained")))
  }

  test("left outer summary: order-less customers appear with zeros") {
    val c = Seq((1L, "alice"), (2L, "bob")).toDF("c_custkey", "c_name")
    val o = Seq((10L, 1L, 100.0, Timestamp.valueOf("1997-01-01 00:00:00")))
      .toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
    val got = Relational.customerOrderSummary(c, o).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq === Seq((1L, 1L, 100.0), (2L, 0L, 0.0)))
  }

  test("topSupplier: exact-decimal ties ALL surface; out-of-window rows " +
    "never count") {
    def ts(s: String) = Timestamp.valueOf(s)
    val li = Seq(
      // supplier 1: 60.00 + 40.00 → 100.00 in-window
      (1L, ts("1996-01-10 00:00:00"), 60.0, 0.0),
      (1L, ts("1996-02-10 00:00:00"), 40.0, 0.0),
      // supplier 2: 200.00 × (1 − 0.5) → 100.00 — an exact-decimal tie
      (2L, ts("1996-03-01 00:00:00"), 200.0, 0.5),
      // supplier 3: close but below
      (3L, ts("1996-01-20 00:00:00"), 99.99, 0.0),
      // supplier 4: would win, but ships outside the quarter
      (4L, ts("1995-12-31 00:00:00"), 999.99, 0.0)
    ).toDF("l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
    val sup = Seq((1L, "S1"), (2L, "S2"), (3L, "S3"), (4L, "S4"))
      .toDF("s_suppkey", "s_name")
    val got = Relational.topSupplier(li, sup).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
    assert(got.toSeq === Seq((1L, "S1", 100.0, 2L), (2L, "S2", 100.0, 1L)))
  }
}
