package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.ops.Tables

/** Bucketing = the co-located-join story (SURVEY §2.3 / "Optimize for
  * scale"): both fact tables written bucketed on the join key join with
  * NO shuffle exchange — at 100 TB this is the difference between moving
  * terabytes per join and moving nothing.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed fact-fact join runs without a shuffle exchange") {
    val tmp = Files.createTempDirectory("graft_bucket").toString
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
    val o = Tables.orders(spark, "/root/testdata/sf0.001")

    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$tmp/li").mode("overwrite").saveAsTable("li_bucketed")
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$tmp/o").mode("overwrite").saveAsTable("o_bucketed")
    try {
      val joined = spark.table("li_bucketed")
        .hint("merge") // force SMJ so broadcast can't mask the property
        .join(spark.table("o_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        "bucketed join must not shuffle; plan:\n" + plan)
      assert(plan.contains("SortMergeJoin"))
      // and it is still correct
      val expected = li.join(o, col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() === expected)
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }
}
