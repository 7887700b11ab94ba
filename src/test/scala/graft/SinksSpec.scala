package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sources.Sinks

/** S5-S7 sink semantics: memoized write (Luigi `output().exists()` skip)
  * and dynamic-partition idempotent re-run.
  */
class SinksSpec extends SparkSpec {
  import spark.implicits._

  test("writeIfAbsent is a no-op when the target exists (S7)") {
    val dir = Files.createTempDirectory("graft_sink").toString + "/t"
    Sinks.writeIfAbsent(Seq(1, 2, 3).toDF("x"), dir)
    Sinks.writeIfAbsent(Seq(99).toDF("x"), dir) // must be ignored
    val got = spark.read.parquet(dir).as[Int].collect().sorted
    assert(got === Array(1, 2, 3))
  }

  test("materializeModel evaluates the training thunk only when absent") {
    val dir = Files.createTempDirectory("graft_model").toString + "/m"
    var trained = 0
    def train = { trained += 1; Seq((1, "a"), (2, "b")).toDF("k", "v") }
    val first = Sinks.materializeModel(spark, dir)(train)
    assert(first.count() === 2 && trained === 1)
    // second call must short-circuit BEFORE the thunk: eager trainers
    // (k-means collect loops) would otherwise re-train on every score
    val second = Sinks.materializeModel(spark, dir)(train)
    assert(second.count() === 2)
    assert(trained === 1, "existing model must skip training entirely")
  }

  test("modelPath key moves when a data file is rewritten in place") {
    val dir = Files.createTempDirectory("graft_mp").toString + "/corpus"
    Seq((1, "a")).toDF("k", "v").write.parquet(dir)
    val k1 = Sinks.modelPath(spark, dir, "m")
    // rewrite one part file's CONTENT (same file names, same dir entries)
    val part = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).head
    Thread.sleep(5) // ensure the rewrite lands on a later mtime tick
    java.nio.file.Files.write(part.toPath,
      java.nio.file.Files.readAllBytes(part.toPath))
    val k2 = Sinks.modelPath(spark, dir, "m")
    assert(k1 !== k2,
      "an in-place rewrite must produce a different model-cache key")
  }

  test("clustered write produces disjoint per-file key ranges") {
    val dir = Files.createTempDirectory("graft_cluster").toString + "/t"
    val li = graft.ops.Tables.lineitem(spark, "/root/testdata/sf0.001")
    Sinks.writeClusteredBy(li, "l_orderkey", 4, dir)
    // per-file min/max must not overlap across files
    val ranges = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map { f =>
        val r = spark.read.parquet(f.getAbsolutePath)
          .agg(min(col("l_orderkey")), max(col("l_orderkey"))).head()
        (r.getLong(0), r.getLong(1))
      }.sortBy(_._1)
    assert(ranges.length === 4)
    ranges.sliding(2).foreach { case Array((_, hi), (lo, _)) =>
      assert(hi <= lo, s"overlapping ranges: $hi vs $lo")
    }
    assert(spark.read.parquet(dir).count() === li.count())
  }

  test("compaction collapses many small files without changing data") {
    val dir = Files.createTempDirectory("graft_compact").toString + "/t"
    spark.range(1000).repartition(50).write.parquet(dir)
    val before = new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(before >= 40)
    Sinks.compact(spark, dir, 2)
    val after = new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(after <= 2)
    assert(spark.read.parquet(dir).count() === 1000L)
  }

  test("schema-merge read spans evolving parquet versions") {
    val dir = Files.createTempDirectory("graft_evolve").toString + "/t"
    Seq((1L, "a")).toDF("id", "v1").write.parquet(s"$dir/p=1")
    Seq((2L, "b", 9.0)).toDF("id", "v1", "v2_added").write.parquet(s"$dir/p=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet === Set("id", "v1", "v2_added", "p"))
    assert(merged.filter(col("v2_added").isNull).count() === 1)
  }

  test("partitioned overwrite replaces only the re-run day (S5/S7)") {
    val dir = Files.createTempDirectory("graft_sink").toString + "/p"
    val day1 = Seq(("2024-01-01 10:00:00", 1), ("2024-01-02 10:00:00", 2))
      .toDF("ts", "x").withColumn("ts", col("ts").cast("timestamp"))
    Sinks.writePartitionedByDay(day1, "ts", dir)
    // re-run day 2 with corrected data; day 1 must survive untouched
    val rerun = Seq(("2024-01-02 11:00:00", 20))
      .toDF("ts", "x").withColumn("ts", col("ts").cast("timestamp"))
    Sinks.writePartitionedByDay(rerun, "ts", dir)
    val got = spark.read.parquet(dir).select("x").as[Int].collect().sorted
    assert(got === Array(1, 20))
  }
}
