package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.sources.MediaStage

/** The staging protocol itself: build-at-most-once per key,
  * `_SUCCESS`-gated reads (a torn dest rebuilds), and the staleness
  * axes — the fixture tag is code-owned, the data fingerprint must
  * invalidate a stage when the source sf dir's events table changes
  * under the same path.
  */
class MediaStageSpec extends SparkSpec {

  // a private scratch sf dir (the fingerprint reads its events.parquet
  // listing) and a private stage root via the session conf
  private def freshDirs(tag: String): (String, String) = {
    val sf = Files.createTempDirectory(s"graft_stage_sf_$tag").toString
    val root = Files.createTempDirectory(s"graft_stage_root_$tag").toString
    spark.range(4).selectExpr("id AS event_id")
      .write.parquet(s"$sf/events.parquet")
    (sf, root)
  }

  private def withRoot[T](root: String)(body: => T): T = {
    spark.conf.set(MediaStage.StageDirConf, root)
    try body finally spark.conf.unset(MediaStage.StageDirConf)
  }

  test("staged(): the build runs exactly once per key — later calls " +
    "(and concurrent callers) read the publish; rows round-trip") {
    val (sf, root) = freshDirs("once")
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    def build = {
      builds.incrementAndGet()
      spark.range(10).selectExpr("id", "id * 2 AS v")
    }
    withRoot(root) {
      val a = MediaStage.staged(spark, sf, "t")(build)
      assert(a.orderBy(col("id")).collect().map(_.getLong(1)).toSeq ===
        (0L until 10L).map(_ * 2))
      // concurrent second/third readers: at most one build ever
      val pool = java.util.concurrent.Executors.newFixedThreadPool(3)
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutor(pool)
      val reads = (1 to 3).map(_ => scala.concurrent.Future {
        MediaStage.staged(spark, sf, "t")(build).count()
      })
      reads.foreach(f => assert(scala.concurrent.Await.result(f,
        scala.concurrent.duration.Duration.Inf) === 10L))
      pool.shutdown()
      assert(builds.get() === 1, "the fixture must synthesize once")
    }
  }

  test("a _SUCCESS-less dest (torn publish from some older scheme) is " +
    "removed and rebuilt, never read") {
    val (sf, root) = freshDirs("torn")
    withRoot(root) {
      val builds = new java.util.concurrent.atomic.AtomicInteger(0)
      def build = { builds.incrementAndGet(); spark.range(5).toDF("id") }
      val first = MediaStage.staged(spark, sf, "t")(build)
      assert(first.count() === 5L && builds.get() === 1)
      // find the published dest and tear it: drop _SUCCESS (close the
      // directory streams — the MediaStage.deleteRecursively fd lesson)
      def onlyChild(p: java.nio.file.Path): java.nio.file.Path = {
        val s = Files.list(p)
        try s.iterator().next() finally s.close()
      }
      val dest = onlyChild(onlyChild(Paths.get(root)))
      Files.delete(dest.resolve("_SUCCESS"))
      assert(MediaStage.staged(spark, sf, "t")(build).count() === 5L)
      assert(builds.get() === 2, "a torn dest must rebuild")
      assert(Files.exists(dest.resolve("_SUCCESS")))
    }
  }

  test("regenerating the sf dir's events table IN PLACE invalidates " +
    "the stage key: the stale publish is never read again") {
    val (sf, root) = freshDirs("stale")
    withRoot(root) {
      var payload = 1L
      def build = spark.range(3).select(lit(payload).as("p"))
      assert(MediaStage.staged(spark, sf, "t")(build)
        .agg(max(col("p"))).head().getLong(0) === 1L)
      // regenerate events.parquet under the SAME path with different
      // content (new files, new sizes/mtimes)
      val ev = Paths.get(sf, "events.parquet")
      val walk = Files.walk(ev)
      try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => Files.deleteIfExists(p))
      finally walk.close()
      spark.range(123).selectExpr("id AS event_id")
        .write.parquet(ev.toString)
      payload = 2L
      assert(MediaStage.staged(spark, sf, "t")(build)
        .agg(max(col("p"))).head().getLong(0) === 2L,
        "a regenerated source under the same path must re-stage")
    }
  }
}
