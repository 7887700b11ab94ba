package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Dedup
import graft.sources.Multimodal

/** The measured media collapse autos (m14 family): both fronts of the
  * member-level pair relation bit-equal per modality and dup regime,
  * branch choice pinned per regime, the lazy FromInflation halves
  * constructing with ZERO Spark jobs, and the cardInflation seam
  * feeding them from the m13 card's measured number.
  */
class MediaAutoSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  // a synthetic LOW-duplication signature frame: distinct far-apart
  // signatures plus two planted near pairs — the plain-front regime
  private def distinctSigs = {
    import spark.implicits._
    val base = Seq(
      0x0000000000000000L, 0xFFFFFFFFFFFFFFFFL, 0x00000000FFFFFFFFL,
      0xFFFFFFFF00000000L, 0x0F0F0F0F0F0F0F0FL, 0xF0F0F0F0F0F0F0F0L,
      0x3333333333333333L, 0xCCCCCCCCCCCCCCCCL)
    (base.zipWithIndex.map { case (h, i) => (i.toLong, h) } :+
      ((100L, base(0) ^ 0x3L)) :+ // hamming 2 from id 0
      ((101L, base(4) ^ 0x11L))) // hamming 2 from id 4
      .toDF("media_id", "sig")
  }

  test("mediaSignaturePairs: expanded-collapsed ≡ plain, bit for bit, " +
    "on the dup-heavy image AND audio corpora and on a low-duplication " +
    "synthetic frame") {
    val ph = Multimodal.imagePhash(Multimodal.mediaWithEditedImages(
      spark, dir))
    assert(rows(Multimodal.mediaSignaturePairsExpanded(ph, "phash")) ===
      rows(Multimodal.mediaSignaturePairsPlain(ph, "phash")))
    val ah = Multimodal.audioHash(Multimodal.audioWithEditedClips(
      spark, dir))
    assert(rows(Multimodal.mediaSignaturePairsExpanded(ah, "ahash")) ===
      rows(Multimodal.mediaSignaturePairsPlain(ah, "ahash")))
    val d = distinctSigs
    val plain = rows(Multimodal.mediaSignaturePairsPlain(d, "sig"))
    assert(rows(Multimodal.mediaSignaturePairsExpanded(d, "sig")) === plain)
    assert(plain.nonEmpty, "the planted near pairs must appear")
  }

  test("auto ≡ both fronts; branch choice pinned per regime (the " +
    "collapse's collect_list groups appear in the expanded plan only); " +
    "the dup-heavy corpus measures past the switch, the distinct frame " +
    "below it") {
    val ph = Multimodal.imagePhash(Multimodal.mediaWithEditedImages(
      spark, dir))
    // the corpus regime: identical-hash groups everywhere (the periodic
    // formula) — the probe must land ≥ 2 and pick the collapse
    val inflImg = Dedup.groupInflation(
      ph.filter(col("phash").isNotNull), col("phash"))
    assert(inflImg >= 2.0, s"expected dup-heavy image corpus, got $inflImg")
    val auto = Multimodal.mediaNearDupPairsAuto(ph, "phash")
    assert(auto.queryExecution.optimizedPlan.toString.contains(
      "collect_list"), "auto must pick the collapsed front here")
    assert(rows(auto) ===
      rows(Multimodal.mediaSignaturePairsPlain(ph, "phash")))
    // the distinct regime: inflation 1.0 — plain front, no collapse
    val d = distinctSigs
    assert(Dedup.groupInflation(d, col("sig")) === 1.0)
    val autoD = Multimodal.mediaNearDupPairsAuto(d, "sig")
    assert(!autoD.queryExecution.optimizedPlan.toString.contains(
      "collect_list"), "auto must pick the plain front here")
    assert(rows(autoD) === rows(Multimodal.mediaSignaturePairsPlain(
      d, "sig")))
  }

  test("the lazy FromInflation halves (signature AND video clip forms) " +
    "construct and plan with ZERO Spark jobs; cardInflation feeds them " +
    "the m13 card's measured number and the answers equal the fronts") {
    val ph = graft.ops.Checkpoints.cut(Multimodal.imagePhash(
      Multimodal.mediaWithEditedImages(spark, dir)))
    val fh = graft.ops.Checkpoints.cut(Multimodal.videoFrameHashes(
      Multimodal.mediaWithEditedVideos(spark, dir)))
    // the EAGER reads, paid BEFORE the listener: the card is the m13
    // artifact a pipeline already has; cardInflation collects one row
    val card = Multimodal.mediaDedupCard(
      Multimodal.mediaWithEditedImages(spark, dir)
        .filter(col("kind") === "image")
        .unionByName(Multimodal.mediaWithEditedVideos(spark, dir)))
      .cache()
    val inflImg = Multimodal.cardInflation(card, "image")
    val inflVid = Multimodal.cardInflation(card, "video")
    assert(inflImg >= 2.0 && inflVid >= 2.0,
      s"planted corpora must measure dup-heavy, got $inflImg / $inflVid")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    val (lazySig, lazyVid) = try {
      def gated[T](label: String)(build: => T): T = {
        val before = jobs.get()
        val r = build
        Thread.sleep(1000) // async listener delivery; zero expected, so
                           // the sleep can only catch a regression
        assert(jobs.get() === before,
          s"building the lazy $label form ran Spark jobs")
        r
      }
      val s = gated("media signature pairs") {
        val df = Multimodal.mediaNearDupPairsFromInflation(
          ph, "phash", inflImg)
        df.queryExecution.executedPlan; df
      }
      val v = gated("video clip pairs") {
        val df = Multimodal.videoClipPairsFromInflation(fh, inflVid)
        df.queryExecution.executedPlan; df
      }
      (s, v)
    } finally spark.sparkContext.removeSparkListener(listener)
    // the card-fed choice cannot change any answer
    assert(rows(lazySig) ===
      rows(Multimodal.mediaSignaturePairsPlain(ph, "phash")))
    assert(rows(lazyVid) === rows(Multimodal.videoClipPairsPlain(fh)))
    card.unpersist()
  }

  test("videoClipPairs: expanded ≡ plain on a gradient fixture with " +
    "RE-POSTED clips (identical frame sequences), a 2-bit near twin, a " +
    "partial overlap, and a far clip — within-group self stats count " +
    "ordered frame combinations exactly as the plain front does") {
    import org.apache.spark.sql.Row
    def clip(patterns: Long*): Array[Byte] =
      Multimodal.packGfv(patterns.map(Multimodal.gradientPng))
    val P = Seq(0x0000000000000000L, 0xFFFFFFFFFFFFFFFFL,
      0x00000000FFFFFFFFL, 0xFFFFFFFF00000000L, 0x0F0F0F0F0F0F0F0FL)
    val media = spark.createDataFrame(java.util.Arrays.asList(
      Row(1L, "video", clip(P(0), P(1)), Row(9, 8, null)),
      Row(2L, "video", clip(P(0), P(1)), Row(9, 8, null)), // re-post of 1
      Row(3L, "video", clip(P(0), P(1)), Row(9, 8, null)), // re-post of 1
      Row(4L, "video", clip(P(0) ^ 0x3L, P(2)), Row(9, 8, null)), // 2-bit
      Row(5L, "video", clip(P(3), P(1)), Row(9, 8, null)), // shares P(1)
      Row(6L, "video", clip(P(4)), Row(9, 8, null))), // far, 1 frame
      Multimodal.mediaSchema)
    val fh = Multimodal.videoFrameHashes(media)
    val plain = rows(Multimodal.videoClipPairsPlain(fh))
    assert(rows(Multimodal.videoClipPairsExpanded(fh)) === plain)
    // sanity on the fixture itself: the re-post group pairs within
    // itself (2 frame-combos each at hamming 0: (0,0) and (1,1) — the
    // ordered-combination count the self join must reproduce), and the
    // far clip pairs with nothing
    val byPair = Multimodal.videoClipPairsPlain(fh).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getInt(3))).toMap
    assert(byPair((1L, 2L)) === ((2L, 0)))
    assert(byPair((1L, 3L)) === ((2L, 0)))
    assert(byPair((2L, 3L)) === ((2L, 0)))
    assert(byPair((1L, 4L))._2 === 2) // the near twin's min hamming
    assert(!byPair.keys.exists(p => p._1 == 6L || p._2 == 6L))
    // the auto on this dup-heavy fixture picks the collapse and agrees
    val auto = Multimodal.videoClipPairsAuto(fh)
    assert(auto.queryExecution.optimizedPlan.toString.contains(
      "collect_list"))
    assert(rows(auto) === plain)
  }

  test("videoClipPairs: expanded ≡ plain on the real sf0.001 planted " +
    "video corpus") {
    val fh = graft.ops.Checkpoints.cut(Multimodal.videoFrameHashes(
      Multimodal.mediaWithEditedVideos(spark, dir)))
    assert(rows(Multimodal.videoClipPairsExpanded(fh)) ===
      rows(Multimodal.videoClipPairsPlain(fh)))
  }
}
