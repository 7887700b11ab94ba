package graft

import org.apache.spark.sql.functions._

/** Dev utility (the round-12/13 un-force receipts): demonstrate, on a
  * real dup-heavy corpus, the corpus-vocabulary-shaped frames that the
  * FORCED-broadcast branches cannot survive while the hint-free
  * defaults complete — the miniature of the 100 TB OOM the verdict
  * flagged. Three families share the pathology: the boilerplate
  * hot-gram frame (round 12), n25's idf table and n77's BPE word
  * segmentation table (round 13) — each is the corpus's distinct
  * vocabulary, which grows with the corpus and never fits a broadcast
  * budget at web scale.
  *
  * The driver result-size cap stands in for executor broadcast memory:
  * a broadcast build collects the frame to the driver first, so capping
  * `spark.driver.maxResultSize` makes "the hot frame outgrew the
  * broadcast budget" an observable failure at local scale instead of a
  * 1000-executor OOM. The corpus is sf0.1 documents word-salted into 8
  * vocabulary-disjoint copies (gram vocabulary ×8 — the ScaleSanity
  * salt move) and THEN duplicated ×2 with shifted ids, so EVERY 5-gram
  * reaches df ≥ 2 and the minDf=2 hot frame is the inflated corpus's
  * entire distinct-gram vocabulary (exactly the shape a dup-heavy web
  * corpus produces: vocabulary grows with the corpus, and repetition
  * makes all of it "hot").
  *
  * Run: sbt "runMain graft.BroadcastGuard [testdataRoot]" (fresh JVM —
  * maxResultSize is read at SparkContext creation; the root defaults
  * to /root/testdata and both the sf0.1 corpus and the sf0.001 model
  * fixture derive from it, so the utility runs on any machine with
  * the standard sf layout under any root). Expected output: the forced
  * branch fails with a result-size/broadcast error, the hint-free
  * branch prints its row count and wall seconds.
  */
object BroadcastGuard {
  def main(args: Array[String]): Unit = {
    val root = args.headOption.getOrElse("/root/testdata")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // the broadcast-budget stand-in: any broadcast build whose
      // collected frame exceeds this fails, exactly like an executor
      // whose broadcast memory the hot frame outgrows
      .config("spark.driver.maxResultSize", "4m")
      // a sane cluster config sizes the auto-broadcast threshold UNDER
      // the budget (here 512k vs the 4m cap — headroom because size
      // stats are compressed-size estimates of serialized results).
      // The point of the demo: the hint-free branch RESPECTS this
      // threshold and shuffles; a forced broadcast() hint overrides it
      // and dies on the budget.
      .config("spark.sql.autoBroadcastJoinThreshold", "512k")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "512k")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = spark.read.parquet(s"$root/sf0.1/documents.parquet")
      .select(col("doc_id"), col("text"))
    val wide = (0 until 8).map { i =>
      base.select((col("doc_id") + lit(i.toLong * 100000L)).as("doc_id"),
        regexp_replace(col("text"), "(\\S+)", s"c${i}_$$1").as("text"))
    }.reduce(_ unionAll _)
    val docs = wide.unionAll(
      wide.select((col("doc_id") + 1000000L).as("doc_id"), col("text")))

    def attempt(label: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      try {
        val n = df.queryExecution.toRdd.count()
        println(f"GUARD ok    $label rows=$n wall=${(System.nanoTime() - t0) / 1e9}%.2fs")
      } catch {
        case e: Throwable =>
          val root = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
            .toSeq.last
          // null/empty messages happen (bare IOException, some OOM
          // wrappings) — the failure reporter must never itself throw,
          // or the guard dies before the hint-free branch it exists
          // to demonstrate
          val msg = Option(root.getMessage)
            .flatMap(_.linesIterator.find(_.nonEmpty))
            .getOrElse(root.toString)
          println(s"GUARD FAIL  $label ${root.getClass.getSimpleName}: $msg")
      }
    }
    attempt("coverage forced-broadcast") {
      ops.TextAnalysis.boilerplateCoverage(docs, 5, 2, broadcast)
    }
    attempt("coverage hint-free      ") {
      ops.TextAnalysis.boilerplateCoverage(docs, 5, 2)
    }
    // The vocab-family demos (n25 idf, n77 BPE segmentation) need a
    // corpus whose DISTINCT-WORD vocabulary grows with the corpus —
    // the defining property of a web corpus (typo/entity/url long
    // tail) and exactly what the synthetic fixture lacks (31 distinct
    // words at any scale: the salted gram space explodes, the word
    // space doesn't). Suffix every word with a per-document bucket:
    // vocabulary = 31 × 8 salts × 9973 buckets ≈ 2.5M distinct words,
    // the miniature of the 10⁸-row web vocabulary.
    val vocabDocs = docs.withColumn("text",
      expr("array_join(transform(split(text, ' '), " +
        "w -> concat(w, '_', doc_id % 9973)), ' ')"))
    attempt("tfidf    forced-broadcast") {
      ops.TextAnalysis.tfidfTopTerms(vocabDocs, 5, broadcast)
    }
    attempt("tfidf    hint-free      ") {
      ops.TextAnalysis.tfidfTopTerms(vocabDocs, 5)
    }
    // n77: the (word, n_sub) segmentation table is the distinct-word
    // vocabulary of the SCORED corpus. The model itself is tiny and
    // bounded (trained here on the un-salted base — its contents are
    // irrelevant to the exchange-shape demo); what must never be
    // forced is the vocabulary join.
    val model = ops.TextAnalysis.bpeMerges(
      spark.read.parquet(s"$root/sf0.001/documents.parquet")
        .select(col("doc_id"), col("text")), 10)
    attempt("bpe      forced-broadcast") {
      ops.TextAnalysis.bpeTokenize(vocabDocs, model, broadcast)
    }
    attempt("bpe      hint-free      ") {
      ops.TextAnalysis.bpeTokenize(vocabDocs, model)
    }
    spark.stop()
  }
}
