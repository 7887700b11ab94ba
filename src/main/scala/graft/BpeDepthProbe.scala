package graft

import org.apache.spark.sql.functions._

/** Dev utility (the round-13 depth receipt): measure where the
  * nested-HOF BPE segmenter chain ([[ops.TextAnalysis.bpeSegmentHof]] —
  * one `aggregate` lambda per merge rule, expression depth LINEAR in
  * nMerges) stops being plannable, against the codegen'd
  * [[functions.BpeSegment]] production expression timed on the same
  * rule counts. The rules are synthetic chain merges (aa, aaa, ...
  * never firing past the word length) — the cost probed here is the
  * expression TREE, not the merge work.
  *
  * Run: sbt "runMain graft.BpeDepthProbe". Output: one line per
  * (form, nMerges) with analysis+execution wall seconds or the failure
  * class — the BENCH_NOTES receipt for why a 32k-merge production
  * model requires the expression form.
  */
object BpeDepthProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // a synthetic trained-model shape: rule k merges ("a"*(k+1), "a")
    // into ever-longer runs; on short words most rules are no-ops,
    // exactly like a big real model scoring a short word
    def rules(n: Int): Seq[(String, String)] =
      (1 to n).map(k => ("a" * k, "a"))
    val vocab = (1 to 64).map(i => (i.toLong, "a" * (i % 12 + 1))).toDF("id", "word")

    def attempt(label: String)(seg: => org.apache.spark.sql.Column): Unit = {
      val t0 = System.nanoTime()
      try {
        val n = vocab.select(size(seg).as("n")).agg(sum(col("n"))).head().getLong(0)
        println(f"DEPTH ok    $label sum=$n wall=${(System.nanoTime() - t0) / 1e9}%.2fs")
      } catch {
        case e: Throwable =>
          val root = Iterator.iterate(e)(_.getCause).takeWhile(_ != null).toSeq.last
          val msg = Option(root.getMessage)
            .flatMap(_.linesIterator.find(_.nonEmpty)).getOrElse(root.toString)
          println(s"DEPTH FAIL  $label ${root.getClass.getSimpleName}: ${msg.take(140)}")
      }
    }

    for (n <- Seq(16, 64, 128, 256, 512, 1024, 4096, 32768)) {
      attempt(f"expr $n%5d") {
        functions.BpeSegment.bpeSegment(col("word"), rules(n))
      }
      if (n <= 1024) attempt(f"hof  $n%5d") {
        ops.TextAnalysis.bpeSegmentHof(col("word"), rules(n))
      }
      else println(s"DEPTH skip  hof  $n (the <=1024 points already " +
        "bound the curve; larger chains take minutes to analyze or die)")
    }
    spark.stop()
  }
}
