package graft

import org.apache.spark.sql.functions._
import graft.functions.Winnow

/** Winnowing fingerprints: the shared-substring guarantee and offset
  * invariance of the rolling hash.
  */
class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private def fps(texts: String*): Seq[Set[Long]] =
    texts.toDF("text")
      .select(Winnow.fingerprints(col("text")).as("f"))
      .collect().map(_.getAs[scala.collection.Seq[Long]]("f").toSet).toSeq

  test("identical texts → identical fingerprint sets") {
    val Seq(a, b) = fps("the quick brown fox jumps over it",
      "the quick brown fox jumps over it")
    assert(a === b && a.nonEmpty)
  }

  test("shared long substring at different offsets → shared fingerprint") {
    // shared 20-char substring ≥ w + k − 1 = 11 chars
    val shared = "abcdefghijklmnopqrst"
    val Seq(a, b) = fps(s"XXXX$shared", s"YYYYYYYYYYYY${shared}ZZ")
    assert(a.intersect(b).nonEmpty)
  }

  test("disjoint texts → disjoint fingerprints; short text → empty") {
    val Seq(a, b, c) = fps("aaaaaaaaaaaaaaaaaaaaaa", "bbbbbbbbbbbbbbbbbbbbbb", "tiny")
    assert(a.intersect(b).isEmpty)
    assert(c.isEmpty)
  }

  test("matches query finds planted near-dups in documents") {
    val docs = Seq(
      (1L, "some long enough piece of text that we will duplicate around"),
      (2L, "prefix junk some long enough piece of text that we will duplicate around"),
      (3L, "completely unrelated content with zero overlap whatsoever here"))
      .toDF("doc_id", "text")
    val m = graft.ops.TextAnalysis.winnowMatches(docs).collect()
    assert(m.nonEmpty)
    assert(m.forall(r => r.getAs[Long]("min_doc") == 1L &&
      r.getAs[Long]("max_doc") == 2L))
  }
}
