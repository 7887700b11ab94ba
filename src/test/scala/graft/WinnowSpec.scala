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

  test("fingerprints hash code points, not UTF-16 units") {
    // "a😀b" is 3 code points but 4 UTF-16 units; with k=2, w=1 the
    // fingerprint set must be exactly the two hand-computed code-point
    // bigram hashes (the DuckDB oracle hashes ord() over code points —
    // unit-based hashing would emit 3 k-grams with different values)
    import org.apache.spark.sql.graftbridge.Bridge
    val c = Bridge.column(graft.functions.WinnowFingerprints(
      Bridge.expression(col("text")), 2, 1))
    val got = Seq("a😀b").toDF("text").select(c.as("f"))
      .head().getAs[scala.collection.Seq[Long]]("f").toSet
    val B = 1000003L
    assert(got === Set(97L * B + 128512L, 128512L * B + 98L))
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
