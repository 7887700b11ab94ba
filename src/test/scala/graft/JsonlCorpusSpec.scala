package graft

import java.nio.file.Files
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.functions._
import graft.sources.JsonlCorpus

/** JSONL ingest: clean lines land in the documents-table shape, mangled
  * and schema-deficient lines are accounted for, never silently dropped
  * and never fatal.
  */
class JsonlCorpusSpec extends SparkSpec {

  private def writeCorpus(): String = {
    val dir = Files.createTempDirectory("graft_jsonl")
    val lines = Seq(
      """{"doc_id": 1, "text": "alpha beta", "lang": "en", "source": "s1"}""",
      """{"doc_id": 2, "text": "gamma", "lang": "de", "source": "s2"}""",
      """this is not json at all""",
      """{"doc_id": 3, "lang": "en", "source": "s1"}""", // parsed, no text
      """{"text": "orphan row", "lang": "en", "source": "s1"}""" // no id
    )
    Files.write(dir.resolve("part-000.jsonl"),
      lines.mkString("\n").getBytes(UTF_8))
    dir.toString
  }

  test("good rows parse into the documents shape; bad lines accounted") {
    val raw = JsonlCorpus.read(spark, writeCorpus())
    val good = JsonlCorpus.good(raw)
    assert(good.columns.toSeq === Seq("doc_id", "text", "lang", "source"))
    assert(good.orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((1L, "alpha beta"), (2L, "gamma")))
    val stats = JsonlCorpus.corruptStats(raw).collect().head
    assert((stats.getLong(0), stats.getLong(1), stats.getLong(2)) ===
      ((5L, 1L, 2L)))
  }

  test("good rows feed the operator surface directly") {
    val good = JsonlCorpus.good(JsonlCorpus.read(spark, writeCorpus()))
    val stats = graft.ops.TextAnalysis.tokenStatsBySource(good)
      .collect().map(r => (r.getString(0), r.getLong(2))).toMap
    assert(stats === Map("s1" -> 2L, "s2" -> 1L))
  }
}
