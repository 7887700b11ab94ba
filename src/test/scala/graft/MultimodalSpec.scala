package graft

import org.apache.spark.sql.functions._
import graft.sources.Multimodal

/** Multimodal plumbing: schema, payload synthesis, mapPartitions decode
  * shape, determinism of the stubbed feature extraction.
  */
class MultimodalSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("media table has the declared schema and payloads") {
    val m = Multimodal.mediaFromEvents(spark, dir)
    assert(m.schema.fieldNames.toSeq ===
      Seq("media_id", "kind", "payload", "meta"))
    val r = m.filter(col("media_id") === 5L).head()
    val payload = r.getAs[Array[Byte]]("payload")
    // event 5 → repeat factor (5 % 8) + 1 = 6 × 32 hex chars
    assert(payload.length === 6 * 32)
  }

  test("feature extraction is deterministic and batched per partition") {
    val f1 = Multimodal.extractFeatures(Multimodal.mediaFromEvents(spark, dir))
    val f2 = Multimodal.extractFeatures(
      Multimodal.mediaFromEvents(spark, dir).repartition(7))
    val a = f1.orderBy("media_id").collect()
    val b = f2.orderBy("media_id").collect()
    assert(a.length === 1000)
    assert(a.map(_.getAs[scala.collection.Seq[Float]]("feature")).toSeq ===
      b.map(_.getAs[scala.collection.Seq[Float]]("feature")).toSeq)
  }

  test("featureStats rolls up per kind") {
    val stats = Multimodal.featureStats(spark, dir).collect()
    assert(stats.map(_.getString(0)).toSeq === Seq("audio", "image", "video"))
    assert(stats.map(_.getLong(1)).sum === 1000L)
  }
}
