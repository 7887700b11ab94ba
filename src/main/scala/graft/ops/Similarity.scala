package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** Similarity search over the `embeddings` table (north star): brute-force
  * cosine top-k as the correctness baseline, an LSH-bucketed variant as the
  * scale path, plus cosine near-dup pairs.
  *
  * Vector math runs through [[graft.functions.DotProduct]] — a native
  * codegen'd Catalyst expression (the higher-order `aggregate`/`zip_with`
  * composition is interpreted and was ~100× slower per row). Norms are
  * computed once per vector *before* any join, so each candidate pair costs
  * exactly one dot product; cosine = dot/(‖a‖·‖b‖) in double, bit-identical
  * to DuckDB's list_dot_product-based oracle.
  *
  * Scale design: the probe set is small and broadcast, so brute force is a
  * map-side cross product with per-probe top-k (window over probe id) — the
  * corpus never shuffles. The LSH variant additionally equi-joins on a
  * sign-bucket key, cutting candidates ~2^bits-fold; at 100 TB the bucket
  * key becomes the partition key so each probe touches one partition (IVF
  * with hyperplane cells instead of trained centroids — centroid training
  * is out of scope for a deterministic oracle surface).
  */
object Similarity {

  def dot(a: Column, b: Column): Column = VectorOps.dot(a, b)

  /** Cosine over float-array columns, computed in double. */
  def cosine(a: Column, b: Column): Column = {
    val ad = a.cast("array<double>")
    val bd = b.cast("array<double>")
    dot(ad, bd) / (sqrt(dot(ad, ad)) * sqrt(dot(bd, bd)))
  }

  /** (vec_id, emb as double[], norm) — norms computed once, pre-join. */
  private def withNorm(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      .withColumn("nrm", sqrt(dot(col("emb"), col("emb"))))

  private def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .orderBy(col("q_id"), col("rnk"))
  }

  /** Brute-force cosine top-k neighbors for the first `nProbes` vectors. */
  def bruteForceTopK(emb: DataFrame, nProbes: Int, k: Int): DataFrame = {
    val e = withNorm(emb)
    val p = e.filter(col("vec_id") < nProbes)
      .select(col("vec_id").as("q_id"), col("emb").as("q_emb"),
        col("nrm").as("q_nrm"))
    val scored = e.crossJoin(broadcast(p))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(dot(col("q_emb"), col("emb")) / (col("q_nrm") * col("nrm")), 6)
          .as("cos"))
    rankTopK(scored, k)
  }

  val BucketBits = 4

  /** Hyperplane-sign bucket over the first [[BucketBits]] dimensions. */
  def signBucket(emb: Column): Column =
    (1 to BucketBits).map(i =>
      when(element_at(emb, i) >= 0f, lit(1 << (i - 1))).otherwise(lit(0)))
      .reduce(_ + _)

  /** LSH-bucketed ANN: probes only scan their own sign bucket. Recall is
    * traded for a ~2^bits candidate cut; same output shape as brute force.
    */
  def lshBucketTopK(emb: DataFrame, nProbes: Int, k: Int): DataFrame = {
    val e = emb.select(col("vec_id"),
        col("embedding").cast("array<double>").as("emb"),
        signBucket(col("embedding")).as("bucket"))
      .withColumn("nrm", sqrt(dot(col("emb"), col("emb"))))
    val p = e.filter(col("vec_id") < nProbes)
      .select(col("vec_id").as("q_id"), col("emb").as("q_emb"),
        col("nrm").as("q_nrm"), col("bucket").as("q_bucket"))
    val scored = e.join(broadcast(p),
        col("bucket") === col("q_bucket") && col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(dot(col("q_emb"), col("emb")) / (col("q_nrm") * col("nrm")), 6)
          .as("cos"))
    rankTopK(scored, k)
  }

  /** Embedding-cosine near-dup pairs, blocked by label and an id-distance
    * band so the pair space stays linear-ish in corpus size.
    */
  def cosineNearDupPairs(emb: DataFrame, threshold: Double,
                         idBand: Long): DataFrame = {
    val e = emb.select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("emb"))
      .withColumn("nrm", sqrt(dot(col("emb"), col("emb"))))
    e.as("a").join(e.as("b"),
        col("a.label") === col("b.label") &&
          col("a.vec_id") < col("b.vec_id") &&
          col("b.vec_id") - col("a.vec_id") <= idBand)
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        round(dot(col("a.emb"), col("b.emb")) / (col("a.nrm") * col("b.nrm")), 6)
          .as("cos"))
      .filter(col("cos") >= threshold)
      .orderBy(col("id_a"), col("id_b"))
  }
}
