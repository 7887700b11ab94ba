package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (north star): brute-force
  * cosine top-k as the correctness baseline, an LSH-bucketed variant as the
  * scale path, plus cosine near-dup pairs.
  *
  * All vector math is higher-order column functions (`zip_with` +
  * `aggregate`) over `array<double>` — no UDF, stays in codegen.
  * Doubles, not floats, so the sequential left-fold sum is bit-identical
  * to DuckDB's list_dot_product over DOUBLE[].
  *
  * Scale design: the probe set is small and broadcast, so brute force is a
  * map-side cross product with per-partition top-k (window over probe id)
  * — no shuffle of the corpus. The LSH variant additionally equi-joins on
  * a sign-bucket key, cutting candidates ~2^bits-fold; at 100 TB the
  * bucket key becomes the partition key so each probe touches one
  * partition (the IVF idea with hyperplane cells instead of k-means
  * centroids — centroid training is out of scope for a deterministic
  * oracle surface).
  */
object Similarity {

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Cosine over float-array columns, computed in double. */
  def cosine(a: Column, b: Column): Column = {
    val ad = a.cast("array<double>")
    val bd = b.cast("array<double>")
    dot(ad, bd) / (sqrt(dot(ad, ad)) * sqrt(dot(bd, bd)))
  }

  private def probes(emb: DataFrame, nProbes: Int): DataFrame =
    emb.filter(col("vec_id") < nProbes)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))

  /** Brute-force cosine top-k neighbors for the first `nProbes` vectors. */
  def bruteForceTopK(emb: DataFrame, nProbes: Int, k: Int): DataFrame = {
    val scored = emb.crossJoin(broadcast(probes(emb, nProbes)))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(cosine(col("q_emb"), col("embedding")), 6).as("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .orderBy(col("q_id"), col("rnk"))
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
    val bucketed = emb.select(col("vec_id"), col("embedding"),
      signBucket(col("embedding")).as("bucket"))
    val p = bucketed.filter(col("vec_id") < nProbes)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("bucket").as("q_bucket"))
    val scored = bucketed.join(broadcast(p),
        col("bucket") === col("q_bucket") && col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(cosine(col("q_emb"), col("embedding")), 6).as("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .orderBy(col("q_id"), col("rnk"))
  }

  /** Embedding-cosine near-dup pairs, blocked by label and an id-distance
    * band so the pair space stays linear-ish in corpus size.
    */
  def cosineNearDupPairs(emb: DataFrame, threshold: Double,
                         idBand: Long): DataFrame =
    emb.as("a").join(emb.as("b"),
        col("a.label") === col("b.label") &&
          col("a.vec_id") < col("b.vec_id") &&
          col("b.vec_id") - col("a.vec_id") <= idBand)
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        round(cosine(col("a.embedding"), col("b.embedding")), 6).as("cos"))
      .filter(col("cos") >= threshold)
      .orderBy(col("id_a"), col("id_b"))
}
