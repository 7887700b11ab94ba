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

  /** round(dot / (na·nb), 6) with a zero-norm guard: either side having
    * norm 0 scores NULL — null fails every threshold and (nulls-last
    * under descending sort) ranks after every real cosine — instead of
    * tripping ANSI DIVIDE_BY_ZERO. An all-zero embedding in a 100 TB
    * corpus must degrade to "no near neighbors", never kill the job.
    * The DuckDB oracles carry the SAME guard (`cosSql`): their bare
    * float division would yield NaN, and DuckDB treats NaN as greater
    * than every value, so an unguarded oracle would diverge on exactly
    * the zero-vector corpora this guard exists for.
    */
  private def cosOrNull(d: Column, na: Column, nb: Column): Column =
    round(when(na * nb =!= 0d, d / (na * nb)), 6)

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
    bruteForceTopKFor(e, e.filter(col("vec_id") < nProbes)
      .select(col("vec_id").as("q_id"), col("emb").as("q_emb"),
        col("nrm").as("q_nrm")), k)
  }

  /** [[bruteForceTopK]] against an EXPLICIT probe frame (q_id, q_emb,
    * q_nrm) — the seam that lets a harness hand both its truth and its
    * approximate side the SAME probe set when their selection
    * conventions differ (scoreIvf's rank-based probes vs the oracled
    * literal `vec_id < nProbes`).
    */
  private def bruteForceTopKFor(e: DataFrame, p: DataFrame,
                                k: Int): DataFrame = {
    val scored = e.crossJoin(broadcast(p))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        cosOrNull(dot(col("q_emb"), col("emb")), col("q_nrm"), col("nrm"))
          .as("cos"))
    rankTopK(scored, k)
  }

  /** Oracle-pinned default bucket width — the query registry passes this
    * explicitly so the DuckDB twin can interpolate the same constant; the
    * production default for [[lshNearDupPairs]] is [[deriveBucketBits]].
    */
  val BucketBits = 4

  /** Target rows per sign bucket for [[deriveBucketBits]]. */
  val TargetBucketRows = 256L

  /** Bucket width sized to the corpus: pair cost is Σ bucket², so buckets
    * must SHRINK as the corpus grows — a fixed width goes super-linear.
    * ceil(log2(n / [[TargetBucketRows]])), clamped to [[BucketBits]]..24
    * (a hyperplane per bit; beyond ~24 the recall loss outweighs the
    * cut). No dimensionality clamp: [[rpBucket]]'s planes each span ALL
    * dimensions, so no bit is ever dead (the old axis-aligned form read
    * one coordinate per bit and stalled past the array end). Costs one
    * zero-column count job plus a one-row dims probe at plan build; the
    * width has to be a plan-time constant because it fixes the
    * expression arity.
    */
  def deriveBucketBits(emb: DataFrame): Int = {
    val n = emb.count()
    val raw = math.ceil(
      math.log(math.max(1.0, n.toDouble / TargetBucketRows)) /
        math.log(2.0)).toInt
    math.min(24, math.max(BucketBits, raw))
  }

  /** Embedding dimensionality probe (one-row job at plan build — the
    * plane literals need a plan-time dims constant, like the bucket
    * width needs a plan-time bit count). Probes the first NON-NULL
    * embedding: rows with a null embedding are legitimate corpus members
    * (they ride the null-cosine passthrough everywhere in this family),
    * and an unfiltered head() would crash the whole plan build on
    * whichever corpus happens to order a null row first.
    */
  def probeDims(emb: DataFrame): Int =
    emb.select(size(col("embedding")).as("d"))
      .filter(col("d").isNotNull).head(1)
      .headOption.map(_.getInt(0)).getOrElse(0)

  /** Seed pinning the random-projection hyperplanes. The planes are part
    * of the QUERY CONTRACT, not run state: the DuckDB oracles embed the
    * same ±1 matrices as literals, so the seed can never drift silently.
    */
  val RpSeed = 0x6772616674L

  private def splitmix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** `bits` pinned Rademacher (±1) hyperplanes over `dims` dimensions,
    * derived from [[splitmix64]] so they are deterministic for a given
    * (bits, dims, seed) — the seeded random signed projections that fix
    * the round-4 `weak`: axis-aligned sign buckets collapse (or scatter
    * near-dups) when the leading coordinates are correlated or
    * noise-dominated, while a ±1 projection weighs every dimension.
    * ±1 entries (not uniform doubles) keep the projection bit-exactly
    * oracle-expressible: multiplying by ±1.0 is exact, so the dot is a
    * plain signed sum both engines fold in the same order.
    */
  def rpPlanes(bits: Int, dims: Int, seed: Long = RpSeed): Array[Array[Double]] =
    Array.tabulate(bits)(p => Array.tabulate(dims)(d =>
      if (splitmix64(seed + p.toLong * dims + d) < 0) -1.0 else 1.0))

  /** Random-projection sign bucket: bit i = sign of ⟨emb, planeᵢ⟩ over
    * the pinned [[rpPlanes]]. `embDouble` must be an `array<double>`
    * column. Pure map-side expression — `bits` codegen'd dot products
    * per row, zero shuffle, like the axis form it replaces.
    */
  def rpBucket(embDouble: Column, bits: Int, dims: Int,
               seed: Long = RpSeed): Column =
    rpPlanes(bits, dims, seed).zipWithIndex.map { case (p, i) =>
      when(dot(embDouble, typedLit(p.toSeq)) >= 0d, lit(1 << i))
        .otherwise(lit(0))
    }.reduce(_ + _)

  /** Axis-aligned sign bucket over the first `bits` dimensions — the
    * historical simple form, kept for bucket-partitioned table layouts
    * and as a cheap fixture; production blocking uses [[rpBucket]],
    * whose planes weigh every dimension.
    */
  def signBucket(emb: Column, bits: Int = BucketBits): Column =
    (1 to bits).map(i =>
      when(element_at(emb, i) >= 0f, lit(1 << (i - 1))).otherwise(lit(0)))
      .reduce(_ + _)

  /** LSH-bucketed ANN: probes only scan their own random-projection sign
    * bucket. Recall is traded for a ~2^bits candidate cut; same output
    * shape as brute force.
    *
    * `bucketBits <= 0` (the production default) sizes the bucket width off
    * the corpus via [[deriveBucketBits]], like [[lshNearDupPairs]] /
    * [[knnGraph]] / [[semanticDedup]] — a pinned width is the exact
    * super-linear trade the [[deriveBucketBits]] Scaladoc warns about:
    * fixed 2^bits buckets grow linearly with the corpus, so per-probe
    * candidate scans grow with n instead of staying ~[[TargetBucketRows]].
    * The query registry pins [[BucketBits]] explicitly so the DuckDB
    * oracle (which embeds the 4-bit plane literals) stays exact.
    */
  def lshBucketTopK(emb: DataFrame, nProbes: Int, k: Int,
                    bucketBits: Int = 0): DataFrame = {
    val bits = if (bucketBits > 0) bucketBits else deriveBucketBits(emb)
    val e = emb.select(col("vec_id"),
        col("embedding").cast("array<double>").as("emb"))
      .withColumn("bucket",
        rpBucket(col("emb"), bits, probeDims(emb)))
      .withColumn("nrm", sqrt(dot(col("emb"), col("emb"))))
    val p = e.filter(col("vec_id") < nProbes)
      .select(col("vec_id").as("q_id"), col("emb").as("q_emb"),
        col("nrm").as("q_nrm"), col("bucket").as("q_bucket"))
    val scored = e.join(broadcast(p),
        col("bucket") === col("q_bucket") && col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        cosOrNull(dot(col("q_emb"), col("emb")), col("q_nrm"), col("nrm"))
          .as("cos"))
    rankTopK(scored, k)
  }

  /** Multi-probe variant of [[lshBucketTopK]]: each query scans its own
    * sign bucket PLUS the `bits` buckets one hyperplane-flip away
    * (Hamming-1 multi-probe — the standard recall repair for sign-LSH:
    * a true neighbor lost to ONE noisy hyperplane is recovered instead
    * of gone forever; see the multi-probe LSH literature). Candidate
    * volume grows (bits+1)× — still a ~2^bits/(bits+1) cut over brute
    * force — and the probe side stays a broadcast (nProbes × (bits+1)
    * rows), so the corpus still never shuffles. [[annRecallCurve]] with
    * `probeRadius = 1` is this operator's evaluation harness; on an
    * unclustered (near-uniform) corpus single-probe recall collapses at
    * production widths and this is the difference between a usable ANN
    * and a random sample — measure, don't assume.
    */
  def lshBucketTopKMultiProbe(emb: DataFrame, nProbes: Int, k: Int,
                              bucketBits: Int = 0): DataFrame = {
    val bits = if (bucketBits > 0) bucketBits else deriveBucketBits(emb)
    val e = emb.select(col("vec_id"),
        col("embedding").cast("array<double>").as("emb"))
      .withColumn("bucket",
        rpBucket(col("emb"), bits, probeDims(emb)))
      .withColumn("nrm", sqrt(dot(col("emb"), col("emb"))))
    val p = e.filter(col("vec_id") < nProbes)
      .select(col("vec_id").as("q_id"), col("emb").as("q_emb"),
        col("nrm").as("q_nrm"), col("bucket").as("q_bucket"))
      .withColumn("probe_bucket", explode(concat(
        array(col("q_bucket")),
        transform(sequence(lit(0), lit(bits - 1)), i =>
          // shiftleft needs a literal count; 2^i is exact ≤ 2^24
          col("q_bucket").bitwiseXOR(pow(lit(2d), i).cast("int"))))))
    // a corpus vector's bucket is ONE value and the probe buckets are
    // pairwise distinct, so each (q, vec) candidate appears exactly once
    val scored = e.join(broadcast(p),
        col("bucket") === col("probe_bucket") &&
          col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        cosOrNull(dot(col("q_emb"), col("emb")), col("q_nrm"), col("nrm"))
          .as("cos"))
    rankTopK(scored, k)
  }

  /** IVF (inverted-file) ANN with deterministically-trained centroids:
    * Lloyd's k-means entirely in DataFrame ops — init = the first
    * `nCentroids` vectors, `iters` fixed assignment/update rounds (fixed
    * everything → reproducible across runs), then probe only the
    * `nProbe` nearest cells per query.
    *
    * Scale shape: training shuffles (cell, partial-sum) pairs with
    * map-side combine (centroids broadcast each round); search is a
    * broadcast of (probe, cell) against a cell-partitioned corpus —
    * at 100 TB the corpus would be written bucketed by cell so a probe
    * touches only its cells' files.
    */
  def ivfTopK(emb: DataFrame, nProbes: Int, k: Int,
              nCentroids: Int = 16, iters: Int = 3, nProbe: Int = 2): DataFrame = {
    val e = Checkpoints.cut(withNorm(emb))
    val centroids = trainCentroidArray(e, nCentroids, iters)
    if (centroids.isEmpty) emptyTopK(e)
    else scoreIvf(e, centroids, nProbes, k, nProbe)
  }

  /** Train the IVF k-means centroids and return them as a small
    * (cid, cemb) frame — the PERSISTABLE model half of [[ivfTopK]].
    * Write it once through [[graft.sources.Sinks.writeIfAbsent]] and
    * score many runs with [[ivfTopKFromModel]]: at 100 TB you never
    * re-train per query (re-training is `iters` corpus passes; scoring
    * from a model is one map-side assignment pass).
    */
  def trainIvfCentroids(emb: DataFrame, nCentroids: Int = 16,
                        iters: Int = 3): DataFrame = {
    val e = Checkpoints.cut(withNorm(emb))
    val centroids = trainCentroidArray(e, nCentroids, iters)
    val spark = emb.sparkSession
    import spark.implicits._
    centroids.toSeq.map { case (cid, v) => (cid, v.toSeq) }
      .toDF("cid", "cemb")
  }

  /** Score-only IVF against a trained (cid, cemb) model frame — the
    * production train-once/score-many shape. The model collect is
    * bounded (nCentroids × dims); the plan contains ZERO training
    * subtrees (no per-round aggregates, no iterative jobs).
    */
  def ivfTopKFromModel(emb: DataFrame, model: DataFrame, nProbes: Int,
                       k: Int, nProbe: Int = 2): DataFrame = {
    val e = withNorm(emb)
    val centroids = model.select(col("cid").cast("long"),
        col("cemb").cast("array<double>"))
      .collect().map(r => (r.getLong(0),
        r.getAs[scala.collection.Seq[Double]](1).toArray))
    if (centroids.isEmpty) emptyTopK(e)
    else scoreIvf(e, centroids, nProbes, k, nProbe)
  }

  /** Cluster-balanced downsampling — the diversity-preserving corpus
    * cap (the SemDeDup/DINO-style curation move): where a uniform
    * random cap keeps the corpus's mode and starves its tails, this one
    * assigns every embedding to its nearest IVF cell (the [[ivfTopK]]
    * k-means, deterministic init + fixed rounds) and keeps at most
    * `cap` vectors PER CELL, chosen by a salted-md5 rank so the
    * within-cell pick is uniform, deterministic, and uncorrelated with
    * vec_id order. Output: (vec_id, cluster, in_cell_rank) for the
    * kept rows — the frame a balanced fine-tuning/eval subset reads.
    *
    * Scale shape: assignment is a pure map-side argmin over the
    * broadcast centroid array (zero shuffle, the [[nearestCells]]
    * expression); the per-cell cap plans as WindowGroupLimit — the
    * rank ≤ cap cut runs BELOW the window sort on the map side (the
    * n48 shape), so at most cells × cap rows survive the exchange.
    * Nothing but the k-means training (bounded per-round aggregates)
    * touches the corpus twice.
    */
  def clusterBalancedSample(emb: DataFrame, cap: Int,
                            nCentroids: Int = 16, iters: Int = 3): DataFrame = {
    val e = Checkpoints.cut(withNorm(emb))
    val centroids = trainCentroidArray(e, nCentroids, iters)
    if (centroids.isEmpty)
      return e.select(col("vec_id"), lit(0L).as("cluster"),
        lit(1).as("in_cell_rank")).limit(0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster")).orderBy(col("sk"), col("vec_id"))
    e.withColumn("cluster", nearestCells(centroids, 1).getItem(0))
      .withColumn("sk",
        md5(concat(lit("cbs|"), col("vec_id").cast("string"))))
      .withColumn("in_cell_rank", row_number().over(w))
      .filter(col("in_cell_rank") <= cap)
      .select(col("vec_id"), col("cluster"), col("in_cell_rank"))
      .orderBy(col("vec_id"))
  }

  /** Deterministic ±1 sign matrix for the JL projection: s(i,j) from
    * the parity of the first 8 hex chars of md5("rp|i|j") — the same
    * bits any engine's md5 yields, so the oracle recomputes the matrix
    * in SQL and the projection is engine-stable (no RNG state to ship).
    */
  private[graft] def jlSigns(dims: Int, k: Int): Array[Array[Double]] =
    Array.tabulate(k) { j =>
      Array.tabulate(dims) { i =>
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(s"rp|$i|$j".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.substring(0, 8)
        if (java.lang.Long.parseLong(hex, 16) % 2 == 0) 1.0 else -1.0
      }
    }

  /** Johnson–Lindenstrauss random projection with deterministic ±1
    * signs (Achlioptas 2003): project the embedding column to `k` dims
    * via k codegen'd dot products against md5-derived sign rows. The
    * cheap-geometry half of a 100 TB ANN stack: distances survive to
    * within JL distortion at a dims/k cost cut, so candidate
    * generation (see [[projectedTopK]]) runs in the small space and
    * only the shortlist pays full-width arithmetic.
    *
    * Scale shape: pure map-side projection (k dot products per row,
    * whole-stage codegen, zero shuffle, the sign matrix is a literal);
    * the one extra job is a bounded dims probe. Null embeddings
    * project to null components, never crash.
    */
  def randomProjection(emb: DataFrame, k: Int = 8): DataFrame = {
    val e = emb.select(col("vec_id"),
      col("embedding").cast("array<double>").as("emb"))
    val dimRow = e.agg(max(size(col("emb")))).head()
    if (dimRow.isNullAt(0))
      // a null dims probe means EVERY embedding is NULL (an empty array
      // would read size 0): per contract — and per the oracle, where
      // list_dot_product(NULL, srow) is NULL — each row projects to k
      // null components, not to a dropped row
      return e.select(col("vec_id"),
        array((0 until k).map(_ => lit(null).cast("double")): _*)
          .as("proj"))
        .orderBy(col("vec_id"))
    val signs = jlSigns(dimRow.getInt(0), k)
    e.select(col("vec_id"),
        array(signs.map(r => round(dot(col("emb"), typedLit(r.toSeq)), 6))
          .toIndexedSeq: _*).as("proj"))
      .orderBy(col("vec_id"))
  }

  /** JL-prefiltered exact ANN: shortlist candidates by cosine in the
    * [[randomProjection]] space (k dims — an 8× cheaper dot at the
    * fixture's 64), then re-rank ONLY the shortlist with full-width
    * exact cosine. Fully deterministic end to end (md5 signs, rounded
    * stage-1 scores, vec_id tiebreaks) — unlike the k-means IVF path
    * this variant is oracle-expressible, giving the engine a
    * dimensionality-reduction ANN whose every row the differential
    * gate can check.
    *
    * Scale shape: stage 1 is the brute-force probe shape (probes
    * broadcast, corpus map-side) but in k-dim space; the shortlist is
    * bounded (nProbes × `shortlist`) → broadcast back onto the corpus
    * for the exact fetch, so full-width vectors are touched once per
    * SHORTLISTED pair, never per corpus pair, and the corpus never
    * shuffles.
    */
  def projectedTopK(emb: DataFrame, nProbes: Int, k: Int,
                    projDims: Int = 8, shortlist: Int = 20): DataFrame = {
    val e = withNorm(emb)
    val p = randomProjection(emb, projDims)
      .select(col("vec_id"), col("proj").as("pemb"))
      .withColumn("pnrm", sqrt(dot(col("pemb"), col("pemb"))))
    val probesP = p.filter(col("vec_id") < nProbes)
      .select(col("vec_id").as("q_id"), col("pemb").as("q_pemb"),
        col("pnrm").as("q_pnrm"))
    val sw = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("pcos").desc, col("vec_id").asc)
    val shortlisted = p.crossJoin(broadcast(probesP))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        cosOrNull(dot(col("q_pemb"), col("pemb")),
          col("q_pnrm"), col("pnrm")).as("pcos"))
      .withColumn("srnk", row_number().over(sw))
      .filter(col("srnk") <= shortlist)
      .select(col("q_id"), col("vec_id"))
    val qe = e.filter(col("vec_id") < nProbes)
      .select(col("vec_id").as("q_id"), col("emb").as("q_emb"),
        col("nrm").as("q_nrm"))
    val exact = e.join(broadcast(shortlisted), Seq("vec_id"))
      .join(broadcast(qe), Seq("q_id"))
      .select(col("q_id"), col("vec_id"),
        cosOrNull(dot(col("q_emb"), col("emb")), col("q_nrm"), col("nrm"))
          .as("cos"))
    rankTopK(exact, k)
  }

  /** Degenerate corpora (empty, or every cell dropped by the all-null
    * mean filter) must yield an EMPTY result, not an analyzer error
    * from array() over zero centroid structs in nearestCells.
    */
  private def emptyTopK(e: DataFrame): DataFrame =
    e.select(col("vec_id").as("q_id"), col("vec_id"),
      lit(0d).as("cos"), lit(1).as("rnk")).limit(0)

  /** Lloyd's k-means over a normed frame, entirely deterministic:
    * init = the `nCentroids` smallest-id vectors, `iters` fixed
    * assignment/update rounds. Returns the (bounded) centroid array;
    * empty means the corpus itself was empty or degenerate.
    */
  private def trainCentroidArray(e: DataFrame, nCentroids: Int,
                                 iters: Int): Array[(Long, Array[Double])] = {
    // seed from the nCentroids SMALLEST ids (not `vec_id < nCentroids`,
    // which silently collects zero seeds on an offset/filtered corpus
    // whose ids all exceed nCentroids — empty here must mean the corpus
    // itself is empty)
    var centroids = e.orderBy(col("vec_id")).limit(nCentroids)
      .select(col("vec_id").as("cid"), col("emb").as("cemb"))
      .collect().map(r => (r.getLong(0),
        r.getAs[scala.collection.Seq[Double]](1).toArray))
    if (centroids.isEmpty) return centroids
    for (_ <- 1 to iters) {
      // assignment is a pure map-side expression over the (bounded,
      // driver-collected) centroid array — the crossJoin + per-vector
      // window form shuffles nCentroids × corpus rows every round
      val assigned = e.withColumn("cid", nearestCells(centroids, 1).getItem(0))
      // ONE aggregate pair (array-sum + count) regardless of dims — the
      // per-dimension `avg(emb[i])` form is 1024 aggregate buffers at
      // 1024-dim and blows past codegen limits long before 100 TB.
      centroids = assigned
        .groupBy(col("cid"))
        // count only rows VectorSum actually summed (non-null AND
        // non-empty) — count(*) or count(emb) would shrink means toward
        // zero in cells with null or zero-length rows
        .agg(graft.functions.VectorSum.vecSum(col("emb")).as("s"),
          count(when(size(col("emb")) > 0, 1)).as("n"))
        .select(col("cid"),
          transform(col("s"), _ / col("n")).as("mean"))
        .filter(col("mean").isNotNull) // all-null cell: drop, don't NPE
        .collect().map(r => (r.getLong(0),
          r.getAs[scala.collection.Seq[Double]]("mean").toArray))
      if (centroids.isEmpty) return centroids
    }
    centroids
  }

  /** The search half of IVF: index the corpus map-side, probe only the
    * `nProbe` nearest cells per query.
    */
  private def scoreIvf(e: DataFrame, centroids: Array[(Long, Array[Double])],
                       nProbes: Int, k: Int, nProbe: Int): DataFrame = {
    // --- index: corpus rows with their cell (map-side, no shuffle) ---
    val indexed = e.withColumn("cid", nearestCells(centroids, 1).getItem(0))
    // --- search: probes scan their nProbe nearest cells only ---
    // probes = the nProbes smallest ids, rank-based like the seeds (the
    // oracled ANN variants keep the literal `vec_id < nProbes` convention
    // their DuckDB twins pin)
    val probeCells = e.orderBy(col("vec_id")).limit(nProbes)
      .withColumn("cid", explode(nearestCells(centroids, nProbe)))
      .select(col("vec_id").as("q_id"), col("emb").as("q_emb"),
        col("nrm").as("q_nrm"), col("cid"))
    val scored = indexed.join(broadcast(probeCells),
        indexed("cid") === probeCells("cid") && col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        cosOrNull(dot(col("q_emb"), col("emb")), col("q_nrm"), col("nrm"))
          .as("cos"))
    rankTopK(scored, k)
  }

  /** The `take` nearest centroid cells of `col("emb")`, as an array in
    * ascending-distance order — argmin over L2 via the dot expansion
    * `cc − 2·⟨emb,c⟩` (the ‖emb‖² term is constant per row and can't
    * change the ordering). Ties break to the smaller cid through the
    * (d2, cid) struct ordering, matching the old window's
    * (d2 asc, cid asc). Pure projection: at 100 TB assignment costs one
    * codegen'd pass, zero shuffle, versus crossJoin + window moving
    * nCentroids × corpus rows.
    */
  private def nearestCells(centroids: Array[(Long, Array[Double])],
                           take: Int): Column = {
    val structs = centroids.map { case (cid, v) =>
      val cc = v.map(x => x * x).sum
      struct((lit(cc) - lit(2.0) * dot(col("emb"), typedLit(v.toSeq)))
        .as("d2"), lit(cid).as("cid"))
    }
    transform(slice(array_sort(array(structs: _*)), 1, take),
      s => s.getField("cid"))
  }

  /** Per-label embedding norm statistics — the corpus-level sanity check
    * on an embedding column (count + exact-decimal average norm). One
    * tiny-key aggregate; norms are per-row codegen'd dot products.
    */
  def labelNorms(emb: DataFrame): DataFrame =
    emb.select(col("label"),
        col("embedding").cast("array<double>").as("emb"))
      .withColumn("nrm", round(sqrt(dot(col("emb"), col("emb"))), 6))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        round(sum(col("nrm").cast("decimal(18,6)")).cast("double") /
          count(lit(1)), 6).as("avg_norm"))
      .orderBy(col("label"))

  /** Per-label centroid + per-vector cosine-to-own-centroid — the
    * label-noise / embedding-QC pass: a vector far from its label's
    * centroid is a mislabeled or degenerate row, flagged BEFORE it
    * poisons contrastive training. Output: (vec_id, label,
    * cos_centroid, is_outlier∈{0,1}), is_outlier = cos < `threshold`
    * (null cosine — null/zero-norm embedding or a label with no usable
    * vectors — flags NULL, never crashes, like every cosine op here).
    *
    * Scale shape: the centroid aggregate runs on posexplode(label, dim)
    * keys with map-side partial aggregation, so the exchange carries
    * ~labels × dims rows per map partition — NOT corpus × dims (sum and
    * count combine before the shuffle); the centroid table
    * (labels × dims, KBs) then broadcast-joins back, and the cosine is
    * a per-row codegen'd dot — zero further shuffle. Component sums go
    * through round-6 + decimal(18,6), the [[labelNorms]] recipe, so the
    * centroid — and therefore the cosine — is bit-identical across
    * engines (a raw double sum would be fold-order-dependent).
    */
  /** Per-group round-6-decimal component-average centroids over an
    * (grp, emb) frame — the fold-order-independent construction
    * [[labelCentroidOutliers]] and [[labelCentroidDrift]] share (both
    * engines build the SAME centroid bit-exactly). Output: (grp, cemb).
    */
  private def groupCentroids(e: DataFrame, grp: Column): DataFrame =
    e.select(grp.as("grp"), posexplode(col("emb")))
      .groupBy(col("grp"), col("pos"))
      .agg(round(sum(round(col("col"), 6).cast("decimal(18,6)"))
        .cast("double") / count(lit(1)), 6).as("cv"))
      .groupBy(col("grp"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("cv")))),
        s => s.getField("cv")).as("cemb"))

  def labelCentroidOutliers(emb: DataFrame,
                            threshold: Double = 0.5): DataFrame = {
    val e = emb.select(col("vec_id"), col("label"),
      col("embedding").cast("array<double>").as("emb"))
    val centroids = groupCentroids(e, col("label"))
      .select(col("grp").as("label"), col("cemb"))
    e.join(broadcast(centroids), Seq("label"), "left_outer")
      .withColumn("cos_centroid", cosOrNull(
        dot(col("emb"), col("cemb")),
        sqrt(dot(col("emb"), col("emb"))),
        sqrt(dot(col("cemb"), col("cemb")))))
      .select(col("vec_id"), col("label"), col("cos_centroid"),
        when(col("cos_centroid").isNotNull,
          (col("cos_centroid") < threshold).cast("int")).as("is_outlier"))
      .orderBy(col("vec_id"))
  }

  /** Embedding-space drift per label: each label's centroid scored
    * against the WHOLE-CORPUS centroid — the subpopulation-shift signal
    * ([[graft.ops.TextAnalysis.sourceDrift]]'s embedding twin: text KL
    * catches vocabulary drift, this catches semantic drift a shared
    * vocabulary hides). A label whose centroid points away from the
    * corpus mean is a cluster the mix under- or over-represents, or a
    * batch of off-distribution vectors. Output: (label, n_vecs,
    * cos_corpus), null-guarded like every cosine here (a degenerate
    * all-zero centroid scores NULL, never crashes). `n_vecs` counts the
    * centroid's SUPPORT — rows with a non-null embedding, exactly the
    * rows the posexplode average saw — so a label mixing null and
    * non-null embeddings can't overstate how many vectors back its
    * centroid.
    *
    * Scale shape: both centroids come from ONE posexplode aggregate
    * shape with map-side partials (exchange carries ~labels × dims, the
    * [[labelCentroidOutliers]] shape) — the corpus row reuses the label
    * centroid construction keyed by a constant; the final score is a
    * labels-sized broadcast nested-loop against one corpus row. Centroid
    * components go through round-6 + decimal(18,6), so both engines
    * score identical centroids.
    */
  def labelCentroidDrift(emb: DataFrame): DataFrame = {
    val e = emb.select(col("vec_id"), col("label"),
      col("embedding").cast("array<double>").as("emb"))
    val perLabel = groupCentroids(e, col("label"))
      .select(col("grp").as("label"), col("cemb"))
    val corpus = groupCentroids(e, lit("all"))
      .select(col("cemb").as("gemb"))
    val counts = e.filter(col("emb").isNotNull)
      .groupBy(col("label")).agg(count(lit(1)).as("n_vecs"))
    perLabel.join(counts, Seq("label"))
      .crossJoin(broadcast(corpus))
      .select(col("label"), col("n_vecs"),
        cosOrNull(dot(col("cemb"), col("gemb")),
          sqrt(dot(col("cemb"), col("cemb"))),
          sqrt(dot(col("gemb"), col("gemb")))).as("cos_corpus"))
      .orderBy(col("label"))
  }

  /** Cosine background distribution over a deterministic vector sample —
    * the τ-calibration step a semantic-dedup / decontamination run does
    * FIRST: near-dup thresholds (n46/n55/n61's τ) are only meaningful
    * relative to what unrelated pairs score, and this publishes that
    * null distribution as a 20-bucket histogram of pairwise cosine over
    * an md5-sampled vector subset (own salt — never correlates with
    * split/shard/mix buckets). Bucket b covers [b/10 − 1, (b+1)/10 − 1);
    * cosine 1.0 folds into bucket 19; zero-norm pairs count under a NULL
    * bucket (they score no cosine but belong in the report).
    *
    * Scale shape: the sampled side broadcasts, so the pair space is
    * sample², never corpus² — and the sample is the knob: hold ABSOLUTE
    * sample volume fixed as the corpus grows (pct ∝ 1/growth, the n65
    * sampled-tuning discipline) and calibration cost is FLAT in corpus
    * size. Bucketing floors a round-6 cosine — integer output, no float
    * compare surface.
    */
  def cosineBackground(emb: DataFrame, pct: Int = 20): DataFrame = {
    require(pct >= 1 && pct <= 100, s"pct must be 1..100, got $pct")
    val s = emb
      .filter(TextAnalysis.saltedBucket("cbg|", col("vec_id"), 100) < pct)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      .withColumn("nrm", sqrt(dot(col("emb"), col("emb"))))
    s.as("a").join(broadcast(s.as("b")),
        col("a.vec_id") < col("b.vec_id"))
      .select(cosOrNull(dot(col("a.emb"), col("b.emb")),
        col("a.nrm"), col("b.nrm")).as("c"))
      .select(when(col("c").isNotNull,
        least(floor((col("c") + lit(1.0d)) * 10d), lit(19d)).cast("long"))
        .as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("bucket"))
  }

  /** PRODUCTION form of [[cosineBackground]] — the ABSOLUTE-sample knob
    * as an entry point (the [[graft.ops.Dedup.jaccardBackgroundSample]]
    * move on the embedding side): the sample is the `sampleSize`
    * vectors with the lowest (salted md5 rank, vec_id), a deterministic
    * fixed-size subset at any corpus scale via distributed TakeOrdered;
    * pair space = sample² by construction → calibration cost FLAT as
    * the corpus grows. Bucket math identical to the pct form; own salt
    * (`cbgs|`).
    */
  def cosineBackgroundSample(emb: DataFrame, sampleSize: Int): DataFrame = {
    require(sampleSize >= 2, s"sampleSize must be >= 2, got $sampleSize")
    // cut: one materialized N-row sample instead of two independent
    // corpus top-k subtrees under the self-join (the
    // jaccardBackgroundSample reasoning; TakeOrdered pinned on
    // [[backgroundVecSample]] directly)
    val s = Checkpoints.cut(backgroundVecSample(emb, sampleSize))
    s.as("a").join(broadcast(s.as("b")),
        col("a.vec_id") < col("b.vec_id"))
      .select(cosOrNull(dot(col("a.emb"), col("b.emb")),
        col("a.nrm"), col("b.nrm")).as("c"))
      .select(when(col("c").isNotNull,
        least(floor((col("c") + lit(1.0d)) * 10d), lit(19d)).cast("long"))
        .as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("bucket"))
  }

  /** The deterministic lowest-N vector sample
    * [[cosineBackgroundSample]] rides, factored for its plan pin.
    * emb and nrm are ONE projection (the cast repeated inline rather
    * than aliased through a second Project): a two-Project stack here
    * breaks the planner's Limit(Project(Sort)) pattern — CollapseProject
    * won't merge a self-referencing sqrt(dot) — and the top-k degrades
    * to a corpus-wide range sort + single-partition exchange. PlanSpec
    * pins the TakeOrderedAndProject shape.
    */
  def backgroundVecSample(emb: DataFrame, sampleSize: Int): DataFrame = {
    val embD = col("embedding").cast("array<double>")
    emb
      .select(col("vec_id"), col("embedding"),
        TextAnalysis.saltedBucket("cbgs|", col("vec_id"), 1000000000L)
          .as("bk"))
      .orderBy(col("bk"), col("vec_id")).limit(sampleSize)
      .select(col("vec_id"), embD.as("emb"),
        sqrt(dot(embD, embD)).as("nrm"))
  }

  /** Scalar (int8) quantization of the embedding column — the 4× memory
    * cut that makes a 100 TB ANN index fit executor memory. Two passes:
    *
    *   1. stats: global per-dimension (min, max) via ONE
    *      [[graft.functions.VectorMinMax]] aggregate (the posexplode →
    *      groupBy(dim) form shuffles corpus × dims rows; this shuffles
    *      two arrays per partition) — bounded driver collect (2 × dims);
    *   2. encode: `code = round((x − mn) · 255 / (mx − mn))` as a pure
    *      map-side expression over the broadcast-as-literal ranges.
    *
    * Emits the codes for the first `nVecs` vectors (1-based `dim` to
    * match SQL subscripting); encoding the full corpus is the same
    * projection without the filter. All math in double with a fixed op
    * order, so the DuckDB oracle is bit-exact.
    */
  def int8Codes(emb: DataFrame, nVecs: Int): DataFrame = {
    val e = emb.select(col("vec_id"),
      col("embedding").cast("array<double>").as("emb"))
    val mmRow = e.agg(
      graft.functions.VectorMinMax.vecMinMax(col("emb")).as("mm")).head()
    val mm = mmRow.getStruct(0)
    val mns = mm.getAs[scala.collection.Seq[Double]](0)
    val mxs = mm.getAs[scala.collection.Seq[Double]](1)
    if (mns.isEmpty) // empty corpus: no ranges → empty codes frame
      return e.select(col("vec_id"), lit(0).as("dim"), lit(0L).as("code"))
        .limit(0)
    e.filter(col("vec_id") < nVecs)
      .select(col("vec_id"), posexplode(col("emb")).as(Seq("pos", "x")))
      .select(col("vec_id"), (col("pos") + 1).as("dim"),
        when(element_at(typedLit(mxs), col("pos") + 1) ===
            element_at(typedLit(mns), col("pos") + 1), lit(0L))
          .otherwise(round(
            (col("x") - element_at(typedLit(mns), col("pos") + 1)) * lit(255.0)
              / (element_at(typedLit(mxs), col("pos") + 1) -
                 element_at(typedLit(mns), col("pos") + 1)), 0).cast("long"))
          .as("code"))
      .orderBy(col("vec_id"), col("dim"))
  }

  /** ANN over the int8-quantized representation with exact re-rank —
    * the search half of the [[int8Codes]] story: candidate generation
    * runs against quantize→dequantize round-tripped vectors (what a
    * 4×-smaller int8 index would reconstruct at query time), then the
    * top `rerank` candidates per probe are re-scored with the exact
    * doubles and the final top-k keeps only exact cosines.
    *
    * Scale shape: at 100 TB the corpus stores ONLY the int8 codes
    * (4× less IO + memory than float32); the approximate pass is the
    * same broadcast-probe map-side scan as [[bruteForceTopK]], and the
    * exact pass touches `probes × rerank` rows. Checked rows-only; the
    * recall-vs-exact property lives in SimilaritySpec.
    */
  def int8AnnTopK(emb: DataFrame, nProbes: Int, k: Int,
                  rerank: Int = 30): DataFrame = {
    require(rerank >= k,
      s"rerank shortlist ($rerank) must cover the requested top-k ($k) — " +
        "a smaller shortlist silently truncates the result")
    val e = Checkpoints.cut(withNorm(emb))
    val mmRow = e.agg(
      graft.functions.VectorMinMax.vecMinMax(col("emb")).as("mm")).head()
    val mm = mmRow.getStruct(0)
    val mns = mm.getAs[scala.collection.Seq[Double]](0)
    val mxs = mm.getAs[scala.collection.Seq[Double]](1)
    val spans = mns.zip(mxs).map { case (a, b) => b - a }
    // quantize→dequantize round trip as one elementwise expression chain
    // (at scale the codes are the stored representation; here the round
    // trip reconstructs what the index would hold)
    val qemb = zip_with(
      zip_with(
        zip_with(col("emb"), typedLit(mns), (x, mn) => x - mn),
        typedLit(spans),
        (d, s) => when(s === 0d, 0d).otherwise(round(d * lit(255.0) / s, 0))),
      typedLit(spans), (c, s) => c * s / lit(255.0))
    val qe = e.select(col("vec_id"), col("emb"), col("nrm"),
        zip_with(qemb, typedLit(mns), (q, mn) => q + mn).as("qemb"))
      .withColumn("qnrm", sqrt(dot(col("qemb"), col("qemb"))))
    val p = qe.filter(col("vec_id") < nProbes)
      .select(col("vec_id").as("q_id"), col("qemb").as("p_qemb"),
        col("qnrm").as("p_qnrm"), col("emb").as("q_emb"),
        col("nrm").as("q_nrm"))
    // approximate pass over the reconstructed vectors
    val approx = qe.crossJoin(broadcast(p))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"), col("q_emb"), col("q_nrm"),
        col("emb"), col("nrm"),
        when(col("p_qnrm") * col("qnrm") =!= 0d,
          dot(col("p_qemb"), col("qemb")) / (col("p_qnrm") * col("qnrm")))
          .as("qcos"))
    val wApprox = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("qcos").desc, col("vec_id").asc)
    // exact re-rank of the quantized shortlist
    val cands = approx.withColumn("qrnk", row_number().over(wApprox))
      .filter(col("qrnk") <= rerank)
      .select(col("q_id"), col("vec_id"),
        cosOrNull(dot(col("q_emb"), col("emb")), col("q_nrm"), col("nrm"))
          .as("cos"))
    rankTopK(cands, k)
  }

  /** Embedding-cosine near-dup pairs blocked by the random-projection
    * sign bucket — the scale-correct twin of [[cosineNearDupPairs]]'
    * id-band baseline: near-identical vectors project to the same signs
    * (a flip needs a near-zero projection onto that plane), so candidate
    * generation is a bucket equi-join whose pair count is Σ bucket²
    * instead of n². `bucketBits <= 0` (the default) sizes the width to
    * the corpus via [[deriveBucketBits]] so buckets stay bounded at any
    * scale; the query registry pins [[BucketBits]] explicitly for its
    * oracle twin. Recall loss is the standard LSH trade.
    */
  def lshNearDupPairs(emb: DataFrame, threshold: Double,
                      bucketBits: Int = 0): DataFrame = {
    val bits = if (bucketBits > 0) bucketBits else deriveBucketBits(emb)
    lshNearDupPairsWith(emb, threshold,
      rpBucket(col("emb"), bits, probeDims(emb)))
  }

  /** [[lshNearDupPairs]] with an explicit bucket expression over the
    * double `emb` column — the seam that lets specs drive the pair
    * pipeline with hand-computable buckets.
    */
  private[graft] def lshNearDupPairsWith(emb: DataFrame, threshold: Double,
                                         bucket: Column): DataFrame =
    nearDupPairs(
      emb.select(col("vec_id"),
          col("embedding").cast("array<double>").as("emb"))
        .withColumn("bucket", bucket),
      col("a.bucket") === col("b.bucket"), threshold)

  /** Embedding-cosine near-dup pairs, blocked by label and an id-distance
    * band so the pair space stays linear-ish in corpus size.
    */
  def cosineNearDupPairs(emb: DataFrame, threshold: Double,
                         idBand: Long): DataFrame =
    nearDupPairs(
      emb.select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("emb")),
      col("a.label") === col("b.label") &&
        col("b.vec_id") - col("a.vec_id") <= idBand, threshold)

  /** Shared near-dup pair machinery: self-join `e` (which must carry
    * `vec_id`, a double `emb`, and its blocking columns) under the
    * given blocking predicate, score each candidate with ONE rounded
    * cosine, threshold, and order. Scoring/rounding conventions for the
    * n11/n41 oracle twins live only here.
    */
  private def nearDupPairs(e0: DataFrame, blocking: Column,
                           threshold: Double): DataFrame =
    nearDupPairsUnsorted(e0, blocking, threshold)
      .orderBy(col("id_a"), col("id_b"))

  /** [[nearDupPairs]] without the presentation sort — for consumers that
    * aggregate or join the pairs ([[semanticDedup]]); Catalyst's
    * EliminateSorts usually drops an interior sort, but not depending on
    * that keeps the plan honest by construction.
    */
  private def nearDupPairsUnsorted(e0: DataFrame, blocking: Column,
                                   threshold: Double): DataFrame = {
    val e = e0.withColumn("nrm", sqrt(dot(col("emb"), col("emb"))))
    // zero-norm sides score null (fails every threshold) instead of
    // tripping ANSI DIVIDE_BY_ZERO — a corpus with an all-zero embedding
    // must degrade to "it has no near-dups", not kill the job. The DuckDB
    // oracles embed the same CASE guard (a bare division there gives NaN,
    // which DuckDB compares GREATER than everything — the opposite of
    // failing the threshold).
    e.as("a").join(e.as("b"),
        blocking && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        cosOrNull(dot(col("a.emb"), col("b.emb")), col("a.nrm"), col("b.nrm"))
          .as("cos"))
      // barrier: without it the threshold is pushed into the join's
      // condition and the dot product runs twice per candidate pair
      // (graft.ops.Checkpoints.exprBarrier — the verify-family fix)
      .transform(graft.ops.Checkpoints.exprBarrier(_, "cos_verify"))
      .filter(col("cos") >= threshold)
  }

  /** Bucket-blocked k-NN graph: every vector's top-`k` cosine neighbors
    * WITHIN its hyperplane sign bucket — the all-vectors generalization
    * of [[lshBucketTopK]]'s probe-set search and the building block for
    * graph-based clustering and semantic dedup over the whole corpus.
    * Edges are directed (src → its neighbors); a vector alone in its
    * bucket contributes no rows.
    *
    * Scale shape: candidates are the Σ bucket² bucket equi-join (bits
    * sized to the corpus unless pinned), then per-src top-k via
    * row_number — Spark inserts a WindowGroupLimit partial pre-cap below
    * the exchange, so at most k rows per (partition, src) survive the
    * shuffle, the same skew guard PlanSpec pins for the per-source cap.
    */
  def knnGraph(emb: DataFrame, k: Int, bucketBits: Int = 0): DataFrame = {
    val bits = if (bucketBits > 0) bucketBits else deriveBucketBits(emb)
    knnGraphWith(emb, k, rpBucket(col("emb"), bits, probeDims(emb)))
  }

  /** [[knnGraph]] with an explicit bucket expression over the double
    * `emb` column (spec seam, like [[lshNearDupPairsWith]]).
    */
  private[graft] def knnGraphWith(emb: DataFrame, k: Int,
                                  bucket: Column): DataFrame = {
    val e = emb.select(col("vec_id"),
        col("embedding").cast("array<double>").as("emb"))
      .withColumn("bucket", bucket)
      .withColumn("nrm", sqrt(dot(col("emb"), col("emb"))))
    val scored = e.as("a").join(e.as("b"),
        col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("src"), col("b.vec_id").as("dst"),
        cosOrNull(dot(col("a.emb"), col("b.emb")), col("a.nrm"), col("b.nrm"))
          .as("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("src")).orderBy(col("cos").desc, col("dst").asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .orderBy(col("src"), col("rnk"))
  }

  /** Semantic deduplication (SemDeDup-shape): block the corpus into
    * hyperplane sign buckets (the cheap stand-in for the paper's k-means
    * clusters — deterministic, so the keep list is oracle-checkable),
    * score within-bucket cosine pairs, and drop every vector that has a
    * smaller-id neighbor at or above `threshold`. One-pass min-id keeper:
    * a drop decision never depends on whether the neighbor itself
    * survived, which makes the policy order-independent and exactly
    * expressible in SQL (the iterated greedy variant differs only when
    * near-dup similarity is non-transitive within a bucket).
    *
    * Scale shape: candidate pairs are Σ bucket² via the bucket equi-join
    * (bits sized to the corpus by [[deriveBucketBits]] unless pinned);
    * the dropped-id set is distinct-reduced before a single left-anti
    * join on vec_id — embeddings themselves never re-shuffle.
    */
  /** ANN recall@k harness — [[lshBucketTopK]] scored against
    * [[bruteForceTopK]] ground truth, per probe: the vector-side twin of
    * the text pipeline's LSH tuning harness (n59). The brute-force side
    * is the expensive half and that cost IS the product — an exact
    * evaluation number for a bucket width before a 100 TB ANN run
    * commits to it — and it stays bounded because `nProbes` bounds it
    * (probes broadcast; the corpus is scanned, never shuffled). The
    * final join/agg runs on nProbes×k rows — nothing at corpus scale.
    */
  def annRecall(emb: DataFrame, nProbes: Int, k: Int,
                bucketBits: Int = 0): DataFrame = {
    val truth = bruteForceTopK(emb, nProbes, k)
      .select(col("q_id"), col("vec_id"))
    val approx = lshBucketTopK(emb, nProbes, k, bucketBits)
      .select(col("q_id"), col("vec_id"), lit(1).as("hit"))
    truth.join(approx, Seq("q_id", "vec_id"), "left_outer")
      .groupBy(col("q_id"))
      .agg(count(lit(1)).as("n_truth"), count(col("hit")).as("n_hits"))
      .select(col("q_id"), col("n_truth"), col("n_hits"),
        round(col("n_hits").cast("double") / col("n_truth"), 6)
          .as("recall"))
      .orderBy(col("q_id"))
  }

  /** IVF ANN recall@k — [[ivfTopK]] scored against [[bruteForceTopK]]
    * ground truth, per probe. The [[annRecallCurve]] run at 10× showed
    * sign-LSH recall collapsing at production widths on near-uniform
    * corpora, with IVF named as the fallback; this harness puts the
    * recall number on that switch (same shape as [[annRecall]], so the
    * two fallback candidates are compared on identical terms). With
    * `nProbe >= nCentroids` IVF scans every cell and recall is exactly
    * 1.0 (spec-pinned) — the knob a 100 TB run turns DOWN from there
    * until recall hits its floor. Rows-only in the registry: the
    * k-means training iterations are not oracle-expressible (the
    * n23/n51 exemption), but the truth side IS the n9 scan shape.
    *
    * Probe alignment: scoreIvf selects the `nProbes` SMALLEST ids
    * (rank-based) where the oracled ANN harnesses use the literal
    * `vec_id < nProbes` — identical on the 0-based fixture ids but NOT
    * on an offset/filtered shard, where the literal form would score
    * the wrong probes (or none, yielding an empty harness instead of a
    * recall number). The truth side here therefore uses the SAME
    * rank-based probe frame as the IVF path (spec-pinned on a shifted-id
    * corpus).
    */
  def ivfRecall(emb: DataFrame, nProbes: Int, k: Int,
                nCentroids: Int = 16, iters: Int = 3,
                nProbe: Int = 2): DataFrame = {
    val e = withNorm(emb)
    val truth = bruteForceTopKFor(e,
      e.orderBy(col("vec_id")).limit(nProbes)
        .select(col("vec_id").as("q_id"), col("emb").as("q_emb"),
          col("nrm").as("q_nrm")), k)
      .select(col("q_id"), col("vec_id"))
    val approx = ivfTopK(emb, nProbes, k, nCentroids, iters, nProbe)
      .select(col("q_id"), col("vec_id"), lit(1).as("hit"))
    truth.join(approx, Seq("q_id", "vec_id"), "left_outer")
      .groupBy(col("q_id"))
      .agg(count(lit(1)).as("n_truth"), count(col("hit")).as("n_hits"))
      .select(col("q_id"), col("n_truth"), col("n_hits"),
        round(col("n_hits").cast("double") / col("n_truth"), 6)
          .as("recall"))
      .orderBy(col("q_id"))
  }

  /** ANN recall@k ACROSS bucket widths — the curve [[annRecall]]'s
    * single-width number sits on, and the evaluation that validates
    * [[deriveBucketBits]] against a target recall floor (not just
    * candidate volume) before a 100 TB run commits to a width.
    *
    * One pass, not one per width: [[rpPlanes]] are width-shared by
    * construction (plane i depends only on (seed, i, dims)), so the
    * width-w bucket is the LOW w BITS of the max-width bucket —
    * `bucket & (2^w − 1)`. The corpus is bucketed ONCE at `widths.max`;
    * the probe side (an eval set — tiny) is exploded per width and
    * broadcast, and candidate generation is one join whose predicate
    * masks the shared bucket, exactly what a per-width re-scan would
    * compute. Truth is [[bruteForceTopK]]'s scan, computed once and
    * shared across all widths. Output: one row per width —
    * (bits, n_truth, n_hits, recall), recall averaged over the whole
    * probe set (n_hits / n_truth).
    */
  def annRecallCurve(emb: DataFrame, nProbes: Int, k: Int,
                     widths: Seq[Int], probeRadius: Int = 0): DataFrame = {
    require(widths.nonEmpty && widths.forall(w => w > 0 && w <= 24),
      s"widths must be 1..24 hyperplanes, got $widths")
    require(probeRadius >= 0 && probeRadius <= 1,
      s"probeRadius 0 (own bucket) or 1 (Hamming-1 multi-probe), got " +
        probeRadius)
    val spark = emb.sparkSession
    import spark.implicits._
    val dims = probeDims(emb)
    val e = emb.select(col("vec_id"),
        col("embedding").cast("array<double>").as("emb"))
      .withColumn("bucket", rpBucket(col("emb"), widths.max, dims))
      .withColumn("nrm", sqrt(dot(col("emb"), col("emb"))))
    val p = e.filter(col("vec_id") < nProbes)
      .select(col("vec_id").as("q_id"), col("emb").as("q_emb"),
        col("nrm").as("q_nrm"), col("bucket").as("q_bucket"))
    val wdf = widths.sorted.map(w => (w, (1 << w) - 1)).toDF("bits", "mask")
    // truth once, shared by every width
    val truth = rankTopK(
      e.crossJoin(broadcast(p)).filter(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"),
          cosOrNull(dot(col("q_emb"), col("emb")), col("q_nrm"), col("nrm"))
            .as("cos")), k)
      .select(col("q_id"), col("vec_id"))
    // candidates: ONE masked-bucket join against the width-exploded
    // broadcast probe set (probes × widths rows — eval-suite sized).
    // probeRadius=1 further explodes each (probe, width) into its own
    // bucket PLUS the `bits` buckets one sign-flip away (multi-probe
    // LSH: a true neighbor straddling one hyperplane is recovered at
    // (bits+1)× the probe rows — still eval-suite sized — instead of
    // being lost to that plane forever)
    val pw0 = p.crossJoin(broadcast(wdf))
    val pw =
      if (probeRadius == 0)
        pw0.withColumn("probe_bucket",
          col("q_bucket").bitwiseAND(col("mask")))
      else
        pw0.withColumn("probe_bucket", explode(array_distinct(concat(
            array(col("q_bucket").bitwiseAND(col("mask"))),
            transform(sequence(lit(0), col("bits") - 1), i =>
              col("q_bucket").bitwiseAND(col("mask"))
                // shiftleft needs a literal count; 2^i is exact ≤ 2^24
                .bitwiseXOR(pow(lit(2d), i).cast("int")))))))
    val approx = e.join(broadcast(pw),
        (col("bucket").bitwiseAND(col("mask")) === col("probe_bucket")) &&
          col("vec_id") =!= col("q_id"))
      .select(col("bits"), col("q_id"), col("vec_id"),
        cosOrNull(dot(col("q_emb"), col("emb")), col("q_nrm"), col("nrm"))
          .as("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bits"), col("q_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    val approxTopK = approx.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("bits"), col("q_id"), col("vec_id"), lit(1).as("hit"))
    truth.crossJoin(broadcast(wdf.select(col("bits"))))
      .join(approxTopK, Seq("bits", "q_id", "vec_id"), "left_outer")
      .groupBy(col("bits"))
      .agg(count(lit(1)).as("n_truth"), count(col("hit")).as("n_hits"))
      .select(col("bits"), col("n_truth"), col("n_hits"),
        round(col("n_hits").cast("double") / col("n_truth"), 6)
          .as("recall"))
      .orderBy(col("bits"))
  }

  /** Production ANN entry point: MEASURE, then choose. Evaluates the
    * derived-width sign-LSH path (multi-probe, [[annRecallCurve]] at
    * probeRadius=1 — the repaired form) against `recallFloor` on the
    * deterministic probe sample every harness in this family shares
    * (the first `nProbes` ids), and falls back to IVF ([[ivfRecall]],
    * same brute-force truth, so the two paths are compared on identical
    * terms) when the floor is unmet. This is the decision the n62/n64/
    * n68/n75 harnesses exist to inform — previously prose in
    * BENCH_NOTES, now executable: sign-LSH when the corpus clusters
    * along the pinned hyperplanes (zero training, corpus never
    * shuffles), IVF when it doesn't (near-uniform corpora collapse
    * sign-LSH recall at production widths; measured 0.02-0.05 vs IVF
    * 0.92+ on the fixtures).
    *
    * One summary row: (chosen_path, measured_recall, recall_floor,
    * lsh_recall, ivf_recall, bits, n_probes, k, n_centroids,
    * n_probe_cells). `ivf_recall` is null when sign-LSH met the floor
    * (the fallback's training never runs — at 100 TB that skip IS the
    * point). Rows-only in the registry: the IVF side carries k-means
    * float iterations (the n23/n51 exemption) and the decision collects
    * two bounded harness aggregates at plan-build time, like every
    * trainer in this family. SimilaritySpec pins the choice both ways:
    * IVF on the near-uniform fixture corpus, sign-LSH on a clustered
    * one.
    */
  def annSelectPath(emb: DataFrame, nProbes: Int, k: Int,
                    recallFloor: Double = 0.8,
                    nCentroids: Int = 16, iters: Int = 3,
                    nProbe: Int = 2): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val bits = deriveBucketBits(emb)
    val lshRecall = annRecallCurve(emb, nProbes, k, Seq(bits), 1)
      .collect().headOption.map(_.getDouble(3)).getOrElse(0.0)
    val lshOk = lshRecall >= recallFloor
    val ivfMeasured: Option[Double] =
      if (lshOk) None
      else {
        val a = ivfRecall(emb, nProbes, k, nCentroids, iters, nProbe)
          .agg(sum(col("n_truth")).as("t"), sum(col("n_hits")).as("h"))
          .head()
        if (a.isNullAt(0) || a.getLong(0) == 0L) Some(0.0)
        else Some(math.rint(a.getLong(1).toDouble / a.getLong(0) * 1e6) / 1e6)
      }
    Seq((
      if (lshOk) "sign-lsh-multiprobe" else "ivf",
      ivfMeasured.getOrElse(lshRecall),
      recallFloor, lshRecall, ivfMeasured,
      bits, nProbes, k, nCentroids, nProbe))
      .toDF("chosen_path", "measured_recall", "recall_floor", "lsh_recall",
        "ivf_recall", "bits", "n_probes", "k", "n_centroids",
        "n_probe_cells")
  }

  /** Semantic decontamination: drop every corpus vector whose cosine
    * against ANY of the first `nProbes` vectors (the benchmark/eval
    * embedding set) reaches `threshold` — the embedding-side member of
    * the decontamination family (n26 whole-doc, n31 n-gram, n35 bloom
    * catch verbatim leaks; this catches paraphrased ones).
    *
    * Scale shape: the probe set is an eval suite — small by
    * construction — so it is collected into ONE row of probe structs,
    * broadcast, and the max-over-probes cosine is computed PER CORPUS
    * ROW with higher-order functions (zip_with dot + array_max over the
    * probe array). Zero shuffle, zero groupBy: a corpus×nProbes
    * pair-then-regroup join would shuffle nProbes copies of a 100 TB
    * scan just to take a per-row max. array_max skips null entries, so
    * zero-norm/null embeddings (cos null against every probe) degrade
    * to a null max and SURVIVE — same keep-on-null convention as
    * [[cosOrNull]], pinned against a join+groupBy twin in
    * SimilaritySpec. An EMPTY probe set contaminates nothing: the whole
    * corpus survives with a null max (the registry oracle's cross-join
    * formulation would return zero rows there — it pins a non-empty
    * probe set, so the engines agree everywhere the gate runs; the
    * operator's keep-all semantics is the intended one).
    */
  def semanticDecontaminate(emb: DataFrame, nProbes: Int,
                            threshold: Double): DataFrame = {
    val e = withNorm(emb)
    val probes = broadcast(e.filter(col("vec_id") < nProbes)
      .agg(collect_list(struct(col("emb").as("q_emb"), col("nrm").as("q_nrm")))
        .as("probes")))
    e.filter(col("vec_id") >= nProbes)
      .crossJoin(probes)
      .select(col("vec_id"), expr(
        """array_max(transform(probes, p ->
          |  CASE WHEN p.q_nrm * nrm <> 0D THEN
          |    round(aggregate(zip_with(p.q_emb, emb, (x, y) -> x * y),
          |      0D, (acc, v) -> acc + v) / (p.q_nrm * nrm), 6)
          |  END))""".stripMargin).as("max_probe_cos"))
      .filter(col("max_probe_cos") < threshold ||
        col("max_probe_cos").isNull)
      .orderBy(col("vec_id"))
  }

  def semanticDedup(emb: DataFrame, threshold: Double,
                    bucketBits: Int = 0): DataFrame = {
    val bits = if (bucketBits > 0) bucketBits else deriveBucketBits(emb)
    semanticDedupWith(emb, threshold,
      rpBucket(col("emb"), bits, probeDims(emb)))
  }

  /** [[semanticDedup]] with EXACT-IDENTICAL-VECTOR PRE-COLLAPSE — the
    * embedding-side twin of the text pipeline's exact-dup collapse
    * (n53): bit-identical embeddings share their sign bucket and every
    * pairwise cosine, so a group of copies is a clique of cos-1 pairs
    * and the one-pass min-id keeper's decisions depend only on the
    * group's REPRESENTATIVE (its min vec_id). Grouping by the embedding
    * array itself (exact equality — no hash-collision risk), running
    * the bucket-blocked pair join over reps only, and expanding gives
    * bit-identical survivors: a non-rep copy always has its rep as a
    * smaller cos-1 neighbor (dropped), and a rep is dropped iff some
    * smaller rep clears the threshold — any smaller raw vector that
    * would drop it belongs to a group whose rep is at least as small
    * and scores the same cosine. SimilaritySpec pins equality; the
    * registry's n54 passes n46's oracle verbatim.
    *
    * Zero-norm and NULL embeddings sit outside the collapse: cosine
    * against either is null, so they never drop and are never dropped —
    * they pass straight to the survivor side, exactly as in the
    * uncollapsed join where the null score fails every threshold.
    *
    * Why it matters at 100 TB: the pair join is Σ bucket², and corpora
    * with duplicated payloads carry bit-identical embeddings (same text
    * → same encoder output), so bucket occupancy — and pair cost — grows
    * with duplication. Collapsed, each distinct vector counts once
    * regardless of its copy count.
    */
  def semanticDedupCollapsed(emb: DataFrame, threshold: Double,
                             bucketBits: Int = 0): DataFrame = {
    val bits = if (bucketBits > 0) bucketBits else deriveBucketBits(emb)
    val cast = emb.select(col("vec_id"),
      col("embedding").cast("array<double>").as("emb"))
    // NULL embeddings (missing or uncastable) ride the same passthrough as
    // zero-norm vectors: their cosine against anything is null, which fails
    // every threshold in the uncollapsed join, so they always survive there
    // — and must survive here too for the documented bit-equality. dot(null)
    // is null, so the groups filter below (null-rejecting =!= 0d) already
    // excludes them; without the isNull arm they'd vanish from BOTH branches.
    val selfDot = dot(col("emb"), col("emb"))
    val zeroNorm = cast.filter(selfDot.isNull || selfDot === 0d)
      .select(col("vec_id"))
    // one shuffle keyed by the vector itself; map-side combine collapses
    // copies per partition before anything moves. Cut: the frame feeds
    // both the rep pair join and the survivor expansion.
    val groups = Checkpoints.cut(
      cast.filter(selfDot =!= 0d)
        .groupBy(col("emb")).agg(min(col("vec_id")).as("rep")))
    val reps = groups.select(col("rep").as("vec_id"), col("emb"))
      .withColumn("bucket", rpBucket(col("emb"), bits, probeDims(emb)))
    val droppedReps = nearDupPairsUnsorted(reps,
        col("a.bucket") === col("b.bucket"), threshold)
      .select(col("id_b").as("vec_id")).distinct()
    val survivorIds = groups.select(col("rep").as("vec_id"))
      .join(droppedReps, Seq("vec_id"), "left_anti")
      .union(zeroNorm)
    emb.select(col("vec_id"), col("label"))
      .join(survivorIds, Seq("vec_id"), "left_semi")
      .orderBy(col("vec_id"))
  }

  /** Semantic near-dup CLUSTERS: connected components over the
    * sign-bucket cosine near-dup graph — cluster labels for embeddings,
    * the embedding-side twin of the text pipeline's n21/n24 (SemDeDup's
    * cluster view, where [[semanticDedup]] is its keep-list view).
    * Reuses the O(log n) large/small-star CC; output is the shared
    * reporting schema (cluster = component-min vec_id, n_docs, members).
    * Zero-norm and null embeddings score null against everything, join
    * no pairs, and appear in no cluster — exactly like edgeless
    * singletons.
    */
  def semanticDupClusters(emb: DataFrame, threshold: Double,
                          bucketBits: Int = 0): DataFrame = {
    val bits = if (bucketBits > 0) bucketBits else deriveBucketBits(emb)
    graft.ops.Dedup.dupClustersLogN(
      lshNearDupPairs(emb, threshold, bits)
        .select(col("id_a").as("doc_a"), col("id_b").as("doc_b")))
  }

  /** [[semanticDupClusters]] with IDENTICAL-VECTOR PRE-COLLAPSE — the
    * n53 move on the embedding cluster view. Identical nonzero vectors
    * share their bucket and every cosine (an exact clique at any
    * threshold ≤ 1), so CC over one representative per distinct vector
    * (the group's min vec_id) plus label expansion reconstructs the
    * uncollapsed components exactly, cluster ids included (component
    * min = min over group reps = min over all members). A copy group
    * whose rep gains no cross-group edge still forms its own cluster
    * when it has ≥ 2 members (pairwise near-dups by identity); zero-norm
    * and null embeddings are excluded before grouping — they pair with
    * nothing, so they must never ride the n>1 fallback into a cluster.
    * SimilaritySpec pins bit-equality with [[semanticDupClusters]]; the
    * registry's n57 passes n56's oracle verbatim.
    */
  def semanticDupClustersCollapsed(emb: DataFrame, threshold: Double,
                                   bucketBits: Int = 0): DataFrame = {
    val bits = if (bucketBits > 0) bucketBits else deriveBucketBits(emb)
    val cast = emb.select(col("vec_id"),
      col("embedding").cast("array<double>").as("emb"))
    val selfDot = dot(col("emb"), col("emb"))
    // one shuffle keyed by the vector itself (exact equality — no
    // hash-collision risk); cut: feeds both the rep pairs and expansion
    val groups = Checkpoints.cut(
      cast.filter(selfDot =!= 0d)
        .groupBy(col("emb"))
        .agg(min(col("vec_id")).as("rep"), count(lit(1)).as("n")))
    val reps = groups.select(col("rep").as("vec_id"), col("emb"))
      .withColumn("bucket", rpBucket(col("emb"), bits, probeDims(emb)))
    val repLabels = graft.ops.Dedup.dupLabelsLogN(
      nearDupPairsUnsorted(reps, col("a.bucket") === col("b.bucket"),
          threshold)
        .select(col("id_a").as("doc_a"), col("id_b").as("doc_b")))
    cast.filter(selfDot =!= 0d).select(col("vec_id"), col("emb"))
      .join(groups, Seq("emb"))
      .join(repLabels.select(col("id").as("rep"), col("cluster")),
        Seq("rep"), "left")
      .select(col("vec_id"),
        coalesce(col("cluster"), when(col("n") > 1, col("rep")))
          .as("cluster"))
      .filter(col("cluster").isNotNull)
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_docs"),
        sort_array(collect_list(col("vec_id"))).as("members"))
      .orderBy(col("cluster"))
  }

  /** Cross-snapshot (incremental) semantic dedup — the embedding-side
    * twin of [[Dedup.incrementalDedup]]'s batch-ingest contract (n49): a
    * NEW vector is dropped when it has a cosine near-dup (≥ `threshold`)
    * in the already-published INDEX, or a smaller-id near-dup within its
    * own batch (the same one-pass min-id keeper as [[semanticDedup]] —
    * with an empty index the two policies coincide). Index vectors
    * always win: they are already published, so a new batch can never
    * evict them. Zero-norm and null embeddings score null against
    * everything and therefore always survive, as everywhere in this
    * family.
    *
    * Scale shape: both drop decisions are bucket equi-joins. The index
    * check BROADCASTS the batch and streams the index through one
    * map-side hash join — the index (the 100 TB side) is scanned once
    * and NEVER shuffles; only matched new ids (≤ batch-sized) leave the
    * scan, distinct-reduced before the anti join. The batch check is
    * the Σ bucket² pair join over the BATCH alone. This assumes a batch
    * bounded by broadcast size (the ingest contract — batches are small
    * next to the corpus; for a corpus-sized "batch" run [[semanticDedup]]
    * over the union instead). Bucket width derives from the INDEX
    * unless pinned; dims probe from the batch so an empty index still
    * plans.
    */
  def incrementalSemanticDedup(newEmb: DataFrame, index: DataFrame,
                               threshold: Double,
                               bucketBits: Int = 0): DataFrame = {
    val bits = if (bucketBits > 0) bucketBits else deriveBucketBits(index)
    val dims = probeDims(newEmb)
    def prep(df: DataFrame) = df
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      .withColumn("bucket", rpBucket(col("emb"), bits, dims))
      .withColumn("nrm", sqrt(dot(col("emb"), col("emb"))))
    val nw = prep(newEmb)
    val ix = prep(index)
    val droppedByIndex = ix.as("b").join(broadcast(nw.as("a")),
        col("a.bucket") === col("b.bucket") &&
          cosOrNull(dot(col("a.emb"), col("b.emb")),
            col("a.nrm"), col("b.nrm")) >= threshold)
      .select(col("a.vec_id").as("vec_id")).distinct()
    val droppedInBatch = nearDupPairsUnsorted(
        nw.select(col("vec_id"), col("emb"), col("bucket")),
        col("a.bucket") === col("b.bucket"), threshold)
      .select(col("id_b").as("vec_id")).distinct()
    newEmb.select(col("vec_id"), col("label"))
      .join(droppedByIndex, Seq("vec_id"), "left_anti")
      .join(droppedInBatch, Seq("vec_id"), "left_anti")
      .orderBy(col("vec_id"))
  }

  /** [[semanticDedup]] with an explicit bucket expression over the
    * double `emb` column (spec seam, like [[lshNearDupPairsWith]]).
    */
  private[graft] def semanticDedupWith(emb: DataFrame, threshold: Double,
                                       bucket: Column): DataFrame = {
    val dropped = nearDupPairsUnsorted(
        emb.select(col("vec_id"),
            col("embedding").cast("array<double>").as("emb"))
          .withColumn("bucket", bucket),
        col("a.bucket") === col("b.bucket"), threshold)
      .select(col("id_b").as("vec_id")).distinct()
    emb.select(col("vec_id"), col("label"))
      .join(dropped, Seq("vec_id"), "left_anti")
      .orderBy(col("vec_id"))
  }
}
