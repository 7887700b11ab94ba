package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Sink semantics mirroring the reference's targets (SURVEY §2.1 S5-S7).
  *
  * The reference writes each artifact to `data/{db}/{file}` /
  * `reports/{db}/{file}.html` via Luigi `LocalTarget.temporary_path()` —
  * write-to-temp then atomic rename (/root/reference/rds_pgbadger.py:44-49)
  * — and *skips* any task whose target already exists (Luigi memoization of
  * `output()`, :25-26,70-71). The Spark equivalents:
  *
  *   - atomicity: Spark's FileOutputCommitter already stages every write
  *     under `_temporary/` and renames on commit — same contract, free;
  *   - memoization / idempotence: `SaveMode.Ignore` per path, or dynamic
  *     partition overwrite for per-partition re-runs (re-running one hour
  *     replaces exactly that hour's partition, never the whole table);
  *   - the S3 copy (rds_pgbadger.py:25-31) is the same `write` against an
  *     `s3a://` URI — auth/credentials belong to the cluster's Hadoop
  *     conf, exactly as SigV4 signing was the AWS SDK's job.
  */
object Sinks {

  /** Luigi-style memoized write: no-op if the target already exists. */
  def writeIfAbsent(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Ignore).parquet(path)

  /** Deterministic model-cache location for a model trained off a corpus
    * table: keyed by the table's path and a fingerprint of its file
    * listing, so a data refresh re-trains and an unchanged corpus reuses
    * the persisted model. This is the train-once/score-many seam — pair
    * with [[materializeModel]] (in production the base would be a
    * warehouse path, not the local tmpdir).
    *
    * For a directory-shaped table the fingerprint covers every data
    * file's (name, length, mtime) — a single directory status would not
    * do: directory length is meaningless (0 on HDFS) and its mtime only
    * moves when entries are added/removed, so an in-place rewrite of one
    * part file would silently reuse a stale model. The remaining honest
    * gap is a same-length same-mtime-tick content rewrite; tables with
    * real change tracking (snapshot ids) should key on that instead.
    */
  def modelPath(spark: org.apache.spark.sql.SparkSession,
                corpusTable: String, modelName: String): String = {
    val p = new org.apache.hadoop.fs.Path(corpusTable)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val st = fs.getFileStatus(p)
    val entries =
      if (!st.isDirectory) Seq(s"${st.getLen}|${st.getModificationTime}")
      else fs.listStatus(p).toSeq
        .filterNot(_.getPath.getName.startsWith("_")) // commit markers churn
        .map(s => s"${s.getPath.getName}|${s.getLen}|${s.getModificationTime}")
        .sorted
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest((s"${p.toUri}" +: entries).mkString("\n").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    s"${sys.props("java.io.tmpdir")}/graft_models/${modelName}_$key"
  }

  /** Train-once/score-many: return the model persisted at `path`,
    * training and publishing it first only if absent. The existence
    * check comes BEFORE `train` is evaluated — training may do eager
    * driver-side work (k-means collect loops), which `SaveMode.Ignore`
    * alone cannot skip (it elides the write job, not the argument);
    * the write itself stays [[writeIfAbsent]] so concurrent trainers
    * race to a single winner.
    */
  def materializeModel(spark: org.apache.spark.sql.SparkSession,
                       path: String)(train: => DataFrame): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) writeIfAbsent(train, path)
    spark.read.parquet(path)
  }

  /** Globally key-clustered write: range-repartition then sort within
    * partitions, so every output file covers a disjoint key range and
    * parquet min/max row-group stats prune point/range reads — the
    * sorted-layout half of the bucketing story.
    */
  def writeClusteredBy(df: DataFrame, keyCol: String, numFiles: Int,
                       path: String): Unit =
    df.repartitionByRange(numFiles, col(keyCol))
      .sortWithinPartitions(col(keyCol))
      .write.mode(SaveMode.Overwrite).parquet(path)

  /** Small-file compaction: rewrite a parquet directory into
    * `targetFiles` files (the operational fix for accumulating tiny
    * micro-batch outputs — at scale, run per partition with dynamic
    * overwrite so history is untouched).
    *
    * Consistency contract: the rename-swap assumes single-writer and
    * NO concurrent readers — the table path is briefly absent between the
    * two renames, and a crash in that window leaves the data at
    * `_precompact` (recover by renaming it back). On object stores (s3a)
    * "rename" is a non-atomic copy+delete, widening that window to the
    * copy duration; for concurrently-read tables on object stores use a
    * versioned directory + pointer file (or a table format with atomic
    * commits) instead of this swap.
    */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
              targetFiles: Int): Unit = {
    val tmp = new org.apache.hadoop.fs.Path(path + "_compacting")
    val old = new org.apache.hadoop.fs.Path(path + "_precompact")
    val dst = new org.apache.hadoop.fs.Path(path)
    // the path's own filesystem (s3a/hdfs/local), not the default FS
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    spark.read.parquet(path).repartition(targetFiles)
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    // swap via renames so a crash never leaves the table missing: the old
    // data stays readable (at dst or at _precompact) until the new copy is
    // in place; only then is the backup removed
    fs.delete(old, true)
    require(fs.rename(dst, old), s"compact: could not stash $dst")
    if (!fs.rename(tmp, dst)) { // restore on failure
      fs.rename(old, dst)
      throw new java.io.IOException(s"compact: rename into $dst failed")
    }
    fs.delete(old, true)
  }

  /** Re-runnable partitioned write: overwrites only the partitions present
    * in `df` (the hour being re-processed), leaves the rest of the table
    * untouched. This is the 100 TB-safe idempotence story: a failed hourly
    * job re-runs without rewriting history.
    */
  def writePartitionedByDay(df: DataFrame, tsCol: String, path: String): Unit = {
    val spark = df.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    df.withColumn("p_day", date_format(col(tsCol), "yyyy-MM-dd"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("p_day")
      .parquet(path)
  }

  /** Luigi-style memoized ATOMIC string artifact (the reference's
    * `LocalTarget.temporary_path()` + rename for its HTML reports,
    * rds_pgbadger.py:44-49, with the exists-check memoization of
    * :25-26,70-71): no-op returning false if `path` exists, else write
    * to a sibling temp file and rename into place. Goes through the
    * path's own Hadoop FileSystem so the same call publishes to local
    * disk, HDFS, or s3a (where "rename" is the store's copy semantics,
    * exactly like the reference's boto upload).
    */
  def writeStringIfAbsent(spark: org.apache.spark.sql.SparkSession,
                          path: String, content: String): Boolean = {
    val dst = new org.apache.hadoop.fs.Path(path)
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(dst)) false
    else {
      val tmp = new org.apache.hadoop.fs.Path(
        dst.getParent, s".${dst.getName}.tmp-${System.nanoTime()}")
      // any failure between create and rename must remove the uniquely-
      // named temp, or every retry leaks another one into the output dir
      try {
        val out = fs.create(tmp, true)
        try out.write(content.getBytes("UTF-8")) finally out.close()
        if (!fs.rename(tmp, dst)) {
          fs.delete(tmp, false)
          // a concurrent writer won the rename — the artifact exists, which
          // is exactly the memoized outcome
          if (!fs.exists(dst))
            throw new java.io.IOException(s"could not publish $dst")
          false
        } else true
      } catch {
        case e: Throwable =>
          try fs.delete(tmp, false) catch { case _: Exception => () }
          throw e
      }
    }
  }
}
