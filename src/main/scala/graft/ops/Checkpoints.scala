package graft.ops

import org.apache.spark.sql.DataFrame

/** Lineage truncation for iterative operators (connected components,
  * k-means): every round must cut the plan or the lineage (and the
  * re-execution cost of a lost partition) grows without bound.
  *
  * Two modes, selected by the session conf `spark.graft.checkpoint.reliable`:
  *
  *   - default (false): `localCheckpoint` — blocks live in executor
  *     block-manager memory/disk. Fastest, but a lost executor loses the
  *     blocks AND the truncated lineage — fine single-JVM (local[n]),
  *     lossy on a real cluster.
  *   - `true`: reliable `checkpoint()` to the checkpoint dir (HDFS/object
  *     store on a cluster) — survives executor loss; the 100 TB setting.
  *     If no checkpoint dir is configured a temp dir is set (tests /
  *     local runs); production should point
  *     `SparkContext.setCheckpointDir` at durable storage.
  */
object Checkpoints {

  val ReliableConf = "spark.graft.checkpoint.reliable"

  /** Materialize `df` and truncate its lineage per the session's mode. */
  def cut(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val reliable =
      spark.conf.getOption(ReliableConf).exists(_.trim.equalsIgnoreCase("true"))
    if (reliable) {
      val sc = spark.sparkContext
      if (sc.getCheckpointDir.isEmpty)
        sc.setCheckpointDir(
          java.nio.file.Files.createTempDirectory("graft_ckpt").toString)
      df.checkpoint(eager = true)
    } else df.localCheckpoint(eager = true)
  }
}
