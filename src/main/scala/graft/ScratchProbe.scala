package graft
// scratch diagnostic — not committed
object ScratchProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]").config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    val sc = spark.sparkContext
    sc.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val names = args(0).split(',')
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    for (i <- 1 to reps; name <- names) {
      val t0 = System.nanoTime()
      Queries.queries(name)(spark, dir).queryExecution.toRdd.count()
      val dt = (System.nanoTime() - t0) / 1e9
      val rdds = sc.getPersistentRDDs
      val storage = sc.getRDDStorageInfo
      val mem = storage.map(_.memSize).sum / 1e6
      val dsk = storage.map(_.diskSize).sum / 1e6
      val heapUsed = (Runtime.getRuntime.totalMemory - Runtime.getRuntime.freeMemory) / 1e6
      println(f"PROBE $name rep=$i t=$dt%.2f persistedRdds=${rdds.size} storMB=$mem%.0f diskMB=$dsk%.0f heapMB=$heapUsed%.0f")
    }
    spark.stop()
  }
}
