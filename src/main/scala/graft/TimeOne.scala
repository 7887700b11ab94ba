package graft
object TimeOne {
  def main(args: Array[String]): Unit = {
    // env-tunable so scale probes can size partitions to the data —
    // a fixed partition count at a high multiplier measures spill, not
    // the operator (partitions-per-byte is what a real cluster holds
    // constant as data grows)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]").config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    // comma-separated names time a whole family in one JVM (per-name
    // passes stay labeled, so RUN1-vs-RUN2+ still separates one-time
    // cost — stage builds, codegen — from steady-state operator cost)
    for (name <- args(0).split(',')) {
      val fn = Queries.queries(name)
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        fn(spark, dir).queryExecution.toRdd.count()
        println(s"$name RUN$i=${(System.nanoTime() - t0) / 1e9}")
      }
    }
    spark.stop()
  }
}
