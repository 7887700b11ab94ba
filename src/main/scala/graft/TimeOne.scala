package graft
object TimeOne {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val fn = Queries.queries(args(0))
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      fn(spark, dir).queryExecution.toRdd.count()
      println(s"RUN$i=${(System.nanoTime() - t0) / 1e9}")
    }
    spark.stop()
  }
}
