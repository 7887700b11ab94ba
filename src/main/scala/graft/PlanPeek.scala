package graft

/** Dev utility: print the executed physical plan of one registry query at
  * sf0.001 (`sbt "runMain graft.PlanPeek n26_decontamination"`). Used to
  * audit exchange/codegen shape while tuning; PlanSpec pins the invariants.
  */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(Queries.queries(args(0))(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString)
    spark.stop()
  }
}
