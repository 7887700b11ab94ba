package graft

// scratch instrumentation for the CC trio — delete before round end
object CcProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    import org.apache.spark.sql.functions._
    val docs = graft.ops.Tables.documents(spark, dir)
    var t0 = System.nanoTime()
    def lap(tag: String): Unit = {
      println(f"LAP $tag ${(System.nanoTime() - t0) / 1e9}%.2f")
      t0 = System.nanoTime()
    }
    val pairs = graft.ops.Dedup.lshCandidatePairs(docs)
    pairs.queryExecution.toRdd.count()
    lap("upstream pairs")
    val edges = graft.ops.Checkpoints.cut(
      pairs.select(col("doc_a").as("u"), col("doc_b").as("v")))
    lap("edges cut")
    println("EDGES parts=" + edges.rdd.getNumPartitions)
    graft.ops.Dedup.dupClusters(pairs).queryExecution.toRdd.count()
    lap("dupClusters total")
    graft.ops.Dedup.dupClustersLogN(pairs).queryExecution.toRdd.count()
    lap("dupClustersLogN total")
    spark.stop()
  }
}
