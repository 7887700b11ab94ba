package graft

import graft.functions.Register

/** SQL-registered custom functions behave like their Column twins. */
class RegisterSpec extends SparkSpec {
  import spark.implicits._

  test("custom expressions callable from spark.sql") {
    Register(spark)
    Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b")
      .createOrReplaceTempView("vecs")
    assert(spark.sql("SELECT dot_product(a, b) FROM vecs")
      .head().getDouble(0) === 11.0)

    Seq("the quick brown fox jumps").toDF("text")
      .createOrReplaceTempView("docs_v")
    val sig = spark.sql("SELECT minhash_signature(text, 8) AS s FROM docs_v")
      .head().getAs[scala.collection.Seq[String]]("s")
    assert(sig.length === 8 && sig.forall(_.length === 32))

    Seq("2019-04-01 10:02:03 UTC:10.0.0.5(51234):app@prod:[12345]:LOG:  duration: 1.50 ms  statement: SELECT 1")
      .toDF("line").createOrReplaceTempView("logs_v")
    val r = spark.sql(
      "SELECT parse_log_line(line).level AS l, parse_log_line(line).duration_ms AS d FROM logs_v")
      .head()
    assert(r.getString(0) === "LOG" && r.getDouble(1) === 1.5)

    val fps = spark.sql(
      "SELECT winnow_fingerprints(text, 8, 4) AS f FROM docs_v")
      .head().getAs[scala.collection.Seq[Long]]("f")
    assert(fps.nonEmpty)
  }
}
