package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.graftbridge.Bridge

/** SQL registration for the custom Catalyst expressions, so `spark.sql`
  * users get the same surface as the DataFrame API:
  *
  * {{{
  *   graft.functions.Register(spark)
  *   spark.sql("SELECT dot_product(a, b) FROM vecs")
  *   spark.sql("SELECT minhash_signature(text, 8) FROM docs")
  *   spark.sql("SELECT parse_log_line(line).level FROM logs")
  *   spark.sql("SELECT winnow_fingerprints(text, 8, 4) FROM docs")
  * }}}
  */
object Register {
  def apply(spark: SparkSession): Unit = {
    Bridge.registerFunction(spark, "dot_product",
      es => DotProduct(es(0), es(1)))
    Bridge.registerFunction(spark, "minhash_signature",
      es => MinHashSignature(es(0), Bridge.intLiteral(es(1))))
    Bridge.registerFunction(spark, "minhash_signature_fast",
      es => MinHashSignatureFast(es(0), Bridge.intLiteral(es(1))))
    Bridge.registerFunction(spark, "parse_log_line",
      es => ParseLogLine(es(0)))
    Bridge.registerFunction(spark, "winnow_fingerprints",
      es => WinnowFingerprints(es(0), Bridge.intLiteral(es(1)),
        Bridge.intLiteral(es(2))))
  }
}
