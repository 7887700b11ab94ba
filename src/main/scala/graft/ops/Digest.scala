package graft.ops

import java.security.MessageDigest

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Order-insensitive collection digest + date-key extraction.
  *
  * Reference semantics (SURVEY §2.4 G1/G2, /root/reference/utils.py:7-21):
  *   - `hash_list(l)` = MD5 hex digest of the concatenation of `str(x)` for
  *     `x` in `sorted(l)` — i.e. an order-insensitive digest of a collection.
  *   - `extract_date_from_log_file_name(name)` = first `\d{4}-\d{2}-\d{2}`
  *     match, or the literal `'unknown'` when absent.
  *
  * Two implementations of the digest are provided and property-tested equal:
  *   1. `hashListExpr` — pure built-ins (collect_list → sort_array →
  *      array_join → md5); whole plan stays in codegen, partial aggregation
  *      (map-side collect) is automatic.
  *   2. `HashListAgg` — a typed [[Aggregator]] doing a single-pass buffer
  *      append with sort-at-finish, for use where the collected list would
  *      be large and the expression form's intermediate array is unwanted.
  * Both shuffle exactly once on the grouping key; buffers are bounded by
  * group size (log-file names per day ≤ 24 in the reference's data model),
  * so this holds at 100 TB as long as group cardinality stays bounded.
  */
object Digest {

  /** Compositional digest over a (string-typed) column within a groupBy. */
  def hashListExpr(c: Column): Column =
    md5(array_join(sort_array(collect_list(c.cast("string"))), ""))

  /** Date key with `'unknown'` fallback — utils.py:14-21 exactly. */
  def extractDate(c: Column): Column = {
    val m = regexp_extract(c, "(\\d{4}-\\d{2}-\\d{2})", 1)
    when(m === "", lit("unknown")).otherwise(m)
  }

  private def md5Hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** Single-pass typed aggregator twin of [[hashListExpr]]. */
  object HashListAgg extends Aggregator[String, List[String], String] {
    override def zero: List[String] = Nil
    override def reduce(b: List[String], a: String): List[String] =
      if (a == null) b else a :: b
    override def merge(b1: List[String], b2: List[String]): List[String] =
      b1 ::: b2
    override def finish(b: List[String]): String = md5Hex(b.sorted.mkString)
    override def bufferEncoder: Encoder[List[String]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[String]]()
    override def outputEncoder: Encoder[String] = Encoders.STRING
  }

  /** `hash_list` as a usable Column aggregate (udaf registration). */
  val hashListUdaf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(HashListAgg, Encoders.STRING)
}
