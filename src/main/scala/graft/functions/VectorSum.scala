package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, functions}

/** Elementwise sum of array<double> columns as ONE aggregate.
  *
  * The naive centroid update — `array(avg(emb[1]), avg(emb[2]), …)` — is one
  * Catalyst aggregate expression PER DIMENSION: at 1024-dim embeddings that
  * is 1024 aggregate buffers per group and a generated method far past the
  * JIT/codegen limits. This Aggregator keeps one mutable double-array buffer
  * per group regardless of dimensionality, participates in partial (map-side)
  * aggregation like any other agg, and shuffles exactly one array per
  * (partition, group).
  *
  * Mean = `transform(vecSum(emb), x -> x / n)` with a single count — one
  * divide after the merge instead of per-dimension averages.
  *
  * Null/empty inputs are ignored; mixing non-empty lengths in one group
  * fails fast — silently truncating to the shorter vector would corrupt
  * the sum.
  */
class VectorSum extends Aggregator[Seq[Double], Array[Double], Seq[Double]] {

  override def zero: Array[Double] = Array.emptyDoubleArray

  private def requireSameLength(a: Int, b: Int): Unit =
    require(a == b,
      s"VectorSum: mixed vector lengths in one group ($a vs $b)")

  override def reduce(buf: Array[Double], in: Seq[Double]): Array[Double] = {
    if (in == null || in.isEmpty) buf
    else if (buf.isEmpty) {
      val r = new Array[Double](in.length)
      var i = 0
      while (i < in.length) { r(i) = in(i); i += 1 }
      r
    } else {
      requireSameLength(buf.length, in.length)
      var i = 0
      while (i < buf.length) { buf(i) += in(i); i += 1 }
      buf
    }
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] =
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else {
      requireSameLength(a.length, b.length)
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

  override def finish(r: Array[Double]): Seq[Double] =
    if (r.isEmpty) null else r.toSeq

  override def bufferEncoder: Encoder[Array[Double]] =
    ExpressionEncoder[Array[Double]]()

  override def outputEncoder: Encoder[Seq[Double]] =
    ExpressionEncoder[Seq[Double]]()
}

object VectorSum {
  /** Column-function form: `vecSum(col("emb"))`. */
  val vecSum: org.apache.spark.sql.expressions.UserDefinedFunction =
    functions.udaf(new VectorSum)
}
