package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, functions}

/** Elementwise (min, max) of array<double> columns as ONE aggregate —
  * the stats pass of scalar (int8) embedding quantization.
  *
  * Same scale rationale as [[VectorSum]]: the compositional form
  * (posexplode → groupBy(dim) min/max) shuffles corpus × dims rows; this
  * keeps one (mins, maxs) buffer pair per partition regardless of
  * dimensionality and shuffles exactly two arrays per partition.
  *
  * Null/empty inputs are ignored; mixing non-empty lengths in one group
  * fails fast (truncating would corrupt the range).
  */
class VectorMinMax
    extends Aggregator[Seq[Double], (Array[Double], Array[Double]),
      (Seq[Double], Seq[Double])] {

  override def zero: (Array[Double], Array[Double]) =
    (Array.emptyDoubleArray, Array.emptyDoubleArray)

  private def requireSameLength(a: Int, b: Int): Unit =
    require(a == b,
      s"VectorMinMax: mixed vector lengths in one group ($a vs $b)")

  override def reduce(buf: (Array[Double], Array[Double]),
                      in: Seq[Double]): (Array[Double], Array[Double]) = {
    if (in == null || in.isEmpty) buf
    else if (buf._1.isEmpty) {
      val mn = new Array[Double](in.length)
      val mx = new Array[Double](in.length)
      var i = 0
      while (i < in.length) { mn(i) = in(i); mx(i) = in(i); i += 1 }
      (mn, mx)
    } else {
      requireSameLength(buf._1.length, in.length)
      var i = 0
      while (i < in.length) {
        if (in(i) < buf._1(i)) buf._1(i) = in(i)
        if (in(i) > buf._2(i)) buf._2(i) = in(i)
        i += 1
      }
      buf
    }
  }

  override def merge(a: (Array[Double], Array[Double]),
                     b: (Array[Double], Array[Double])): (Array[Double], Array[Double]) =
    if (a._1.isEmpty) b
    else if (b._1.isEmpty) a
    else {
      requireSameLength(a._1.length, b._1.length)
      var i = 0
      while (i < a._1.length) {
        if (b._1(i) < a._1(i)) a._1(i) = b._1(i)
        if (b._2(i) > a._2(i)) a._2(i) = b._2(i)
        i += 1
      }
      a
    }

  // empty-in → empty-out (a null tuple would violate the encoder's
  // non-nullable top-level Product contract)
  override def finish(r: (Array[Double], Array[Double])): (Seq[Double], Seq[Double]) =
    (r._1.toSeq, r._2.toSeq)

  override def bufferEncoder: Encoder[(Array[Double], Array[Double])] =
    ExpressionEncoder[(Array[Double], Array[Double])]()

  override def outputEncoder: Encoder[(Seq[Double], Seq[Double])] =
    ExpressionEncoder[(Seq[Double], Seq[Double])]()
}

object VectorMinMax {
  /** Column-function form: one struct of (mins `_1`, maxs `_2`). */
  val vecMinMax: org.apache.spark.sql.expressions.UserDefinedFunction =
    functions.udaf(new VectorMinMax)
}
