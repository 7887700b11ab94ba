package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UserDefinedExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
  * algorithm): Rabin-Karp rolling hash over character k-grams, then keep
  * the minimum hash of each sliding window of `w` consecutive k-gram
  * hashes (rightmost on ties), deduplicated in first-selection order.
  *
  * Guarantees: any shared substring of length ≥ w + k − 1 between two
  * documents yields at least one shared fingerprint — the standard
  * near-dup / plagiarism detection primitive. Per-row, zero shuffle;
  * matching docs are found by exploding fingerprints and grouping, which
  * shuffles only (fingerprint, doc_id) pairs.
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression with UserDefinedExpression {

  override def name: String = prettyName

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"

  private val Base = 1000003L

  override def nullSafeEval(input: Any): Any =
    doWinnow(input.asInstanceOf[UTF8String])

  def doWinnow(input: UTF8String): GenericArrayData = {
    // k-grams are CODE POINTS, not UTF-16 units — the DuckDB oracle twin
    // hashes ord(substr(...)) over code points, and astral-plane text
    // (emoji) would otherwise count and hash differently on the two sides
    val cps = input.toString.codePoints().toArray
    if (cps.length < k) return new GenericArrayData(Array.empty[Any])
    val n = cps.length - k + 1
    val hashes = new Array[Long](n)
    // Rabin-Karp mod 2^64 (natural Long wraparound — the rolling identity
    // h_{i+1} = (h_i - s[i]·B^{k-1})·B + s[i+k] holds exactly under
    // wrapping arithmetic); "min" compares unsigned for determinism.
    var pow = 1L
    var j = 1
    while (j < k) { pow *= Base; j += 1 }
    var h = 0L
    var i = 0
    while (i < k) { h = h * Base + cps(i); i += 1 }
    hashes(0) = h
    i = 1
    while (i < n) {
      h = (h - cps(i - 1) * pow) * Base + cps(i + k - 1)
      hashes(i) = h
      i += 1
    }
    def leq(a: Long, b: Long) = java.lang.Long.compareUnsigned(a, b) <= 0
    // winnow: min of each window of w hashes, rightmost min on ties
    val out = scala.collection.mutable.LinkedHashSet.empty[Long]
    if (n <= w) {
      var m = 0
      i = 1
      while (i < n) { if (leq(hashes(i), hashes(m))) m = i; i += 1 }
      out += hashes(m)
    } else {
      var start = 0
      while (start + w <= n) {
        var m = start
        i = start + 1
        while (i < start + w) { if (leq(hashes(i), hashes(m))) m = i; i += 1 }
        out += hashes(m)
        start += 1
      }
    }
    new GenericArrayData(out.toArray.map(java.lang.Long.valueOf(_): Any))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("winnow", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) " +
        s"$ref.doWinnow($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Winnow {
  /** MOSS-style fingerprints: k-gram length `k`, window `w`. */
  def fingerprints(text: Column, k: Int = 8, w: Int = 4): Column =
    Bridge.column(WinnowFingerprints(Bridge.expression(text), k, w))
}
