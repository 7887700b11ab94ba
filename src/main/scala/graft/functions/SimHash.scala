package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UserDefinedExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 32-bit SimHash of a text column in ONE per-row pass — no word
  * explosion, no shuffle.
  *
  * Semantics (bit-identical to the explode → groupBy compositional form
  * and the DuckDB oracle): words are the single-space split of the text
  * (limit -1 — empty tokens, including trailing ones, all count); per
  * word, `h` is the first 8 md5 hex chars as an unsigned 32-bit value
  * (`conv(substring(md5(w), 1, 8), 16, 10)`); signature bit i is set iff
  * `Σ_words (2·bit_i(h) − 1) > 0`.
  *
  * Why custom (SURVEY preference order (b)): the compositional form
  * shuffles docs × words rows and runs 32 sum aggregates per doc; this
  * is a map-side O(words) loop per row with zero shuffle — at 100 TB the
  * signature costs exactly one pass over the text bytes.
  */
case class SimHash32(child: Expression)
    extends UnaryExpression with UserDefinedExpression {

  override def name: String = prettyName

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash32"

  override def nullSafeEval(input: Any): Any =
    doSimhash(input.asInstanceOf[UTF8String])

  def doSimhash(input: UTF8String): Long = {
    val bytes = input.getBytes
    val starts = TokenBoundaries.scan(bytes)
    val tokens = starts.length - 1
    val md = MinHashSignature.md5Local.get()
    val counts = new Array[Int](32)
    var k = 0
    while (k < tokens) {
      val from = starts(k)
      val len = starts(k + 1) - 1 - from
      md.update(bytes, from, len)
      val d = md.digest() // also resets for the next word
      // first 8 hex chars = first 4 digest bytes, big-endian unsigned
      val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      var i = 0
      while (i < 32) {
        counts(i) += (((h >>> i) & 1L).toInt << 1) - 1
        i += 1
      }
      k += 1
    }
    var sig = 0L
    var i = 0
    while (i < 32) {
      if (counts(i) > 0) sig |= 1L << i
      i += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simhash", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.doSimhash($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 60-bit SimHash — the WIDE variant the pigeonhole dedup index needs
  * at corpus scale: block-index candidate volume is Θ(n² / 2^blockBits)
  * per block, so block width must grow with log₂(corpus) to keep
  * bucket sizes O(1) — 32 bits / 8-bit blocks saturate around 10⁴ docs
  * (measured in BENCH_NOTES), 60 bits / 15-bit blocks push the knee
  * out by 2⁷ per block. 60 and not 64 so the whole signature parses
  * from 15 md5 hex chars as a plain BIGINT in any engine — the oracle
  * recomputes it with `('0x' || substring(md5(w), 1, 15))::bigint`.
  * Per-word h = first 15 hex chars big-endian (digest bytes 0-6 plus
  * the high nibble of byte 7); bit rule identical to [[SimHash32]].
  */
case class SimHash60(child: Expression)
    extends UnaryExpression with UserDefinedExpression {

  override def name: String = prettyName

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash60"

  override def nullSafeEval(input: Any): Any =
    doSimhash(input.asInstanceOf[UTF8String])

  def doSimhash(input: UTF8String): Long = {
    val bytes = input.getBytes
    val starts = TokenBoundaries.scan(bytes)
    val tokens = starts.length - 1
    val md = MinHashSignature.md5Local.get()
    val counts = new Array[Int](60)
    var k = 0
    while (k < tokens) {
      val from = starts(k)
      val len = starts(k + 1) - 1 - from
      md.update(bytes, from, len)
      val d = md.digest() // also resets for the next word
      // first 15 hex chars = digest bytes 0-6 + the HIGH nibble of
      // byte 7, big-endian — exactly what the SQL substring parses
      var v = 0L
      var b = 0
      while (b < 7) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
      val h = (v << 4) | ((d(7) >> 4) & 0xfL)
      var i = 0
      while (i < 60) {
        counts(i) += (((h >>> i) & 1L).toInt << 1) - 1
        i += 1
      }
      k += 1
    }
    var sig = 0L
    var i = 0
    while (i < 60) {
      if (counts(i) > 0) sig |= 1L << i
      i += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simhash", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.doSimhash($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash {
  /** 32-bit SimHash of a text column; null for null text (the explode
    * form drops those rows — callers filter).
    */
  def simhash32(text: Column): Column =
    Bridge.column(SimHash32(Bridge.expression(text)))

  /** 60-bit SimHash (see [[SimHash60]]); null for null text. */
  def simhash60(text: Column): Column =
    Bridge.column(SimHash60(Bridge.expression(text)))
}
