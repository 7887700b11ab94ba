package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** The 100 TB-path twin of [[MinHashSignature]]: xxhash64 (long) instead of
  * md5-hex (string) — ~10× cheaper per shingle, 8 bytes of signature per
  * seed instead of 32 hex chars. Engine-specific hash → checked rows-only.
  *
  * For seed `s`, element `s` is `min(xxh64(shingle_bytes, seed = s))` over
  * the 3-word shingles. Same per-row zero-shuffle shape as the md5 form.
  */
case class MinHashSignatureFast(child: Expression, numSeeds: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature_fast"

  override def nullSafeEval(input: Any): Any = {
    // limit -1 keeps trailing empty tokens — see MinHashSignature
    val words = input.toString.split(" ", -1)
    if (words.length < 3) return null
    val mins = Array.fill[Long](numSeeds)(Long.MaxValue)
    var i = 0
    while (i + 2 < words.length) {
      val sh = UTF8String.fromString(
        words(i) + " " + words(i + 1) + " " + words(i + 2))
      val base = sh.getBaseObject
      val off = sh.getBaseOffset
      val len = sh.numBytes()
      var s = 0
      while (s < numSeeds) {
        val h = XXH64.hashUnsafeBytes(base, off, len, s.toLong)
        if (h < mins(s)) mins(s) = h
        s += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(m => java.lang.Long.valueOf(m): Any))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashFast {
  def signature(text: Column, numSeeds: Int): Column =
    Bridge.column(MinHashSignatureFast(Bridge.expression(text), numSeeds))
}
