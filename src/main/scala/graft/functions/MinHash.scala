package graft.functions

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All `numSeeds` MinHash values of a text column in ONE per-row pass —
  * no shingle explosion, no shuffle.
  *
  * Semantics (bit-identical to the compositional form and the DuckDB
  * oracle): shingles are 3-word windows of the space-split text; for seed
  * `s`, the signature element is `min(md5(s || "|" || shingle))` as a
  * lowercase hex string (lexicographic min = binary min on hex). Texts
  * with < 3 words yield null (the explode-based form drops them).
  *
  * Why custom (SURVEY preference order (b)): built-ins express this only
  * as explode(shingles) × seeds → groupBy(min), which at 100 TB shuffles
  * docs×shingles×seeds rows and walks interpreted higher-order lambdas;
  * this expression is a map-side O(shingles×seeds) loop per row with zero
  * shuffle. CodegenFallback is fine — the cost is the MD5 loop itself,
  * not the per-row call.
  */
case class MinHashSignature(child: Expression, numSeeds: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  private val hexDigits = "0123456789abcdef".toCharArray

  private def hex(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      out(2 * i) = hexDigits((bytes(i) >> 4) & 0xf)
      out(2 * i + 1) = hexDigits(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  override def nullSafeEval(input: Any): Any = {
    // limit -1 keeps trailing empty tokens — matches Spark SQL split()
    // and DuckDB string_split (Scala's split(Char) drops them)
    val words = input.toString.split(" ", -1)
    if (words.length < 3) return null
    val md = MessageDigest.getInstance("MD5")
    val mins = new Array[String](numSeeds)
    var i = 0
    while (i + 2 < words.length) {
      val sh = words(i) + " " + words(i + 1) + " " + words(i + 2)
      var s = 0
      while (s < numSeeds) {
        md.reset()
        val h = hex(md.digest((s.toString + "|" + sh).getBytes(UTF_8)))
        if (mins(s) == null || h.compareTo(mins(s)) < 0) mins(s) = h
        s += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(m => UTF8String.fromString(m): Any))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHash {
  /** Signature array (length `numSeeds`) for a text column; null when the
    * text has fewer than 3 words.
    */
  def signature(text: Column, numSeeds: Int): Column =
    Bridge.column(MinHashSignature(Bridge.expression(text), numSeeds))
}
