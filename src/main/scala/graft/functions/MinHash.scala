package graft.functions

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UserDefinedExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
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
  * shuffle. `doGenCode` calls back into this object so the enclosing
  * projection keeps whole-stage codegen (a CodegenFallback would force
  * the entire ProjectExec interpreted).
  *
  * Hot-loop shape: because shingles join words with the same single
  * space that splits them, shingle i's bytes are EXACTLY the contiguous
  * input byte range [start(i), end(i+2)) — so the loop scans the token
  * boundaries once and feeds `md.update(bytes, from, len)` slices, with
  * no per-shingle string or array allocation. Minimums are tracked as
  * raw 16-byte digests (unsigned byte order ≡ hex lexicographic order)
  * and hex-encoded once at the end; the MessageDigest is thread-local
  * (getInstance does a provider lookup per call).
  */
case class MinHashSignature(child: Expression, numSeeds: Int)
    extends UnaryExpression with UserDefinedExpression {

  override def name: String = prettyName

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  // null for < 3-token input regardless of child nullability — without
  // this, a non-nullable child makes nullSafeCodeGen emit an assignment
  // to a false literal (janino error) and the interpreted path would
  // write null into a slot the consumer believes non-null
  override def nullable: Boolean = true
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

  // "s|" per seed, the digest prefix — computed once, not per shingle
  @transient private lazy val seedPrefixes: Array[Array[Byte]] =
    Array.tabulate(numSeeds)(s => (s.toString + "|").getBytes(UTF_8))

  /** unsigned lexicographic compare of equal-length digests (< 0 ⇔ a < b) */
  private def cmpUnsigned(a: Array[Byte], b: Array[Byte]): Int = {
    var i = 0
    while (i < a.length) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    0
  }

  override def nullSafeEval(input: Any): Any =
    doMinhash(input.asInstanceOf[UTF8String])

  def doMinhash(input: UTF8String): GenericArrayData = {
    val bytes = input.getBytes
    val starts = TokenBoundaries.scan(bytes)
    val tokens = starts.length - 1
    if (tokens < 3) return null

    val md = MinHashSignature.md5Local.get()
    val mins = new Array[Array[Byte]](numSeeds)
    var i = 0
    while (i + 2 < tokens) {
      val from = starts(i)
      val len = starts(i + 3) - 1 - from
      var s = 0
      while (s < numSeeds) {
        md.update(seedPrefixes(s))
        md.update(bytes, from, len)
        val d = md.digest() // also resets for the next round
        if (mins(s) == null || cmpUnsigned(d, mins(s)) < 0) mins(s) = d
        s += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(m => UTF8String.fromString(hex(m)): Any))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhash", this)
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("mh")
      s"""Object $r = $ref.doMinhash($c);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $r; }
         |""".stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSignature {
  private[functions] val md5Local: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))
}

/** Single source of truth for `split(" ", -1)` token-boundary semantics
  * over UTF-8 bytes (0x20 can't occur inside a multibyte char, so a plain
  * byte scan is exact). Shared by the minhash/simhash expressions AND
  * mirrored by [[MinHash.eligible]] — keep them in lockstep.
  */
private[functions] object TokenBoundaries {
  /** Token start offsets plus one sentinel: token k spans
    * [starts(k), starts(k+1) − 1); token count = starts.length − 1.
    * Empty tokens (leading / double / trailing spaces) all count, exactly
    * like `split(" ", -1)`.
    */
  def scan(bytes: Array[Byte]): Array[Int] = {
    var tokens = 1
    var p = 0
    while (p < bytes.length) {
      if (bytes(p) == ' ') tokens += 1
      p += 1
    }
    val starts = new Array[Int](tokens + 1)
    var t = 1
    p = 0
    while (p < bytes.length) {
      if (bytes(p) == ' ') { starts(t) = p + 1; t += 1 }
      p += 1
    }
    starts(tokens) = bytes.length + 1 // sentinel: end(k) = starts(k+1) - 1
    starts
  }
}

object MinHash {
  /** Signature array (length `numSeeds`) for a text column; null when the
    * text has fewer than 3 words.
    */
  def signature(text: Column, numSeeds: Int): Column =
    Bridge.column(MinHashSignature(Bridge.expression(text), numSeeds))

  /** The signature-eligibility predicate, `signature(text).isNotNull`
    * without the signature: ≥ 3 space-split tokens. Callers filter on
    * THIS (it pushes to the scan as a cheap predicate) — an
    * `isnotnull(signature)` filter gets pushed below the projection and
    * re-evaluates the whole signature per row.
    */
  def eligible(text: Column): Column =
    org.apache.spark.sql.functions.size(
      org.apache.spark.sql.functions.split(text, " ")) >= 3
}
