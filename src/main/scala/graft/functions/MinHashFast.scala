package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UserDefinedExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
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
    extends UnaryExpression with UserDefinedExpression {

  override def name: String = prettyName

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // null for < 3-token input regardless of child nullability (see
  // MinHashSignature.nullable)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_signature_fast"

  override def nullSafeEval(input: Any): Any =
    doMinhash(input.asInstanceOf[UTF8String])

  def doMinhash(u: UTF8String): GenericArrayData = {
    // Shingles join with the same single space that splits them, so
    // shingle i is the contiguous input byte range [start(i), end(i+2))
    // — hash straight off the UTF8String's buffer, zero allocation per
    // shingle. Boundary scan replicates split(" ", -1) — the off-heap
    // (Platform.getByte) twin of TokenBoundaries.scan, kept unsafe here
    // so the input buffer is never copied; keep the two in lockstep.
    val base = u.getBaseObject
    val off = u.getBaseOffset
    val len = u.numBytes()
    var tokens = 1
    var p = 0
    while (p < len) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + p) == ' ')
        tokens += 1
      p += 1
    }
    if (tokens < 3) return null
    val starts = new Array[Int](tokens + 1)
    var t = 1
    p = 0
    while (p < len) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + p) == ' ') {
        starts(t) = p + 1; t += 1
      }
      p += 1
    }
    starts(tokens) = len + 1 // sentinel: end(k) = starts(k+1) - 1
    val mins = Array.fill[Long](numSeeds)(Long.MaxValue)
    var i = 0
    while (i + 2 < tokens) {
      val from = starts(i)
      val shLen = starts(i + 3) - 1 - from
      var s = 0
      while (s < numSeeds) {
        val h = XXH64.hashUnsafeBytes(base, off + from, shLen, s.toLong)
        if (h < mins(s)) mins(s) = h
        s += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(m => java.lang.Long.valueOf(m): Any))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhashFast", this)
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

object MinHashFast {
  def signature(text: Column, numSeeds: Int): Column =
    Bridge.column(MinHashSignatureFast(Bridge.expression(text), numSeeds))
}
