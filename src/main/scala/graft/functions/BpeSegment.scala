package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UserDefinedExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** BPE segmentation of a word under a TRAINED merge-rule sequence — the
  * production form of the tokenizer's score-many half.
  *
  * Semantics (pinned bit-identical to the compositional nested-HOF fold
  * in `TextAnalysis.bpeSegmentHof` by spec): the word is split into
  * code-point symbols (the `split(word, "")` shape, empties dropped);
  * then each rule (l, r), in training-round order, makes ONE
  * leftmost-first left-to-right pass — if the accumulated tail symbol
  * equals `l` and the next symbol equals `r` they merge to `l + r`,
  * and the merged symbol immediately becomes the tail (so it can chain
  * as the LEFT side of the same rule later in the pass, but never
  * re-match as its own right side — the HOF fold's exact behavior).
  *
  * Why custom (SURVEY preference order (b)): the HOF form chains one
  * `aggregate` lambda per merge rule, so the EXPRESSION TREE is linear
  * in nMerges — a production 32k-merge vocabulary does not plan, let
  * alone codegen (the measured ceiling is in BENCH_NOTES round 13).
  * Here the rules ride along as one referenced object; the tree is a
  * single node at any vocabulary size, and the merge loop is a per-row
  * scan with zero shuffle and hashed rule lookup.
  */
case class BpeSegment(child: Expression, rules: Seq[(String, String)])
    extends UnaryExpression with UserDefinedExpression {

  override def name: String = prettyName

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_segment"

  // rule pair -> ALL its ranks ascending (a duplicated pair keeps every
  // rank: the fold runs BOTH passes, and the later one can fire on
  // adjacencies that only exist after intermediate merges). Built once
  // per executor via the lazy val on deserialization. Keyed by the
  // (l, r) TUPLE, not a joined string: a separator-joined key is
  // ambiguous whenever a rule side can contain the separator —
  // ("a b","c") vs ("a","b c") — and this is a general Column API even
  // though bpeTokenize's space-split words can't reach that case.
  @transient private lazy val ranked
      : java.util.HashMap[(String, String), Array[Int]] = {
    val m = new java.util.HashMap[(String, String), Array[Int]](
      rules.length * 2)
    var i = 0
    rules.foreach { case (l, r) =>
      val k = (l, r)
      val prev = m.get(k)
      m.put(k, if (prev == null) Array(i) else prev :+ i)
      i += 1
    }
    m
  }

  // smallest rank of (l, r) strictly greater than `cursor`, or MaxValue
  private def rankAfter(pair: (String, String), cursor: Int): Int = {
    val rs = ranked.get(pair)
    if (rs == null) Int.MaxValue
    else {
      var i = 0
      while (i < rs.length && rs(i) <= cursor) i += 1
      if (i < rs.length) rs(i) else Int.MaxValue
    }
  }

  override def nullSafeEval(input: Any): Any =
    doSegment(input.asInstanceOf[UTF8String])

  def doSegment(input: UTF8String): ArrayData = {
    val word = input.toString
    // split(word, "") with empties dropped = per-code-point symbols
    // (Java's empty-regex split is surrogate-pair-aware, as is this)
    var syms = new java.util.ArrayList[String](word.length)
    var ci = 0
    while (ci < word.length) {
      val cp = word.codePointAt(ci)
      val n = Character.charCount(cp)
      syms.add(word.substring(ci, ci + n))
      ci += n
    }
    // Apply rules IN ROUND ORDER, one left-to-right pass each — but
    // skip the passes that cannot fire. The fold runs every rule's
    // pass unconditionally; a pass is a no-op unless some ADJACENT
    // pair in the current symbols equals (l, r) (the first merge of a
    // pass always consumes an adjacency present when the pass starts —
    // a merged tail can only chain as the LEFT side). So: repeatedly
    // find the smallest rule rank STRICTLY AFTER the last applied one
    // that matches any adjacent pair, and run that pass. This applies
    // exactly the passes the fold's full sweep would have fired, in
    // the same order — O(fires x |word|) probes, not nMerges passes.
    var cursor = -1
    var continue = true
    while (continue && syms.size > 1) {
      var best = Int.MaxValue
      var i = 0
      while (i < syms.size - 1) {
        val rk = rankAfter((syms.get(i), syms.get(i + 1)), cursor)
        if (rk < best) best = rk
        i += 1
      }
      if (best == Int.MaxValue) continue = false
      else {
        // run the fold's exact single pass for that rule
        val (l, r) = rules(best)
        val out = new java.util.ArrayList[String](syms.size)
        var j = 0
        while (j < syms.size) {
          val s = syms.get(j)
          if (!out.isEmpty && out.get(out.size - 1) == l && s == r)
            out.set(out.size - 1, l + r)
          else out.add(s)
          j += 1
        }
        syms = out
        cursor = best
      }
    }
    val arr = new Array[Any](syms.size)
    var k = 0
    while (k < syms.size) {
      arr(k) = UTF8String.fromString(syms.get(k))
      k += 1
    }
    new GenericArrayData(arr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeSegment", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.doSegment($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeSegment {
  /** BPE pieces of a word column under trained `rules` (round order);
    * null for null words.
    */
  def bpeSegment(word: Column, rules: Seq[(String, String)]): Column =
    Bridge.column(BpeSegment(Bridge.expression(word), rules))
}
