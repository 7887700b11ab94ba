package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Longest run of equal adjacent elements in a SORTED `array<string>` —
  * i.e. the maximum element multiplicity of the multiset.
  *
  * Why custom (SURVEY preference order (b)): the top-word-frequency
  * signal otherwise needs either an explode → (doc, word) count →
  * per-doc max (two full shuffles of docs × words rows, the dominant
  * cost of the repetition-quality operator at scale) or an interpreted
  * per-row `aggregate()` fold (~100× per-row overhead, like the dot
  * product before [[DotProduct]]). This generates a tight comparison
  * loop inside WholeStageCodegen: per-row, no shuffle.
  *
  * Null elements break runs and are never counted (array_sort places
  * them last, so they cannot split a real run).
  */
case class MaxRunLength(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "max_run_length"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    var best = 0L
    var run = 0L
    var prev: UTF8String = null
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) { run = 0L; prev = null }
      else {
        val cur = a.getUTF8String(i)
        if (prev != null && cur.equals(prev)) run += 1
        else { run = 1L; prev = cur }
        if (run > best) best = run
      }
      i += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val run = ctx.freshName("run")
      val best = ctx.freshName("best")
      val prev = ctx.freshName("prev")
      val cur = ctx.freshName("cur")
      val utf8 = classOf[UTF8String].getName
      s"""
         |int $n = $a.numElements();
         |long $best = 0L;
         |long $run = 0L;
         |$utf8 $prev = null;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { $run = 0L; $prev = null; }
         |  else {
         |    $utf8 $cur = $a.getUTF8String($i);
         |    if ($prev != null && $cur.equals($prev)) { $run += 1L; }
         |    else { $run = 1L; $prev = $cur; }
         |    if ($run > $best) { $best = $run; }
         |  }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MaxRunLength {
  /** Max multiplicity of a sorted array<string> column. */
  def ofSorted(a: Column): Column =
    Bridge.column(MaxRunLength(Bridge.expression(a)))
}
