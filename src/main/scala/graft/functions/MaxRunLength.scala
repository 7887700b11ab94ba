package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Longest run of equal adjacent elements in a SORTED `array<string>` —
  * i.e. the maximum element multiplicity of the multiset.
  *
  * Why custom (SURVEY preference order (b)): the top-word-frequency
  * signal otherwise needs either an explode → (doc, word) count →
  * per-doc max (two full shuffles of docs × words rows, the dominant
  * cost of the repetition-quality operator at scale) or an interpreted
  * per-row `aggregate()` fold (~100× per-row overhead, like the dot
  * product before [[DotProduct]]). This generates a tight comparison
  * loop inside WholeStageCodegen: per-row, zero shuffle.
  *
  * Caller contract: the input array is sorted (`array_sort`); nulls
  * inside the array are not expected (split() never produces them).
  */
case class MaxRunLength(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "max_run_length"

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n == 0) 0L
    else {
      var best = 1L
      var run = 1L
      var i = 1
      var prev = a.getUTF8String(0)
      while (i < n) {
        val cur = a.getUTF8String(i)
        if (cur.equals(prev)) run += 1
        else { run = 1; prev = cur }
        if (run > best) best = run
        i += 1
      }
      best
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val run = ctx.freshName("run")
      val best = ctx.freshName("best")
      val prev = ctx.freshName("prev")
      val cur = ctx.freshName("cur")
      s"""
         |int $n = $a.numElements();
         |long $best = 0L;
         |if ($n > 0) {
         |  $best = 1L;
         |  long $run = 1L;
         |  org.apache.spark.unsafe.types.UTF8String $prev = $a.getUTF8String(0);
         |  for (int $i = 1; $i < $n; $i++) {
         |    org.apache.spark.unsafe.types.UTF8String $cur = $a.getUTF8String($i);
         |    if ($cur.equals($prev)) { $run += 1L; }
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
