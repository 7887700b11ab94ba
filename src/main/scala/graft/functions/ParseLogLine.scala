package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UserDefinedExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass PostgreSQL stderr log-line parser (SURVEY §2.10 "if perf
  * demands: custom Expression"): matches the `%t:%r:%u@%d:[%p]:` prefix
  * contract (/root/reference/rds_pgbadger.py:57) ONCE and returns every
  * field as a struct — the compositional `regexp_extract`-per-field form
  * re-runs the same regex 6-8× per line, which dominated the parse-heavy
  * report queries.
  *
  * Field-level semantics are identical to the compositional form (and the
  * DuckDB oracle): unmatched prefix → empty strings + null pid (what
  * `regexp_extract` returns on no-match), absent duration/statement →
  * null / empty string.
  *
  * Codegen: a real `doGenCode` that calls back into this object — a
  * CodegenFallback here would disqualify the WHOLE enclosing ProjectExec
  * from whole-stage codegen, forcing every co-projected expression (line
  * synthesis, timestamps) through the interpreted path (~10× on the
  * parse-heavy reports).
  */
case class ParseLogLine(child: Expression)
    extends UnaryExpression with UserDefinedExpression {

  override def name: String = prettyName

  override def dataType: DataType = ParseLogLine.schema
  override def prettyName: String = "parse_log_line"

  @transient private lazy val prefixRe = Pattern.compile(
    "^(\\d{4}-\\d{2}-\\d{2} \\d{2}:\\d{2}:\\d{2}) UTC:([^:]*):([^@:]*)@([^:]*):\\[(\\d+)\\]:([A-Z]+):")
  // DOTALL so stitched multi-line records keep their continuation text in
  // message/query; single-line inputs (the oracle surface) are unaffected.
  @transient private lazy val msgRe =
    Pattern.compile(":[A-Z]+:  (.*)$", Pattern.DOTALL)
  @transient private lazy val durRe = Pattern.compile("duration: ([0-9.]+) ms")
  @transient private lazy val queryRe =
    Pattern.compile("statement: (.*)$", Pattern.DOTALL)

  private def u(s: String) = UTF8String.fromString(s)

  override def nullSafeEval(input: Any): Any =
    doParse(input.asInstanceOf[UTF8String])

  def doParse(input: UTF8String): InternalRow = {
    val line = input.toString
    val m = prefixRe.matcher(line)
    val (ts, host, usr, db, pid, level) =
      if (m.find()) (m.group(1), m.group(2), m.group(3), m.group(4),
        // overflowing pids become null, same as the regexp_extract +
        // cast("int") composition (never crash the task on one bad line)
        try java.lang.Integer.valueOf(m.group(5))
        catch { case _: NumberFormatException => null },
        m.group(6))
      else ("", "", "", "", null, "")
    val msgM = msgRe.matcher(line)
    val msg = if (msgM.find()) msgM.group(1) else ""
    val durM = durRe.matcher(line)
    val dur: java.lang.Double =
      if (durM.find()) java.lang.Double.valueOf(durM.group(1)) else null
    val qM = queryRe.matcher(line)
    val query = if (qM.find()) qM.group(1) else ""
    InternalRow(u(ts), u(host), u(usr), u(db), pid, u(level), u(msg),
      dur, u(query))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("parser", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $ref.doParse($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ParseLogLine {
  val schema: StructType = StructType(Seq(
    StructField("ts_str", StringType),
    StructField("remote_host", StringType),
    StructField("usr", StringType),
    StructField("db", StringType),
    StructField("pid", IntegerType),
    StructField("level", StringType),
    StructField("message", StringType),
    StructField("duration_ms", DoubleType),
    StructField("query", StringType)))

  def parse(line: Column): Column =
    Bridge.column(ParseLogLine(Bridge.expression(line)))
}
