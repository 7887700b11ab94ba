package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst [[Generator]] (the UDTF shape, SURVEY §2.10): emits one
  * row per 3-word shingle of a text column, streaming — unlike the
  * `transform`+`explode` composition, no intermediate array of all
  * shingles is materialized per row, so generation is O(1) memory in
  * shingle count (a long document never allocates its whole shingle list).
  *
  * Equivalence with `explode(Dedup.shingles)` is proven in DedupSpec.
  */
case class ShingleGenerator(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType =
    StructType(Seq(StructField("shingle", StringType, nullable = false)))
  override def prettyName: String = "shingles"

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Iterator.empty
    // limit -1 keeps trailing empty tokens — matches SQL split semantics
    val words = v.toString.split(" ", -1)
    if (words.length < n) return Iterator.empty
    (0 to words.length - n).iterator.map { i =>
      InternalRow(UTF8String.fromString(
        words.slice(i, i + n).mkString(" ")))
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleGenerator {
  def shingles(text: Column, n: Int = 3): Column =
    Bridge.column(ShingleGenerator(Bridge.expression(text), n))
}
