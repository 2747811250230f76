package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: all `n`-word grams of a space-separated
  * text, in document order (the q38 bigram / q41 repetition / q50
  * boilerplate kernel).
  *
  * Semantics are EXACTLY the composable form the DuckDB oracles
  * mirror — `concat_ws(' ', window)` over each window of `n` adjacent
  * words of `split(text, ' ')`, the empty array below `n` words. An
  * n-word window joined by single spaces is a CONTIGUOUS slice of the
  * text's UTF-8 bytes ([[MinHashSlices]]' observation), so each gram is
  * one `UTF8String.fromBytes` slice — no per-gram string assembly, no
  * interpreted lambda frames.
  *
  * Custom-operator preference order (SURVEY.md §7): tier (b), scalar
  * `Expression` with `doGenCode` delegating to [[WordGrams.compute]].
  */
case class WordGrams(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 2 && n <= 64, s"gram width must be in [2, 64]: $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"word_grams expects STRING input, got $t")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    WordGrams.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordGrams.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordGrams =
    copy(child = newChild)
}

object WordGrams {

  /** Static kernel, also the codegen target. */
  def compute(text: UTF8String, n: Int): ArrayData = {
    val bytes = text.getBytes
    val len = bytes.length
    val starts = new java.util.ArrayList[Integer]
    starts.add(0)
    var i = 0
    while (i < len) {
      if (bytes(i) == 0x20) starts.add(i + 1)
      i += 1
    }
    val words = starts.size
    if (words < n) return new GenericArrayData(Array.empty[AnyRef])
    val out = new Array[AnyRef](words - n + 1)
    var g = 0
    while (g <= words - n) {
      val start = starts.get(g)
      val end = if (g + n < words) starts.get(g + n) - 1 else len
      out(g) = UTF8String.fromBytes(bytes, start, end - start)
      g += 1
    }
    new GenericArrayData(out)
  }

  /** Column-API entry point. */
  def apply(text: Column, n: Int): Column =
    ColumnBridge.column(WordGrams(ColumnBridge.expression(text), n))
}
