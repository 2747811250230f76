package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the DISTINCT 2-word shingle set of a
  * space-separated text (the q25 verification kernel).
  *
  * Semantics are EXACTLY the composable form the DuckDB oracle mirrors —
  * `array_distinct` over adjacent-word-pair strings of `split(text, ' ')`
  * (first-occurrence order), `[text]` itself when under two words. Each
  * shingle "w_i w_{i+1}" is a CONTIGUOUS slice of the text's UTF-8 bytes
  * (single-0x20 separators keep the joining space in place), so the loop
  * materializes one UTF8String per DISTINCT shingle and nothing else.
  * The composable form staged the split array and ran an interpreted
  * `transform` + `array_distinct` — the remaining hot cost of the
  * Jaccard verification stage once the signature pipeline went native.
  *
  * Custom-operator preference order (SURVEY.md §7): tier (b), scalar
  * `Expression` with `doGenCode` delegating to [[ShingleSet.compute]].
  */
case class ShingleSet(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"shingle_set expects STRING input, got $t")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    ShingleSet.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleSet.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): ShingleSet =
    copy(child = newChild)
}

object ShingleSet {

  /** Static kernel, also the codegen target. */
  def compute(text: UTF8String): ArrayData = {
    val bytes = text.getBytes
    val n = bytes.length
    val out = new java.util.ArrayList[AnyRef]
    val seen = new java.util.HashSet[UTF8String]
    var wordStart = 0
    var prevStart = -1
    var words = 0
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == 0x20) {
        words += 1
        if (prevStart >= 0) {
          val s = UTF8String.fromBytes(bytes, prevStart, i - prevStart)
          if (seen.add(s)) out.add(s)
        }
        prevStart = wordStart
        wordStart = i + 1
      }
      i += 1
    }
    if (words < 2) // under two words: the whole text is the set
      return new GenericArrayData(Array[AnyRef](text))
    new GenericArrayData(out.toArray)
  }

  /** Column-API entry point. */
  def apply(text: Column): Column =
    ColumnBridge.column(ShingleSet(ColumnBridge.expression(text)))
}
