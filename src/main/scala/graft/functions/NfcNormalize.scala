package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Unicode NFC (canonical composition)
  * normalization of a string — the codepoint-level half of the q81
  * text-normalization stage (combining sequences like `e`+U+0301
  * compose to `é`, singleton canonicals collapse), mirrored by the
  * DuckDB oracle's `nfc_normalize`. Both sides implement UCD canonical
  * composition, which the Unicode stability policy pins for assigned
  * codepoints — so the outputs are byte-identical across engines.
  *
  * Scale shape: the kernel is row-local and allocation-shy — a pure
  * byte scan detects the (dominant, for web text) all-ASCII case and
  * returns the INPUT UTF8String untouched; non-ASCII strings that are
  * already composed (most real text: UTF-8 sources emit NFC) pay one
  * `isNormalized` check and again return the input; only genuinely
  * decomposed text pays the String round-trip. No UDF wrapping, no
  * serialization boundary — the expression stays inside whole-stage
  * codegen via `doGenCode`.
  *
  * Custom-operator preference order (SURVEY.md §7): tier (b), scalar
  * `Expression` with `doGenCode` delegating to [[NfcNormalize.compute]].
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"nfc_normalize expects STRING input, got $t")
  }

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {

  /** Static kernel, also the codegen target. */
  def compute(s: UTF8String): UTF8String = {
    // isFullAscii scans the (possibly off-heap) buffer in place —
    // unlike getBytes, which copies when the string is a page slice,
    // i.e. for every parquet-read row
    if (s.isFullAscii) return s // pure ASCII is NFC by construction
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** Column-API entry point. */
  def apply(text: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(text)))
}
