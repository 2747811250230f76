package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the WHOLE q81 normalization chain in one
  * kernel — zero-width/control strip and CR fold (pre-pass), NFC
  * composition ([[NfcNormalize]]'s slow path), unicode-space mapping +
  * horizontal-whitespace collapse + edge trim (post-pass).
  *
  * Semantics are EXACTLY `TextAnalysis.normalizeText`'s five-stage
  * regexp_replace chain (the form the DuckDB oracle still replays, and
  * the form a ScalaCheck property in TextCurationSpec pins this kernel
  * against over adversarial unicode). The chain ORDER lives here too:
  * strips and CR-fold BEFORE composition (a stripped codepoint can
  * block a base+mark pair — see the NfcNormalize scaladoc), space
  * handling after. One genuinely order-sensitive corner the fusion
  * must reproduce: the chain strips zero-width/control chars BEFORE
  * folding `\r\n?`, so CR + (strippable junk) + LF is ONE newline —
  * the CR branch therefore looks ahead PAST strippable chars for its
  * optional LF.
  *
  * Why a kernel instead of the chain: five regexp_replace stages scan
  * and re-allocate the full string five times per row; at corpus scale
  * normalization is exactly the every-byte-of-the-corpus hot path the
  * repo reserves native expressions for (SimHash, WordGrams). Here:
  * one detection scan, then at most two char passes around the NFC
  * check. Clean ASCII rows — the overwhelming case on web corpora —
  * return the input UTF8String untouched (no copy, `isFullAscii` and
  * `getByte` read the buffer in place).
  *
  * Custom-operator preference order (SURVEY.md §7): tier (b), scalar
  * `Expression` with `doGenCode` delegating to [[NormalizeText.compute]].
  */
case class NormalizeText(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"normalize_text expects STRING input, got $t")
  }

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    NormalizeText.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NormalizeText.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}

object NormalizeText {

  // the three regex classes of TextAnalysis.normalizeText, as predicates
  private def isZeroWidth(c: Char): Boolean =
    (c >= '\u200B' && c <= '\u200D') || c == '\uFEFF' || c == '\u00AD'

  private def isStrippedControl(c: Char): Boolean =
    c <= '\u0008' || c == '\u000B' || c == '\u000C' ||
      (c >= '\u000E' && c <= '\u001F') || c == '\u007F'

  private def isUnicodeSpace(c: Char): Boolean =
    c == '\u00A0' || c == '\u1680' ||
      (c >= '\u2000' && c <= '\u200A') || c == '\u202F' ||
      c == '\u205F' || c == '\u3000'

  // anything horizontal-whitespace-shaped after the space-map stage:
  // the "[ \t]+" collapse class plus the chars the map sends into it
  private def isHSpace(c: Char): Boolean =
    c == ' ' || c == '\t' || isUnicodeSpace(c)

  /** Static kernel, also the codegen target. */
  def compute(s: UTF8String): UTF8String = {
    // ---- fast path: one in-place byte scan, no copy -------------------
    // ASCII rows can only need the control strip, CR fold, collapse, or
    // trim; if none applies the input IS the output. Non-ASCII rows
    // always take the slow path (the NFC check needs a String anyway).
    if (s.isFullAscii) {
      val n = s.numBytes()
      var clean = n == 0 ||
        (s.getByte(0) != ' '.toByte && s.getByte(n - 1) != ' '.toByte)
      var i = 0
      while (clean && i < n) {
        val b = s.getByte(i)
        if (b < 0x20 && b != '\n'.toByte) clean = false // controls, \r, \t
        else if (b == 0x7F) clean = false
        else if (b == ' '.toByte && i + 1 < n && s.getByte(i + 1) == ' '.toByte)
          clean = false
        i += 1
      }
      if (clean) return s
    }
    // ---- slow path: pre-pass, NFC, post-pass ---------------------------
    val str = s.toString
    val len = str.length
    // pre-pass: drop zero-width + controls, fold \r (junk*) \n? -> \n
    val pre = new java.lang.StringBuilder(len)
    var i = 0
    while (i < len) {
      val c = str.charAt(i)
      if (c == '\r') {
        pre.append('\n')
        var j = i + 1
        while (j < len && (isZeroWidth(str.charAt(j)) || isStrippedControl(str.charAt(j))))
          j += 1
        if (j < len && str.charAt(j) == '\n') i = j // consume junk + LF
      } else if (!isZeroWidth(c) && !isStrippedControl(c)) {
        pre.append(c)
      }
      i += 1
    }
    val folded = pre.toString
    val nfc =
      if (java.text.Normalizer.isNormalized(folded, java.text.Normalizer.Form.NFC)) folded
      else java.text.Normalizer.normalize(folded, java.text.Normalizer.Form.NFC)
    // post-pass: map unicode spaces, collapse hspace runs, trim edges
    val n2 = nfc.length
    val out = new java.lang.StringBuilder(n2)
    var j = 0
    while (j < n2) {
      val c = nfc.charAt(j)
      if (isHSpace(c)) {
        while (j + 1 < n2 && isHSpace(nfc.charAt(j + 1))) j += 1
        out.append(' ')
      } else {
        out.append(c)
      }
      j += 1
    }
    // trim: the chain's trailing `trim` removes edge SPACES only; after
    // the collapse every hspace is a single ' ', so at most one each end
    var lo = 0
    var hi = out.length
    if (hi > lo && out.charAt(lo) == ' ') lo += 1
    if (hi > lo && out.charAt(hi - 1) == ' ') hi -= 1
    UTF8String.fromString(out.substring(lo, hi))
  }

  /** Column-API entry point. */
  def apply(text: Column): Column =
    ColumnBridge.column(NormalizeText(ColumnBridge.expression(text)))
}
