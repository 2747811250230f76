package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: truncated md5 hashes of every `n`-word
  * window of a space-separated text (the q42/q43 contamination gram
  * kernel).
  *
  * Semantics are EXACTLY the composable form the DuckDB oracles mirror —
  * for each window of `n` adjacent words of `split(text, ' ')`, the
  * first `hexChars` hex chars of `md5(concat_ws(' ', window))`; the
  * empty array below `n` words. Like the 2-word shingle case
  * ([[MinHashSlices]]), an n-word window joined by single spaces is a
  * CONTIGUOUS slice of the text's UTF-8 bytes, so each gram hashes in
  * place — no slice(), no concat_ws, no per-gram string assembly. The
  * interpreted form this replaces dominated q42/q43's scan cost.
  *
  * Custom-operator preference order (SURVEY.md §7): tier (b), scalar
  * `Expression` with `doGenCode` delegating to [[GramHashes.compute]].
  */
case class GramHashes(child: Expression, n: Int, hexChars: Int)
    extends UnaryExpression {

  require(n >= 2 && n <= 64, s"gram width must be in [2, 64]: $n")
  require(hexChars >= 1 && hexChars <= 32, s"hexChars must be in [1, 32]: $hexChars")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"gram_hashes expects STRING input, got $t")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    GramHashes.compute(input.asInstanceOf[UTF8String], n, hexChars)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GramHashes.compute($c, $n, $hexChars)")

  override protected def withNewChildInternal(newChild: Expression): GramHashes =
    copy(child = newChild)
}

object GramHashes {

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val HexDigits = "0123456789abcdef".toCharArray

  /** Static kernel, also the codegen target. */
  def compute(text: UTF8String, n: Int, hexChars: Int): ArrayData = {
    val bytes = text.getBytes
    val len = bytes.length
    // collect word start offsets (a word starts at 0 and after each 0x20)
    val starts = new java.util.ArrayList[Integer]
    starts.add(0)
    var i = 0
    while (i < len) {
      if (bytes(i) == 0x20) starts.add(i + 1)
      i += 1
    }
    val words = starts.size
    if (words < n) return new GenericArrayData(Array.empty[AnyRef])
    val md = md5.get()
    val out = new Array[AnyRef](words - n + 1)
    var g = 0
    while (g <= words - n) {
      // gram g spans word g's start to word g+n-1's end (exclusive of
      // the next separator — or the text end for the last word)
      val start = starts.get(g)
      val end =
        if (g + n < words) starts.get(g + n) - 1 else len
      md.reset()
      md.update(bytes, start, end - start)
      val d = md.digest()
      val hex = new Array[Char](hexChars)
      var c = 0
      while (c < hexChars) {
        val b = d(c >> 1)
        hex(c) = HexDigits(if ((c & 1) == 0) (b >> 4) & 0xf else b & 0xf)
        c += 1
      }
      out(g) = UTF8String.fromString(new String(hex))
      g += 1
    }
    new GenericArrayData(out)
  }

  /** Column-API entry point. */
  def apply(text: Column, n: Int, hexChars: Int): Column =
    ColumnBridge.column(GramHashes(ColumnBridge.expression(text), n, hexChars))
}
