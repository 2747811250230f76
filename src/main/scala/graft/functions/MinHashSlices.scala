package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the `k` MinHash slice minima of a text's
  * 2-word shingle set (the q23/q25/q49-banding/q57 signature kernel).
  *
  * Semantics are EXACTLY the composable form the DuckDB oracles mirror:
  * shingles = adjacent word pairs of `split(text, ' ')` (`[text]` itself
  * when under two words), each shingle hashed with md5, slice i of the
  * signature = the lexicographic minimum of hex chars [4i+1, 4i+4] over
  * the shingle set. Two observations make the native loop allocation-
  * free: a 2-word shingle "w_i w_{i+1}" is a CONTIGUOUS byte slice of
  * the original text (words split on single 0x20 bytes, so the joining
  * space is already in place — md5 runs straight over the slice), and
  * the lexicographic min over fixed-width lowercase-hex strings equals
  * the numeric min of the 16-bit value those four hex chars encode (hex
  * digit order '0'..'9','a'..'f' is value order), so the minima are
  * tracked as ints and rendered once at the end. Duplicate shingles
  * don't need deduplication — duplicates cannot change a minimum.
  *
  * The composable form (per-shingle md5 via interpreted `transform`,
  * then k interpreted `array_min(transform(substring))` passes) was the
  * dominant cost of the LSH candidate pipeline — q23 measured ~12s at
  * sf1. Custom-operator preference order (SURVEY.md §7): tier (b), a
  * scalar `Expression` with `doGenCode` delegating to the static
  * [[MinHashSlices.compute]] so the stage stays in whole-stage codegen.
  */
case class MinHashSlices(child: Expression, k: Int)
    extends UnaryExpression {

  require(k >= 1 && k <= 8, s"minhash slice count must be in [1, 8]: $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"minhash_slices expects STRING input, got $t")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    MinHashSlices.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashSlices.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSlices =
    copy(child = newChild)
}

object MinHashSlices {

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val HexDigits = "0123456789abcdef".toCharArray

  /** Static kernel, also the codegen target. */
  def compute(text: UTF8String, k: Int): ArrayData = {
    val bytes = text.getBytes
    val n = bytes.length
    val md = md5.get()
    val mins = Array.fill(k)(Int.MaxValue)

    def vote(start: Int, end: Int): Unit = {
      md.reset()
      md.update(bytes, start, end - start)
      val d = md.digest()
      var i = 0
      while (i < k) {
        // slice i = hex chars [4i+1, 4i+4] = digest bytes [2i, 2i+1]
        val v = ((d(2 * i) & 0xff) << 8) | (d(2 * i + 1) & 0xff)
        if (v < mins(i)) mins(i) = v
        i += 1
      }
    }

    // word boundaries: indices of 0x20 separators; shingle j spans from
    // word j's start to word j+1's end — the separating space included
    var wordStart = 0
    var prevStart = -1 // start of the previous word, -1 before word 2
    var words = 0
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == 0x20) {
        words += 1
        if (prevStart >= 0) vote(prevStart, i)
        prevStart = wordStart
        wordStart = i + 1
      }
      i += 1
    }
    if (words < 2) vote(0, n) // under two words: the whole text is the set

    val out = new Array[AnyRef](k)
    var s = 0
    while (s < k) {
      val v = mins(s)
      out(s) = UTF8String.fromString(new String(Array(
        HexDigits((v >> 12) & 0xf), HexDigits((v >> 8) & 0xf),
        HexDigits((v >> 4) & 0xf), HexDigits(v & 0xf))))
      s += 1
    }
    new GenericArrayData(out)
  }

  /** Column-API entry point. */
  def apply(text: Column, k: Int): Column =
    ColumnBridge.column(MinHashSlices(ColumnBridge.expression(text), k))
}
