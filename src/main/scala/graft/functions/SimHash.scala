package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: frequency-weighted SimHash fingerprint of
  * a space-separated text column (the q24/q49 kernel).
  *
  * Semantics are EXACTLY the composable form the DuckDB oracle mirrors —
  * words = `split(text, ' ')` (trailing empties kept, `[""]` for empty
  * text), bit j-1 of the fingerprint set when a strict majority of words
  * have hex digit j of `md5(word)` at or above '8' (the nibble's top
  * bit). The composable form evaluates 32 interpreted higher-order
  * filters over a hex-string array — measured 11.3s of q49's sf1 cost;
  * this expression runs one native loop over the text's UTF-8 bytes
  * (word boundaries are 0x20 scans — a space byte never occurs inside a
  * multi-byte UTF-8 sequence — and each word hashes via a thread-local
  * MessageDigest straight from the byte slice), allocating nothing per
  * word.
  *
  * Custom-operator preference order (SURVEY.md §7): tier (b), a scalar
  * `Expression` with `doGenCode` delegating to the static [[SimHash.compute]]
  * so the surrounding stage stays inside whole-stage codegen.
  */
case class SimHash(child: Expression, bits: Int)
    extends UnaryExpression {

  require(bits >= 1 && bits <= 32, s"simhash bits must be in [1, 32]: $bits")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"simhash expects STRING input, got $t")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(SimHash.compute(input.asInstanceOf[UTF8String], bits))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash.compute($c, $bits)")

  override protected def withNewChildInternal(newChild: Expression): SimHash =
    copy(child = newChild)
}

object SimHash {

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Static kernel, also the codegen target. One pass over the UTF-8
    * bytes: for each 0x20-delimited word slice, md5 the slice and vote
    * each of the first `bits` nibbles' top bits; strict majority sets
    * the fingerprint bit.
    */
  def compute(text: UTF8String, bits: Int): Long = {
    val bytes = text.getBytes
    val md = md5.get()
    val votes = new Array[Int](bits)
    var words = 0
    var start = 0
    var i = 0
    val n = bytes.length
    while (i <= n) {
      if (i == n || bytes(i) == 0x20) {
        md.reset()
        md.update(bytes, start, i - start)
        val digest = md.digest()
        var j = 0
        while (j < bits) {
          // nibble j+1 (1-based) = byte j/2, high nibble when j is even;
          // its top bit is 0x80 (high) or 0x08 (low)
          val mask = if ((j & 1) == 0) 0x80 else 0x08
          if ((digest(j >> 1) & mask) != 0) votes(j) += 1
          j += 1
        }
        words += 1
        start = i + 1
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < bits) {
      if (2 * votes(j) > words) fp |= 1L << j
      j += 1
    }
    fp
  }

  /** Column-API entry point. */
  def apply(text: Column, bits: Int): Column =
    ColumnBridge.column(SimHash(ColumnBridge.expression(text), bits))

  /** SQL-registration helper shared by the graft function family: a
    * width/count argument must be an integer literal (it is part of the
    * expression's shape, not data).
    */
  def bitsArg(e: Expression): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"width argument must be an integer literal, got $other")
  }
}
