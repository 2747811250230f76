package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the DISTINCT 2-word shingles of a
  * space-separated text, each hashed to a fixed-width 60-bit integer
  * (the first 15 hex chars of the shingle's md5, read as one number) —
  * the q25 verification kernel in pre-hashed form.
  *
  * Why hashes and not the shingles themselves ([[ShingleSet]]): the
  * Jaccard verification stage shuffles each candidate-pair member's
  * whole shingle set through an exchange, and `array<string>` payloads
  * there were the engine's one measured GC-fragile region (SCALE.md:
  * 11–75s spread at sf1). Jaccard only needs set SIZES of intersection
  * and union, which are invariant under any injective relabeling of the
  * elements — and under a SHARED non-injective relabeling both engines
  * still compute the identical number. So both sides hash each shingle
  * with the same md5-prefix function and compare longs: rows through
  * the exchange shrink to a primitive `array<long>` (UnsafeArrayData —
  * no per-element object, ~10× smaller than the string sets), and the
  * kernel never materializes a shingle string at all — each 2-word
  * shingle is a CONTIGUOUS byte slice of the text (the [[ShingleSet]]
  * observation), md5 runs over the slice in place, and the first 7.5
  * digest bytes become the hash.
  *
  * Semantics the DuckDB oracle mirrors exactly:
  * `list_distinct(list_transform(<shingles>, s ->
  *   CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)))` — 15 hex chars
  * = 60 bits, positive in both engines' signed 64-bit range. Under two
  * words the whole text is the single set element, hashed the same way.
  * The output array is sorted ascending (deterministic content; also
  * merge-joinable downstream).
  *
  * Custom-operator preference order (SURVEY.md §7): tier (b), scalar
  * `Expression` with `doGenCode` delegating to [[ShingleHashes.compute]].
  */
case class ShingleHashes(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"shingle_hashes expects STRING input, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleHashes.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 15 md5 hex chars of `bytes[start, start+len)` as one 60-bit
    * number: digest bytes d0..d6 whole, then d7's high nibble — exactly
    * the value DuckDB's `CAST('0x' || substr(md5(s),1,15) AS BIGINT)`
    * parses from the hex form.
    */
  private def hash60(md: java.security.MessageDigest,
      bytes: Array[Byte], start: Int, len: Int): Long = {
    md.reset()
    md.update(bytes, start, len)
    val d = md.digest()
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) >> 4) & 0xfL)
  }

  /** Static kernel, also the codegen target. */
  def compute(text: UTF8String): ArrayData = {
    val bytes = text.getBytes
    val n = bytes.length
    val md = md5.get()
    val seen = new java.util.HashSet[java.lang.Long]
    var buf = new Array[Long](16)
    var sz = 0
    var wordStart = 0
    var prevStart = -1
    var words = 0
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == 0x20) {
        words += 1
        if (prevStart >= 0) {
          val h = hash60(md, bytes, prevStart, i - prevStart)
          if (seen.add(h)) {
            if (sz == buf.length) buf = java.util.Arrays.copyOf(buf, sz * 2)
            buf(sz) = h
            sz += 1
          }
        }
        prevStart = wordStart
        wordStart = i + 1
      }
      i += 1
    }
    if (words < 2) // under two words: the whole text is the set
      return UnsafeArrayData.fromPrimitiveArray(
        Array(hash60(md, bytes, 0, n)))
    val out = java.util.Arrays.copyOf(buf, sz)
    java.util.Arrays.sort(out)
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Column-API entry point. */
  def apply(text: Column): Column =
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(text)))
}
