package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native first-occurrence n-gram position index of a space-separated
  * text: `struct<ghs: array<long>, ps: array<long>>` where `ghs` holds
  * the DISTINCT 64-bit gram hashes sorted ascending (signed) and
  * `ps(i)` the first window position of `ghs(i)`.
  *
  * Hash semantics are EXACTLY [[GramHashes]] with `hexChars = 16`: the
  * same 0x20-delimited windows hashed in place from the text's UTF-8
  * bytes, and the first 8 md5 digest bytes read big-endian — two grams
  * compare equal as longs iff their 16-hex-char forms compare equal,
  * so the DuckDB o88 oracle (md5-prefix strings) sees identical match
  * sets. This is q88's per-doc projection: one doc-volume kernel call
  * replaces the posexplode + groupBy(doc, gh) + min(pos) row pipeline
  * whose pair join shuffled 116M expanded rows at sf1 (SCALE.md
  * round 12).
  *
  * Custom-operator preference order (SURVEY.md §7): tier (b), scalar
  * `Expression` with `doGenCode` delegating to the static kernel.
  */
case class GramPosStruct(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 2 && n <= 64, s"gram width must be in [2, 64]: $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"gram_pos_struct expects STRING input, got $t")
  }

  override def dataType: DataType = GramPosStruct.schema

  override def nullSafeEval(input: Any): Any =
    GramPosStruct.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GramPosStruct.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): GramPosStruct =
    copy(child = newChild)
}

object GramPosStruct {

  val schema: StructType = StructType(Seq(
    StructField("ghs", ArrayType(LongType, containsNull = false),
      nullable = false),
    StructField("ps", ArrayType(LongType, containsNull = false),
      nullable = false)))

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Static kernel, also the codegen target. */
  def compute(text: UTF8String, n: Int): InternalRow = {
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
    val m = words - n + 1
    if (m <= 0)
      return new GenericInternalRow(Array[Any](
        new GenericArrayData(Array.emptyLongArray),
        new GenericArrayData(Array.emptyLongArray)))
    val md = md5.get()
    // window-order gram longs (first 8 md5 bytes, big-endian — the
    // 16-hex-char GramHashes value as one long)
    val gs = new Array[Long](m)
    var g = 0
    while (g < m) {
      val start = starts.get(g)
      val end = if (g + n < words) starts.get(g + n) - 1 else len
      md.reset()
      md.update(bytes, start, end - start)
      val d = md.digest()
      gs(g) = ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
        ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
        ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
      g += 1
    }
    // sort windows by (gram, position); keep the first position of
    // each distinct gram — the posexplode+min(pos) semantics. Fully
    // primitive: grams are rank-compressed against their own sorted
    // copy so (rank, position) packs into one nonnegative long
    // (rank < m < 2^31 on bits 31..61, position on bits 0..30) — a
    // primitive long[] sort instead of a boxed Integer[] sort with an
    // allocating comparator on the per-document hot path. Equal grams
    // share a rank (binarySearch over equal keys is deterministic for
    // a fixed array), and rank order IS signed gram order, so the
    // packed sort reproduces the boxed comparator exactly.
    val sortedG = java.util.Arrays.copyOf(gs, m)
    java.util.Arrays.sort(sortedG)
    val packed = new Array[Long](m)
    i = 0
    while (i < m) {
      val r = java.util.Arrays.binarySearch(sortedG, gs(i))
      packed(i) = (r.toLong << 31) | i.toLong
      i += 1
    }
    java.util.Arrays.sort(packed)
    val ghs = new Array[Long](m)
    val ps = new Array[Long](m)
    var k = 0
    i = 0
    while (i < m) {
      val w = (packed(i) & 0x7fffffffL).toInt
      if (k == 0 || ghs(k - 1) != gs(w)) {
        ghs(k) = gs(w)
        ps(k) = w.toLong
        k += 1
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](
      new GenericArrayData(java.util.Arrays.copyOf(ghs, k)),
      new GenericArrayData(java.util.Arrays.copyOf(ps, k))))
  }

  /** Column-API entry point. */
  def apply(text: Column, n: Int): Column =
    ColumnBridge.column(GramPosStruct(ColumnBridge.expression(text), n))
}

/** Native diagonal-run alignment of two [[GramPosStruct]] indexes —
  * q88's per-pair kernel. Returns `(n_shared << 32) | max_run` as one
  * LONG (both halves bounded by doc length < 2^31), or null if either
  * side is null; `n_shared = 0` (no shared gram) packs to 0, below the
  * caller's `>= 2^32` keep-filter — the q43 reporting contract.
  *
  * Algorithm: merge-intersect the two gh-sorted arrays (the per-doc
  * kernel guarantees signed ascending order), pack each match as
  * `(dg + 2^31) << 31 | pa` (dg = pa - pb on bits 31..62, bit 63
  * clear), sort, and scan: sorted-by-(dg, pa) runs advance by exactly
  * +1 in packed form, so `m == prev + 1` IS the "same diagonal,
  * consecutive position" test of the SQL fold it replaces. O(|a| +
  * |b| + s log s) per pair over primitive longs — no per-pair map, no
  * interpreted lambda, no pair×gram row expansion (the three measured
  * failure modes at sf1: minutes / 22.8 s / 15.4 s; this form 1.2–1.7 s,
  * SCALE.md round 12).
  */
case class DiagSpanPacked(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    // shape-only check (field nullability drifts through when()/max()
    // wrappers): two-field struct, both fields array<long>
    def ok(t: DataType): Boolean = t match {
      case StructType(Array(
        StructField(_, ArrayType(LongType, _), _, _),
        StructField(_, ArrayType(LongType, _), _, _))) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"diag_span_packed expects two gram_pos_struct inputs, " +
        s"got (${left.dataType}, ${right.dataType})")
  }

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    DiagSpanPacked.compute(a.asInstanceOf[InternalRow],
      b.asInstanceOf[InternalRow])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.DiagSpanPacked.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DiagSpanPacked =
    copy(left = newLeft, right = newRight)
}

object DiagSpanPacked {

  /** Static kernel, also the codegen target. */
  def compute(a: InternalRow, b: InternalRow): Long = {
    val gha = a.getArray(0); val pa = a.getArray(1)
    val ghb = b.getArray(0); val pb = b.getArray(1)
    val na = gha.numElements(); val nb = ghb.numElements()
    val matches = new Array[Long](math.min(na, nb))
    var i = 0; var j = 0; var s = 0
    while (i < na && j < nb) {
      val x = gha.getLong(i); val y = ghb.getLong(j)
      if (x == y) {
        val dg = pa.getLong(i) - pb.getLong(j)
        matches(s) = ((dg + (1L << 31)) << 31) | pa.getLong(i)
        s += 1; i += 1; j += 1
      } else if (x < y) i += 1
      else j += 1
    }
    if (s == 0) return 0L
    java.util.Arrays.sort(matches, 0, s)
    var best = 1L; var run = 1L
    var k = 1
    while (k < s) {
      run = if (matches(k) == matches(k - 1) + 1L) run + 1L else 1L
      if (run > best) best = run
      k += 1
    }
    (s.toLong << 32) | best
  }

  /** Column-API entry point. */
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(DiagSpanPacked(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
