package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: fold a URL's HOST to its IDN ASCII
  * (punycode / RFC 3490 ToASCII) form — `https://bücher.example/x`
  * becomes `https://xn--bcher-kva.example/x` — so internationalized
  * spellings of the same site collapse to one canonical URL in the
  * q114 dedup key. The scheme, port, path and query pass through
  * untouched.
  *
  * Scale shape: row-local, allocation-shy — the (dominant, for crawl
  * URLs) all-ASCII case is detected with one in-place byte scan and
  * returns the INPUT UTF8String untouched, which is also why q114
  * stays DuckDB-hash-checkable (the ASCII fixture makes this an
  * identity on both engines; the Unicode behavior is pinned by
  * DomainCurationSpec instead — DuckDB has no punycode kernel). A URL
  * whose non-ASCII lives outside the host (an IRI path) folds nothing.
  * A host java.net.IDN rejects (malformed label, overlong) passes
  * through unchanged — curation canonicalizers normalize what they
  * can rather than throwing away the row. Stays inside whole-stage
  * codegen via `doGenCode` (preference tier (b), SURVEY.md §7).
  */
case class IdnAsciiHost(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"idn_ascii_host expects STRING input, got $t")
  }

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    IdnAsciiHost.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.IdnAsciiHost.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): IdnAsciiHost =
    copy(child = newChild)
}

object IdnAsciiHost {

  /** Static kernel, also the codegen target. */
  def compute(s: UTF8String): UTF8String = {
    if (s.isFullAscii) return s // ASCII hosts are already ACE form
    val str = s.toString
    val sep = str.indexOf("://")
    if (sep < 0) return s
    val hostStart = sep + 3
    var hostEnd = hostStart
    while (hostEnd < str.length &&
      "/?#".indexOf(str.charAt(hostEnd)) < 0) hostEnd += 1
    val host = str.substring(hostStart, hostEnd)
    if (host.forall(_ < 128)) return s // non-ASCII is outside the host
    // keep a numeric :port out of the fold (':' is not a label char)
    val colon = host.lastIndexOf(':')
    val (name, port) =
      if (colon >= 0 && colon < host.length - 1 &&
        host.substring(colon + 1).forall(_.isDigit))
        (host.substring(0, colon), host.substring(colon))
      else (host, "")
    val folded =
      try java.net.IDN.toASCII(name)
      catch { case _: IllegalArgumentException => name }
    UTF8String.fromString(
      str.substring(0, hostStart) + folded + port + str.substring(hostEnd))
  }

  /** Column-API entry point. */
  def apply(url: Column): Column =
    ColumnBridge.column(IdnAsciiHost(ColumnBridge.expression(url)))
}
