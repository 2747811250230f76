package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** Native subspace-grouped squared-L2 distance between two
  * ARRAY<DOUBLE> vectors — the EXACT fold shape the PQ oracle family
  * (q84/q94) evaluates: an outer j-ascending accumulation over
  * subspaces, each subspace an inner left-to-right fold from 0.0 of
  * `(a[i]-b[i])²`. The grouping matters: nested sums are not
  * IEEE-equal to one flat left-to-right sum, and the DuckDB side
  * (nested `list_reduce`) computes the nested form — this kernel
  * reproduces it bit-for-bit (spec-pinned against the interpreted
  * `aggregate` HOF reference).
  *
  * Why native: q94's exact-L2 side is |queries| × |corpus| pairs; the
  * interpreted HOF fold cost 73 s at sf1 where this loop is
  * q26-class. Null discipline (the ArrayDot contract): null input →
  * null; length mismatch, length not divisible by `subDim`, or any
  * null element → null — loud schema drift, never a wrong distance.
  */
case class SubL2Dist(left: Expression, right: Expression, subDim: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType) && subDim > 0)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sub_l2_dist expects (ARRAY<DOUBLE>, ARRAY<DOUBLE>, subDim > 0), " +
        s"got (${left.dataType}, ${right.dataType}, $subDim)")
  }

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements() || n % subDim != 0) return null
    var total = 0.0
    var j = 0
    while (j < n) {
      var sub = 0.0
      var i = 0
      while (i < subDim) {
        if (x.isNullAt(j + i) || y.isNullAt(j + i)) return null
        val d = x.getDouble(j + i) - y.getDouble(j + i)
        sub += d * d
        i += 1
      }
      total += sub
      j += subDim
    }
    java.lang.Double.valueOf(total)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val sub = ctx.freshName("sub")
      val total = ctx.freshName("total")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements() || $n % $subDim != 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $total = 0.0;
         |  for (int $j = 0; $j < $n && !${ev.isNull}; $j += $subDim) {
         |    double $sub = 0.0;
         |    for (int $i = 0; $i < $subDim; $i++) {
         |      if ($a.isNullAt($j + $i) || $b.isNullAt($j + $i)) {
         |        ${ev.isNull} = true; break;
         |      }
         |      double $d = $a.getDouble($j + $i) - $b.getDouble($j + $i);
         |      $sub += $d * $d;
         |    }
         |    $total += $sub;
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $total;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SubL2Dist =
    copy(left = newLeft, right = newRight)
}

object SubL2Dist {
  /** Column-API entry point. */
  def apply(a: Column, b: Column, subDim: Int): Column =
    ColumnBridge.column(SubL2Dist(
      ColumnBridge.expression(a), ColumnBridge.expression(b), subDim))
}
