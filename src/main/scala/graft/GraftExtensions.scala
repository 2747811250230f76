package graft

import graft.functions.{ArrayDot, SimHash}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: makes the engine's native
  * expressions available to plain SQL users.
  *
  *   spark.sql.extensions=graft.GraftExtensions   (config path), or
  *   GraftFunctions.register(spark)               (existing session).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("array_dot"),
      new ExpressionInfo(classOf[ArrayDot].getName, "array_dot"),
      (exprs: Seq[Expression]) => ArrayDot(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("simhash"),
      new ExpressionInfo(classOf[SimHash].getName, "simhash"),
      (exprs: Seq[Expression]) => SimHash(exprs(0), SimHash.bitsArg(exprs(1)))))
  }
}

object GraftFunctions {
  /** Register the engine's SQL functions on an already-built session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    org.apache.spark.sql.graftshim.ColumnBridge.registerTempFunction(
      spark, "array_dot", exprs => ArrayDot(exprs(0), exprs(1)))
    org.apache.spark.sql.graftshim.ColumnBridge.registerTempFunction(
      spark, "simhash", exprs => SimHash(exprs(0), SimHash.bitsArg(exprs(1))))
  }
}
