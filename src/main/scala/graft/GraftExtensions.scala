package graft

import graft.functions.{ArrayDot, GramHashes, MinHashSlices, NfcNormalize, NormalizeText, PqAdcDist, PqAdcDistPacked, PqEncode, ShingleHashes, ShingleSet, SimHash, SubL2Dist, WordGrams}
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
    e.injectFunction((
      FunctionIdentifier("minhash_slices"),
      new ExpressionInfo(classOf[MinHashSlices].getName, "minhash_slices"),
      (exprs: Seq[Expression]) => MinHashSlices(exprs(0), SimHash.bitsArg(exprs(1)))))
    e.injectFunction((
      FunctionIdentifier("shingle_set"),
      new ExpressionInfo(classOf[ShingleSet].getName, "shingle_set"),
      (exprs: Seq[Expression]) => ShingleSet(exprs(0))))
    e.injectFunction((
      FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
      (exprs: Seq[Expression]) => ShingleHashes(exprs(0))))
    e.injectFunction((
      FunctionIdentifier("gram_hashes"),
      new ExpressionInfo(classOf[GramHashes].getName, "gram_hashes"),
      (exprs: Seq[Expression]) => GramHashes(exprs(0),
        SimHash.bitsArg(exprs(1)), SimHash.bitsArg(exprs(2)))))
    e.injectFunction((
      FunctionIdentifier("word_grams"),
      new ExpressionInfo(classOf[WordGrams].getName, "word_grams"),
      (exprs: Seq[Expression]) => WordGrams(exprs(0), SimHash.bitsArg(exprs(1)))))
    e.injectFunction((
      FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      (exprs: Seq[Expression]) => NfcNormalize(exprs(0))))
    e.injectFunction((
      FunctionIdentifier("normalize_text"),
      new ExpressionInfo(classOf[NormalizeText].getName, "normalize_text"),
      (exprs: Seq[Expression]) => NormalizeText(exprs(0))))
    e.injectFunction((
      FunctionIdentifier("pq_encode"),
      new ExpressionInfo(classOf[PqEncode].getName, "pq_encode"),
      (exprs: Seq[Expression]) => PqEncode(exprs(0), exprs(1),
        SimHash.bitsArg(exprs(2)))))
    e.injectFunction((
      FunctionIdentifier("pq_adc_dist"),
      new ExpressionInfo(classOf[PqAdcDist].getName, "pq_adc_dist"),
      (exprs: Seq[Expression]) => PqAdcDist(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("pq_adc_dist_packed"),
      new ExpressionInfo(classOf[PqAdcDistPacked].getName, "pq_adc_dist_packed"),
      (exprs: Seq[Expression]) => PqAdcDistPacked(exprs(0), exprs(1),
        SimHash.bitsArg(exprs(2)))))
    e.injectFunction((
      FunctionIdentifier("sub_l2_dist"),
      new ExpressionInfo(classOf[SubL2Dist].getName, "sub_l2_dist"),
      (exprs: Seq[Expression]) => SubL2Dist(exprs(0), exprs(1),
        SimHash.bitsArg(exprs(2)))))
  }
}

object GraftFunctions {
  /** Register the engine's SQL functions on an already-built session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    org.apache.spark.sql.graftshim.ColumnBridge.registerTempFunction(
      spark, "array_dot", exprs => ArrayDot(exprs(0), exprs(1)))
    org.apache.spark.sql.graftshim.ColumnBridge.registerTempFunction(
      spark, "simhash", exprs => SimHash(exprs(0), SimHash.bitsArg(exprs(1))))
    org.apache.spark.sql.graftshim.ColumnBridge.registerTempFunction(
      spark, "minhash_slices", exprs => MinHashSlices(exprs(0), SimHash.bitsArg(exprs(1))))
    org.apache.spark.sql.graftshim.ColumnBridge.registerTempFunction(
      spark, "shingle_set", exprs => ShingleSet(exprs(0)))
    org.apache.spark.sql.graftshim.ColumnBridge.registerTempFunction(
      spark, "shingle_hashes", exprs => ShingleHashes(exprs(0)))
    org.apache.spark.sql.graftshim.ColumnBridge.registerTempFunction(
      spark, "gram_hashes", exprs => GramHashes(exprs(0),
        SimHash.bitsArg(exprs(1)), SimHash.bitsArg(exprs(2))))
    org.apache.spark.sql.graftshim.ColumnBridge.registerTempFunction(
      spark, "word_grams", exprs => WordGrams(exprs(0), SimHash.bitsArg(exprs(1))))
    org.apache.spark.sql.graftshim.ColumnBridge.registerTempFunction(
      spark, "nfc_normalize", exprs => NfcNormalize(exprs(0)))
    org.apache.spark.sql.graftshim.ColumnBridge.registerTempFunction(
      spark, "normalize_text", exprs => NormalizeText(exprs(0)))
    org.apache.spark.sql.graftshim.ColumnBridge.registerTempFunction(
      spark, "pq_encode", exprs => PqEncode(exprs(0), exprs(1),
        SimHash.bitsArg(exprs(2))))
    org.apache.spark.sql.graftshim.ColumnBridge.registerTempFunction(
      spark, "pq_adc_dist", exprs => PqAdcDist(exprs(0), exprs(1)))
    org.apache.spark.sql.graftshim.ColumnBridge.registerTempFunction(
      spark, "pq_adc_dist_packed", exprs => PqAdcDistPacked(exprs(0), exprs(1),
        SimHash.bitsArg(exprs(2))))
    org.apache.spark.sql.graftshim.ColumnBridge.registerTempFunction(
      spark, "sub_l2_dist", exprs => SubL2Dist(exprs(0), exprs(1),
        SimHash.bitsArg(exprs(2))))
  }
}
