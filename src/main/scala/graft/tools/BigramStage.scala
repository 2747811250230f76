package graft.tools

import graft.Tables
import org.apache.spark.sql.DataFrame

/** A/B-measures the round-14 staged bigram artifact against the
  * self-contained raw-text forms it replaced, in ONE JVM and window
  * (the NormBench discipline): q71's LM, q64's DSIR weights, and
  * q83's token-artifact vocabulary. The staged pass is reported two
  * ways — COLD (first call pays the artifact write) and WARM (the
  * production steady state every later consumer sees) — so the trade
  * is priced honestly instead of hiding the materialization.
  *
  * Usage: BigramStage <sfDir>
  */
object BigramStage {
  def main(args: Array[String]): Unit = {
    require(args.length >= 1, "usage: BigramStage <sfDir>")
    val d = args(0)
    val spark = graft.GraftSession.local("graft-bigram-stage",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import graft.operators.{TextAnalysis, TrainingData}
    import org.apache.spark.sql.functions._

    def time(f: => DataFrame): Double = {
      val t0 = System.nanoTime(); f.count(); (System.nanoTime() - t0) / 1e9
    }
    def min3(f: => DataFrame): Double = Seq.fill(3)(time(f)).min

    // raw-text forms first: they never touch the stage caches
    val q71Raw = min3(TextAnalysis.bigramLm(Tables.documents(spark, d)))
    val q64Raw = min3(TrainingData.dsirWeights(Tables.documents(spark, d)))
    val q83Raw = min3(Tables.documents(spark, d)
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .filter(length(col("w")) >= 2))

    // first staged call pays the artifact write (cold)
    val q71Cold = time(TextAnalysis.bigramLmFromCounts(
      TextAnalysis.stagedBigramCounts(spark, d)))
    val q71Stg = min3(TextAnalysis.bigramLmFromCounts(
      TextAnalysis.stagedBigramCounts(spark, d)))
    val q64Stg = min3(TrainingData.dsirWeightsFromCounts(
      Tables.documents(spark, d), TextAnalysis.stagedBigramCounts(spark, d)))
    val q83ColdTok = time(TextAnalysis.stagedTokenCounts(spark, d)
      .groupBy(col("w")).agg(sum(col("cnt")).as("freq"))
      .filter(length(col("w")) >= 2))
    val q83Stg = min3(TextAnalysis.stagedTokenCounts(spark, d)
      .groupBy(col("w")).agg(sum(col("cnt")).as("freq"))
      .filter(length(col("w")) >= 2))

    println(f"""{"sfDir":"$d","q71_raw":$q71Raw%.3f,"q71_staged_cold":$q71Cold%.3f,"q71_staged":$q71Stg%.3f,""" +
      f""""q64_raw":$q64Raw%.3f,"q64_staged":$q64Stg%.3f,""" +
      f""""q83_raw":$q83Raw%.3f,"q83_staged_cold":$q83ColdTok%.3f,"q83_staged":$q83Stg%.3f}""")
    spark.stop()
  }
}
