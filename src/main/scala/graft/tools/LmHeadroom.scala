package graft.tools

import graft.Tables
import org.apache.spark.sql.functions._

/** Measures the q56/q71 integer-LM overflow headroom on a fixture dir:
  * the raise_error guards fire when any corpus unigram/bigram count
  * exceeds Long.MaxValue / LmScale (= 9,223,372 at LmScale 1e12), so
  * this prints the actual maxima alongside the ceiling — the evidence
  * that the integer path holds at the measured scale, and how many
  * more orders of magnitude it has before LmScale must drop.
  *
  * Usage: LmHeadroom <sfDir>  — prints one JSON line.
  */
object LmHeadroom {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: LmHeadroom <sfDir>")
    val spark = graft.GraftSession.local("graft-lm-headroom",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val docs = Tables.documents(spark, args(0))

    val uni = docs.select(explode(split(col("text"), " ")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .agg(max(col("cnt")).as("max_cnt"), sum(col("cnt")).as("total"),
        count(lit(1)).as("vocab"))
      .head()
    val bi = docs.select(
        explode(graft.functions.WordGrams(col("text"), 2)).as("g"))
      .groupBy(col("g")).agg(count(lit(1)).as("cnt2"))
      .agg(max(col("cnt2")).as("max_cnt2"), count(lit(1)).as("vocab2"))
      .head()
    val maxSafe = Long.MaxValue / graft.operators.TextAnalysis.LmScale

    println(s"""{"sf":"${args(0)}","max_unigram_cnt":${uni.getLong(0)},""" +
      s""""total_tokens":${uni.getLong(1)},"vocab":${uni.getLong(2)},""" +
      s""""max_bigram_cnt":${bi.getLong(0)},"bigram_vocab":${bi.getLong(1)},""" +
      s""""long_safe_ceiling":$maxSafe,""" +
      s""""unigram_headroom_x":${maxSafe.toDouble / uni.getLong(0)},""" +
      s""""bigram_headroom_x":${maxSafe.toDouble / bi.getLong(0)}}""")
    spark.stop()
  }
}
