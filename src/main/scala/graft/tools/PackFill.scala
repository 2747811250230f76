package graft.tools

import graft.{Registry, Tables}
import graft.operators.{TextAnalysis, TrainingData}
import org.apache.spark.sql.functions._

/** The round-14 "q77 re-measured under BPE lengths" receipt: per-shard
  * next-fit fill fractions for the SAME corpus packed under the two
  * token currencies — whitespace words (q46/q77's rule) and q99 BPE
  * symbols (q102's) — at capacity ratios matched to the corpus's
  * measured BPE compression, so the comparison isolates the currency's
  * effect on packing waste rather than a capacity mismatch. Prints one
  * JSON line per currency: min/mean/max fill_frac across shards plus
  * pack counts.
  *
  * Usage: PackFill <sfDir>
  */
object PackFill {

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: PackFill <sfDir>")
    val dir = args(0)
    val spark = graft.GraftSession.local("graft-packfill")

    def summarize(tag: String, packs: org.apache.spark.sql.DataFrame,
        capacity: Long): String = {
      val eff = TrainingData.packEfficiency(packs, capacity)
        .select(col("shard"), col("n_packs"), col("fill_frac"))
        .collect()
      val fills = eff.map(_.getAs[Double]("fill_frac"))
      val nPacks = eff.map(_.getAs[Long]("n_packs")).sum
      f"""{"currency":"$tag","capacity":$capacity,"packs":$nPacks,""" +
        f""""fill_min":${fills.min}%.4f,"fill_mean":${fills.sum / fills.length}%.4f,""" +
        f""""fill_max":${fills.max}%.4f}"""
    }

    val compression = TextAnalysis
      .bpeApplyFromCounts(Tables.documents(spark, dir)
        .select(col("doc_id"), explode(split(coalesce(col("text"), lit("")), " ")).as("w"))
        .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("cnt")))
      .agg(sum(col("n_bpe_tokens")).cast("double") /
        sum(col("n_ws_tokens")).cast("double")).head().getDouble(0)
    println(f"""{"bpe_compression":$compression%.4f}""")

    println(summarize("whitespace",
      Registry.byName("q46_pack_sequences").run(spark, dir),
      TrainingData.PackCapacity))
    println(summarize("bpe",
      Registry.byName("q102_pack_bpe").run(spark, dir),
      TrainingData.BpePackCapacity))
    spark.stop()
  }
}
