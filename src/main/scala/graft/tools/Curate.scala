package graft.tools

import graft.Tables
import graft.operators.{Dedup, TextAnalysis, TrainingData}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end corpus-curation pipeline: the training-data operators
  * composed the way a dataset build actually runs them, each stage a
  * reusable public kernel (no query re-implementation here):
  *
  *   1. near-dup clustering (capped LSH candidates → connected
  *      components) and CANONICALIZATION — keep one doc per cluster;
  *   2. per-language quality percentile filter over the survivors;
  *   3. deterministic train/val/test hash split;
  *   4. decontamination — drop test docs sharing a long n-gram with
  *      any train doc;
  *   5. next-fit token packing of the train split.
  *
  * Stage order matters and is deliberate: dedup BEFORE the quality
  * percentile (duplicate families would otherwise vote themselves past
  * the percentile), decontamination AFTER the split exists, packing
  * only over the final train set. Each stage writes parquet so any
  * stage is restartable/inspectable — the same reason the reference
  * staged through files, minus the per-message hop.
  *
  * Usage: Curate <sfDir> [outDir]
  */
object Curate {

  final case class StageCounts(input: Long, afterDedup: Long,
      afterQuality: Long, train: Long, val_ : Long, testClean: Long,
      testDropped: Long, trainPacks: Long)

  def run(spark: SparkSession, sfDir: String, outDir: String): StageCounts = {
    val docs = Tables.documents(spark, sfDir)

    // 1. cluster near-dups over the capped LSH candidate pairs; a doc is
    // a duplicate iff its component label is some OTHER (smaller) doc
    val dupes = Dedup.dupClusters(Dedup.candidatePairs(spark, sfDir))
      .filter(col("doc_id") =!= col("cluster_id"))
      .select("doc_id")
    val deduped = docs.join(dupes, Seq("doc_id"), "left_anti")
    deduped.write.mode("overwrite").parquet(s"$outDir/deduped")

    // 2. quality gate: top half per language among the survivors
    val kept = TextAnalysis.qualityFilter(deduped, keepFrac = 0.5)
      .select("doc_id")
    val curated = deduped.join(kept, Seq("doc_id"), "left_semi")

    // 3. split assignment (stable across runs: pure function of doc_id)
    val splitDocs = curated.withColumn("split", TrainingData.splitColumn)
    splitDocs.write.mode("overwrite").parquet(s"$outDir/splits")

    // 4. decontaminate: test docs sharing an 8-gram with train are out
    val contaminated = TrainingData.contaminatedTestDocs(splitDocs)
      .select("doc_id")
    val clean = splitDocs.join(contaminated, Seq("doc_id"), "left_anti")
    clean.write.mode("overwrite").parquet(s"$outDir/clean")

    // 5. pack the train split into fixed token budgets
    val packed = TrainingData.packSequences(
      clean.filter(col("split") === "train"), shards = 8, capacity = 512L)
    packed.write.mode("overwrite").parquet(s"$outDir/train_packed")

    def n(df: DataFrame): Long = df.count()
    val bySplit = clean.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    StageCounts(
      input = n(docs),
      afterDedup = n(deduped),
      afterQuality = n(curated),
      train = bySplit.getOrElse("train", 0L),
      val_ = bySplit.getOrElse("val", 0L),
      testClean = bySplit.getOrElse("test", 0L),
      testDropped = n(splitDocs.filter(col("split") === "test")) -
        bySplit.getOrElse("test", 0L),
      trainPacks = packed.select("shard", "pack_id").distinct().count())
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: Curate <sfDir> [outDir]")
    val outDir = if (args.length > 1) args(1)
      else java.nio.file.Files.createTempDirectory("curate").toString
    val spark = graft.GraftSession.local("graft-curate")
    val c = run(spark, args(0), outDir)
    println(s"curate: $c -> $outDir")
    spark.stop()
  }
}
