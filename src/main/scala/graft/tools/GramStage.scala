package graft.tools

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Probes the documented stage-aggregates BOUNDARY (ScanBudgetSpec
  * header: "gram-volume branches recompute") with numbers instead of
  * prose: would a staged DISTINCT `(doc_id, gh)` 8-gram-hash artifact
  * beat re-exploding the corpus for the contamination family? A/B in
  * one JVM (the BigramStage discipline): q42 and q43 raw vs
  * artifact-fed equivalents (source/split re-attach row-local or via
  * the thin-projection join, the q64 pattern), plus the artifact's
  * cold write cost and on-disk size — the 100 TB argument is BYTES
  * (the gram stream is ≈ tokens-per-doc × 16 B, several times the
  * compressed corpus), so the verdict must weigh both axes.
  *
  * Usage: GramStage <sfDir>
  */
object GramStage {
  def main(args: Array[String]): Unit = {
    require(args.length >= 1, "usage: GramStage <sfDir>")
    val d = args(0)
    val spark = graft.GraftSession.local("graft-gram-stage",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import graft.operators.TrainingData

    def time(f: => DataFrame): Double = {
      val t0 = System.nanoTime(); f.count(); (System.nanoTime() - t0) / 1e9
    }
    def min3(f: => DataFrame): Double = Seq.fill(3)(time(f)).min

    // raw forms built inline: the registry queries ride the staged
    // artifact since this tool's sf1/sf10 verdict promoted it, so the
    // A/B must reconstruct the pre-stage shapes explicitly
    val q42raw = min3(TrainingData.sharedSourcePairs(
      Tables.documents(spark, d).select(col("source"),
        explode(graft.functions.GramHashes(col("text"), 8, 16)).as("gh"))))
    val q43raw = min3(TrainingData.contaminatedTestDocs(
      Tables.documents(spark, d)))

    val out = java.nio.file.Files.createTempDirectory("graft-grams")
      .toString + "/grams.parquet"
    val t0 = System.nanoTime()
    Tables.documents(spark, d)
      .select(col("doc_id"),
        explode(graft.functions.GramHashes(col("text"), 8, 16)).as("gh"))
      .dropDuplicates("doc_id", "gh")
      .write.mode("overwrite").parquet(out)
    val coldSec = (System.nanoTime() - t0) / 1e9
    def ghs = spark.read.parquet(out)
    val bytes = {
      def size(f: java.io.File): Long =
        if (f.isDirectory) Option(f.listFiles()).map(_.map(size).sum).getOrElse(0L)
        else f.length()
      size(new java.io.File(out))
    }

    // staged forms: the PROMOTED production kernels, fed this tool's
    // own artifact copy (so cold cost is measured, not cache-served)
    def q42stg = TrainingData.sharedSourcePairs(ghs
      .join(Tables.documents(spark, d).select(col("doc_id"), col("source")),
        "doc_id")
      .select(col("source"), col("gh")))
    def q43stg = TrainingData.contaminatedTestDocsFromGrams(ghs)

    val s42 = min3(q42stg)
    val s43 = min3(q43stg)
    println(f"""{"sfDir":"$d","q42_raw":$q42raw%.3f,"q42_staged":$s42%.3f,""" +
      f""""q43_raw":$q43raw%.3f,"q43_staged":$s43%.3f,""" +
      f""""stage_cold_sec":$coldSec%.3f,"stage_bytes":$bytes,""" +
      f""""artifact_rows":${ghs.count()}}""")
    spark.stop()
  }
}
