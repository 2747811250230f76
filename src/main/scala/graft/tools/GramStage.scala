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

    val q42raw = min3(graft.Registry.byName("q42_contamination").run(spark, d))
    val q43raw = min3(graft.Registry.byName("q43_decontaminate").run(spark, d))

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

    // q42 off the artifact: thin (doc_id, source) attach, same tail
    def q42stg = ghs
      .join(Tables.documents(spark, d).select(col("doc_id"), col("source")), "doc_id")
      .groupBy(col("gh"))
      .agg(sort_array(collect_set(col("source"))).as("srcs"))
      .filter(size(col("srcs")) >= 2)
      .select(explode(expr(
        "flatten(transform(srcs, (x, i) -> " +
          "transform(slice(srcs, i + 2, size(srcs)), " +
          "y -> named_struct('sa', x, 'sb', y))))")).as("p"))
      .groupBy(col("p.sa").as("source_a"), col("p.sb").as("source_b"))
      .agg(count(lit(1)).as("n_shared"))
    // q43 off the artifact: split derives row-locally from doc_id
    def q43stg = ghs
      .withColumn("split", TrainingData.splitColumn)
      .groupBy(col("gh"))
      .agg(
        max(when(col("split") === "train", 1).otherwise(0)).as("has_train"),
        collect_set(when(col("split") === "test", col("doc_id"))).as("test_docs"))
      .filter(col("has_train") === 1 && size(col("test_docs")) > 0)
      .select(explode(col("test_docs")).as("doc_id"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared_grams"))

    val s42 = min3(q42stg)
    val s43 = min3(q43stg)
    println(f"""{"sfDir":"$d","q42_raw":$q42raw%.3f,"q42_staged":$s42%.3f,""" +
      f""""q43_raw":$q43raw%.3f,"q43_staged":$s43%.3f,""" +
      f""""stage_cold_sec":$coldSec%.3f,"stage_bytes":$bytes,""" +
      f""""artifact_rows":${ghs.count()}}""")
    spark.stop()
  }
}
