package graft.tools

import graft.Tables
import graft.operators.TrainingData
import org.apache.spark.sql.functions._

/** Threshold-sweep receipt for Curate's decontamination gate (round
  * 15): for each candidate `decontamMinSharedGrams` setting, how many
  * test docs the gate would drop under the md5 split — ONE pass over
  * the gram kernel (the per-doc shared-gram counts are computed once;
  * the sweep is a counting aggregation over that frame). Prints one
  * JSON line for SCALE.md.
  *
  * Usage: DecontamSweep <sfDir> [thresholds, default 1,2,4,8,16,32]
  */
object DecontamSweep {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: DecontamSweep <sfDir> [t1,t2,...]")
    val sfDir = args(0)
    val ts = if (args.length > 1) args(1).split(",").map(_.toLong).toSeq
      else Seq(1L, 2L, 4L, 8L, 16L, 32L)
    val spark = graft.GraftSession.local("graft-decontam-sweep",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val split = docs.withColumn("split", TrainingData.splitColumn)
    val nTest = split.filter(col("split") === "test").count()
    val counts = TrainingData.contaminatedTestDocsWithSplit(split)
      .persist()
    try {
      val dropped = ts.map(t =>
        t -> counts.filter(col("n_shared_grams") >= t).count())
      def pct(n: Long) = math.rint(n * 10000.0 / math.max(1L, nTest)) / 100
      val sweep = dropped.map { case (t, n) =>
        s""""$t":{"dropped":$n,"pct":${pct(n)}}"""
      }.mkString("{", ",", "}")
      println(s"""{"sf":"$sfDir","n_test":$nTest,"sweep":$sweep}""")
    } finally { counts.unpersist(); () }
    spark.stop()
  }
}
