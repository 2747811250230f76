package graft.tools

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec

/** Shared-scan audit for the dedup/similarity family: executes each
  * query at the given scale and counts, in the AQE-FINAL plan (walked
  * node-by-node, not text-grepped — stage dumps reprint subtrees),
  * the distinct parquet scans, exchanges, and reused exchanges. The
  * SCALE.md round-11 table comes from this sweep. Not a query path.
  *
  * Usage: ScanAudit [sfDir] [queryName ...]
  */
object ScanAudit {

  def deepNodes(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => Seq(a) ++ deepNodes(a.executedPlan)
    case q: QueryStageExec => Seq(q) ++ deepNodes(q.plan)
    case r: ReusedExchangeExec => Seq(r) // do NOT descend: the child is the shared subtree
    case other => Seq(other) ++ other.children.flatMap(deepNodes)
  }

  def main(args: Array[String]): Unit = {
    val (dirs, rest) = args.partition(_.startsWith("/"))
    val sfDir = dirs.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (rest.nonEmpty) rest.toSeq else Seq(
      "q22_dedup_exact", "q23_minhash_lsh", "q25_jaccard_pairs",
      "q44_dup_clusters", "q53_canonical_docs", "q57_incremental_dedup",
      "q59_verified_ingest", "q63_dup_span_frac", "q65_containment_pairs",
      "q66_dup_token_coverage", "q72_dup_profile", "q74_lsh_quality",
      "q88_dup_spans")
    val spark = graft.GraftSession.local("graft-scan-audit", "8", logLevel = "ERROR")
    names.foreach { n =>
      val df = graft.Registry.byName(n).run(spark, sfDir)
      df.collect() // drive to the AQE-final plan
      val nodes = deepNodes(df.queryExecution.executedPlan)
      val scans = nodes.collect { case s: FileSourceScanExec => s }
      val reused = nodes.count(_.isInstanceOf[ReusedExchangeExec])
      val exch = nodes.count(_.nodeName.contains("Exchange"))
      val tables = scans.map(_.relation.location.rootPaths.mkString)
        .groupBy(identity).map { case (p, l) =>
          s"${p.split('/').last}x${l.size}" }.toSeq.sorted.mkString(",")
      println(s"$n scans=${scans.size} [$tables] exchanges=$exch reusedExchanges=$reused")
    }
    spark.stop()
  }
}
