package graft.tools

import org.apache.spark.sql.SparkSession

/** Dumps formatted physical plans for registry queries — the
  * scale-review loop: check pushdown (PushedFilters/ReadSchema), join
  * strategies (BroadcastHashJoin for dims), and WholeStageCodegen spans.
  *
  * Usage: Explain [queryName ...]  (default: a scale-critical subset)
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local("graft-explain", logLevel = "ERROR")
    // --runtime: execute first, then print the AQE-final executed plan —
    // the only way to see runtime ReusedExchange / broadcast demotions,
    // which the static `explain` cannot show.
    val runtime = args.contains("--runtime")
    val (dir, rest) = args.filterNot(_ == "--runtime").partition(_.startsWith("/"))
    val data = dir.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (rest.nonEmpty) rest.toSeq
    else Seq("q01_project", "q04_filter_eq", "q09_broadcast_enrich",
      "q10_risk_agg", "q11_topk_risk", "q12_sort_limit", "q14_group_agg",
      "q23_minhash_lsh", "q25_jaccard_pairs", "q26_cosine_topk",
      "q34_ann_lsh", "q39_ivf_ann")
    names.foreach { n =>
      println(s"\n================ $n ================")
      val df = graft.Registry.byName(n).run(spark, data)
      if (runtime) {
        // collect() drives THIS df's queryExecution to the AQE-final
        // plan (df.count() would execute a separate QueryExecution and
        // leave this one isFinalPlan=false)
        df.collect()
        println(df.queryExecution
          .explainString(org.apache.spark.sql.execution.FormattedMode).take(14000))
      } else df.explain("formatted")
    }
    spark.stop()
  }
}
