package graft.tools

import org.apache.spark.sql.execution.FormattedMode

/** Measures a registry query's COLD first execution against its WARM
  * repeat in the same session — the number the round bench cannot
  * show for cache-backed queries (q61's fused ensemble persists its
  * word/gram pre-aggregates, so every bench pass after the first is
  * cache-warm by design; the fusion argument is about the COLD
  * full-corpus passes). Reports both walls plus the materialized
  * parquet-scan count and InMemoryTableScan presence from each run's
  * AQE-final plan, so the cache's plan-level effect is visible, not
  * inferred.
  *
  * The first execution of this JVM is genuinely cold: fresh session,
  * empty CacheManager. JIT/codegen warm-up therefore lands in the
  * cold number too — that matches what a production pipeline's first
  * ensemble invocation pays.
  *
  * Usage: ColdWarm <sfDir> [queryName=q61_quality_ensemble]
  * Prints one JSON line.
  */
object ColdWarm {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ColdWarm <sfDir> [queryName]")
    val sfDir = args(0)
    val name = if (args.length > 1) args(1) else "q61_quality_ensemble"
    val spark = graft.GraftSession.local("graft-cold-warm",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val q = graft.Registry.byName(name)

    def pass(): (Double, Int, Boolean) = {
      val df = q.run(spark, sfDir)
      val t0 = System.nanoTime()
      df.count()
      val sec = (System.nanoTime() - t0) / 1e9
      val plan = df.queryExecution.explainString(FormattedMode)
      val scanIds = """Scan parquet\s+\((\d+)\)""".r
        .findAllMatchIn(plan).map(_.group(1)).toSet
      (sec, scanIds.size, plan.contains("InMemoryTableScan"))
    }

    val (coldSec, coldScans, coldMem) = pass()
    val (warmSec, warmScans, warmMem) = pass()
    println(s"""{"query":"$name","sf":"$sfDir",""" +
      s""""cold_sec":$coldSec,"cold_scans":$coldScans,"cold_uses_cache":$coldMem,""" +
      s""""warm_sec":$warmSec,"warm_scans":$warmScans,"warm_uses_cache":$warmMem}""")
    spark.stop()
  }
}
