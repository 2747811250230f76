package graft.tools

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.window.WindowExec

/** Diagnostic sweep: for every registry query, count the unpartitioned
  * (single-partition) WindowExec nodes in the pre-AQE physical plan and
  * print what bounds each one's input subtree. Feeds the
  * WindowBoundSpec allow-list — not a query path.
  */
object WindowAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = graft.GraftSession.local("graft-window-audit", "8")
    graft.Registry.all.foreach { q =>
      try {
        val plan = q.run(spark, sfDir).queryExecution.sparkPlan
        val wins = plan.collect { case w: WindowExec if w.partitionSpec.isEmpty => w }
        if (wins.nonEmpty) {
          val bounds = wins.map { w =>
            val sub = w.child.collect { case p: SparkPlan => p.nodeName }
            sub.filter(n => n.contains("Aggregate") || n.contains("TakeOrdered") ||
              n.contains("Limit") || n.contains("WindowGroupLimit") ||
              n.contains("Join")).distinct.mkString("+")
          }
          println(s"${q.name}: ${wins.size} unpartitioned windows; bounded-by: ${bounds.mkString(" | ")}")
        }
      } catch { case e: Throwable => println(s"${q.name}: ERROR ${e.getMessage}") }
    }
    spark.stop()
  }
}
