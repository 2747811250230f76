package graft.tools

import org.apache.spark.sql.functions._

/** Measures the fused [[graft.functions.NormalizeText]] kernel against
  * the five-stage regexp chain it replaces (`normalizeTextChain`) on a
  * corpus large enough that per-byte work, not job overhead, dominates —
  * the q81 registry query at fixture scale cannot show the difference
  * (~0.2s job floor either way, SCALE.md round-10 note).
  *
  * Three workloads: clean ASCII (the fast-path case the fusion returns
  * untouched), dirty ASCII (controls/CRLF/double spaces — both forms do
  * real work, no NFC), dirty unicode (the full slow path incl. NFC).
  *
  * Usage: NormBench [nRows] (default 2,000,000)
  */
object NormBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 2000000L
    val spark = graft.GraftSession.local("graft-norm-bench",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import spark.implicits._

    val clean = "the quick brown fox jumps over the lazy dog and keeps going"
    val dirtyAscii = "  the\tquick  brown fox\r\njumps over  the lazy\tdog  "
    val dirtyUni = "\u00A0\u00A0the quick\u200B cafe\u0301 fox\r\nnai\u0308ve dog\u3000"

    def bench(label: String, text: String): Unit = {
      val df = spark.range(n).select(concat(lit(text), lit(" "),
        (col("id") % 1000).cast("string")).as("t")).localCheckpoint()
      def time(c: org.apache.spark.sql.Column): Double = {
        val runs = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          df.select(sum(length(c))).head()
          (System.nanoTime() - t0) / 1e9
        }
        runs.min
      }
      val chain = time(graft.operators.TextAnalysis.normalizeTextChain(col("t")))
      val fused = time(graft.operators.TextAnalysis.normalizeText(col("t")))
      println(f"""{"workload":"$label","rows":$n,"chain_sec":$chain%.3f,"fused_sec":$fused%.3f,"speedup":${chain / fused}%.2f}""")
      df.unpersist(blocking = true)
    }
    bench("clean_ascii", clean)
    bench("dirty_ascii", dirtyAscii)
    bench("dirty_unicode", dirtyUni)
    spark.stop()
  }
}
