package graft.tools

import org.apache.spark.sql.functions._

/** Times the q39 IVF-ANN kernel at a caller-chosen cell count — the
  * [[NoiseScale]] experiment for the OTHER fixed-16-cell demo consumer
  * (SCALE.md round 13): at sf10 both the query count and the per-cell
  * population grow 10×, so the demo configuration's probed work grows
  * ~100× (measured 1.2 → 54 s). Production sizes numCells ∝ corpus,
  * which holds per-cell populations constant and makes per-query work
  * flat; this tool measures exactly that on the same fixture. Timing
  * convention: one warm pass, min of 3.
  *
  * Usage: IvfScale <sfDir> <numCells>...
  */
object IvfScale {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: IvfScale <sfDir> <numCells>...")
    val spark = graft.GraftSession.local("graft-ivf-scale",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val emb = graft.Tables.embeddings(spark, args(0))
    args.drop(1).foreach { nc =>
      val n = nc.toInt
      def pass(): Double = {
        val t0 = System.nanoTime()
        graft.operators.Similarity
          .ivfTopK(emb, col("vec_id") % 100 === 0, k = 5, numCells = n)
          .count()
        (System.nanoTime() - t0) / 1e9
      }
      pass()
      println(s"""{"tool":"ivf_scale","num_cells":$n,"sec":${Seq.fill(3)(pass()).min}}""")
    }
    spark.stop()
  }
}
