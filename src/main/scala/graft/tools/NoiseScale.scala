package graft.tools

/** Times the q92 label-noise kernel at a caller-chosen IVF cell count —
  * the production-sizing experiment behind the sf10 scale table
  * (SCALE.md round 13): the registry q92 runs the 16-cell DEMO
  * configuration, whose CellCap² ceiling saturates once cells exceed
  * the cap (at sf10: 16 cells × 10k² = 1.6B scored pairs — bounded,
  * but the whole bound). Production sizes numCells ∝ corpus so
  * per-cell populations stay ~constant and total pair work grows
  * LINEARLY; this tool demonstrates exactly that on the same fixture.
  * Same timing convention as [[TimeQuery]] (one warm pass, min of 3).
  *
  * Usage: NoiseScale <sfDir> <numCells>...
  */
object NoiseScale {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: NoiseScale <sfDir> <numCells>...")
    val spark = graft.GraftSession.local("graft-noise-scale",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    args.drop(1).foreach { nc =>
      val n = nc.toInt
      def pass(): Double = {
        val t0 = System.nanoTime()
        graft.operators.Similarity
          .labelNoise(graft.Tables.embeddings(spark, args(0)), numCells = n)
          .count()
        (System.nanoTime() - t0) / 1e9
      }
      pass()
      println(s"""{"tool":"noise_scale","num_cells":$n,"sec":${Seq.fill(3)(pass()).min}}""")
    }
    spark.stop()
  }
}
