package graft.tools

import graft.Tables
import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Measures IVF recall vs nProbe on a fixture dir — the evidence for
  * "the recall lever at a fixed centroid set is probe count, not a
  * better fit": sweeps nProbe over the same queries and compares each
  * sweep against the brute-force top-k. nProbe == numCells degenerates
  * to exact search (recall 1.0 by construction), so the curve shows
  * what fraction of brute-force cost each recall level buys.
  *
  * Usage: IvfProbeCurve <sfDir> [numCells=16] [k=5]  — one JSON line.
  */
object IvfProbeCurve {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: IvfProbeCurve <sfDir> [numCells] [k]")
    val sfDir = args(0)
    val numCells = if (args.length > 1) args(1).toInt else 16
    val k = if (args.length > 2) args(2).toInt else 5
    val spark = graft.GraftSession.local("graft-ivf-probe-curve",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val emb = Tables.embeddings(spark, sfDir)
    val queryPred = col("vec_id") % 100 === 0

    val exact = Similarity.cosineTopK(emb, queryPred, k)
      .select("qid", "nid").localCheckpoint()
    val nExact = exact.count()
    require(nExact > 0, s"no exact top-k pairs: no vec_id % 100 == 0 " +
      s"rows in $sfDir — recall would divide by zero")
    // drop sweep points >= numCells (nProbe saturates there) and keep
    // exactly one numCells point, so small cell counts (e.g. 4) don't
    // sweep an out-of-range probe or a duplicate
    val probes = Seq(1, 2, 4, 8).filter(_ < numCells) :+ numCells
    val curve = probes.map { p =>
      val t0 = System.nanoTime()
      val approx = Similarity.ivfTopK(emb, queryPred, k,
        numCells = numCells, nProbe = p).select("qid", "nid")
      val hits = exact.join(approx, Seq("qid", "nid"), "left_semi").count()
      val sec = (System.nanoTime() - t0) / 1e9
      (p, hits.toDouble / nExact, sec)
    }
    val items = curve.map { case (p, r, s) =>
      s"""{"nprobe":$p,"recall":$r,"sec":$s}""" }.mkString(",")
    // close the loop: feed the measured curve + the measured cell
    // balance into the operational planner, so the tool's output ends
    // in a verdict, not just data (target recall 0.9, the SCALE.md
    // operating point)
    val plan = Similarity.recommendNProbe(
      Similarity.cellBalance(emb, numCells), targetRecall = 0.9,
      measuredCurve = curve.map { case (p, r, _) => (p, r) })
    println(s"""{"sf":"$sfDir","num_cells":$numCells,"k":$k,""" +
      s""""exact_pairs":$nExact,"curve":[$items],""" +
      s""""recommended_nprobe":${plan.nProbe},"use_exact":${plan.useExact},""" +
      s""""probed_share":${plan.probedShare},"max_load_factor":${plan.maxLoadFactor}}""")
    spark.stop()
  }
}
