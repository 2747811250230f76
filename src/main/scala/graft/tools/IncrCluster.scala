package graft.tools

import graft.Tables
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Scale receipt for the incremental cluster-map merge (round 15):
  * times the full from-scratch re-cluster of a corpus against the
  * incremental path (stored state for 90% of the corpus, one +10%
  * batch folded in with updateClusterState), asserts the two maps are
  * identical, and prints one JSON line. The `update_s` number is what
  * the Curate dedup head pays PER RUN once state exists — the full
  * re-cluster was 141 s of sf10's 183 s pipeline wall.
  *
  * Usage: IncrCluster <sfDir>
  */
object IncrCluster {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: IncrCluster <sfDir>")
    val sfDir = args(0)
    val spark = graft.GraftSession.local("graft-incr-cluster",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    // full from-scratch rebuild (what Curate paid every run before)
    val (_, fullS) = timed {
      Dedup.dupClusters(Dedup.candidatePairsOf(docs)).count()
    }

    // incremental: init state on 90%, then fold the +10% batch in
    val dir = java.nio.file.Files.createTempDirectory("incr-cluster").toString
    val (_, initS) = timed {
      Dedup.writeClusterState(docs.filter(col("doc_id") % 10 =!= 9), dir)
    }
    val (merged, updateS) = timed {
      val m = Dedup.updateClusterState(spark, dir, docs)
      m.count(); m
    }

    // identity check against the rebuild, row for row. Divergence is
    // allowed ONLY in the documented mega-bucket corner (scope-local
    // cap decisions — see updateClusterState's scaladoc), which is
    // counted here: buckets over BandCap corpus-wide whose batch slice
    // is under it. No corner buckets => the maps must be identical.
    val full = Dedup.dupClusters(Dedup.candidatePairsOf(docs))
    val diff = merged.withColumnRenamed("cluster_id", "m")
      .join(full, Seq("doc_id"), "full_outer")
      .filter(col("m").isNull || col("cluster_id").isNull ||
        col("m") =!= col("cluster_id"))
      .count()
    val corner = Dedup.capCornerBuckets(docs,
      col("doc_id") % 10 =!= 9).count()
    val rows = merged.count()
    def r(x: Double) = math.rint(x * 1000) / 1000
    println(s"""{"sf":"$sfDir","rows":$rows,"full_s":${r(fullS)},""" +
      s""""init_s":${r(initS)},"update_s":${r(updateS)},""" +
      s""""speedup":${r(fullS / updateS)},"map_diff_rows":$diff,""" +
      s""""cap_corner_buckets":$corner}""")
    require(corner > 0 || diff == 0,
      s"incremental map diverged outside the cap corner: $diff rows")
    spark.stop()
  }
}
