package graft
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.local("graft-bench", cpus)
    // Queries run in catalog (name) order with one untimed warm pass
    // each: the warm pass absorbs one-time JIT/codegen/scan-setup cost
    // that otherwise lands on whichever query a Map iterates first.
    val names = SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      try SparkEntry.queries(name)(spark, sfDir).count()
      catch { case _: Throwable => () }
    }
    // Two timed passes, report the min: single-pass numbers jitter up to
    // ±60% per query under VM noise. A query that throws reports -1 so
    // a deterministic failure is never mistaken for a fast run.
    val results = names.map { name =>
      def timed(): Double = {
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      name -> (try math.min(timed(), timed()) catch { case _: Throwable => -1.0 })
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val failed = results.count(_._2 < 0)
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
