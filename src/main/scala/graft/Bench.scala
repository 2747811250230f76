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
    // Three timed passes, report the per-query MIN (the BENCH_sf1.json
    // convention, adopted for round benches too): single-pass numbers
    // jitter up to ±60% per query under VM noise, and min-of-3 is the
    // stable estimator of the query's actual cost on this box. The
    // per-query max/min ratio is emitted alongside ("spread") so a
    // round-over-round delta can be read against the measured noise
    // band instead of re-litigated. A query that throws reports -1 so
    // a deterministic failure is never mistaken for a fast run.
    val runs = 3
    val results = names.map { name =>
      def timed(): Double = {
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      name -> (try Seq.fill(runs)(timed()) catch { case _: Throwable => Seq(-1.0) })
    }
    def jmap(f: Seq[Double] => Double) = results
      .map { case (k, ts) => s"\"" + k + "\":" + f(ts) }
      .mkString("{", ",", "}")
    val qs = jmap(_.min)
    val spread = jmap(ts =>
      if (ts.min > 0) math.rint(ts.max / ts.min * 100) / 100 else -1.0)
    val total = results.map(_._2.min).filter(_ >= 0).sum
    val failed = results.count(_._2.min < 0)
    // Key order matters for the archived artifact: the driver stores
    // only the TAIL of this line, so the per-query seconds map goes
    // LAST (r10's artifact captured only the spread map and was
    // unreadable without a re-run). A cold reader of BENCH_rN.json
    // always sees per-query times.
    println(s"""{"metric":"total","value":$total,"unit":"sec","failed":$failed,"runs":$runs,"spread":$spread,"sf":"$sfDir","queries":$qs}""")
    spark.stop()
  }
}
