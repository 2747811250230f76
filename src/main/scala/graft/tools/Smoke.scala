package graft.tools

/** Smoke-runs the driver contract surface: SparkEntry.entry (flagship,
  * sf0.001) exactly as the driver's t1 smoke does; with `--all` it also
  * sweeps EVERY registry query on sf0.001 (count only, no oracle) — the
  * cheap last-act round gate that catches fixture-schema drift before a
  * hand-off (the round-7 lesson: the fixtures can change under a round;
  * README "Round ritual").
  *
  * Usage: Smoke [--all] [sfDir=/root/testdata/sf0.001]
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val all = args.contains("--all")
    val dir = args.filterNot(_ == "--all").headOption
      .getOrElse("/root/testdata/sf0.001")
    val spark = graft.GraftSession.local("graft-smoke")
    val df = graft.SparkEntry.entry(spark)
    val n = df.count()
    println(s"entry rows=$n")
    df.show(10, false)
    if (all) {
      val names = graft.SparkEntry.queries.keys.toSeq.sorted
      val results = names.map { name =>
        try {
          val rows = graft.SparkEntry.queries(name)(spark, dir).count()
          println(s"ok   $name rows=$rows")
          (name, Some(rows))
        } catch {
          case e: Throwable =>
            println(s"FAIL $name: ${e.getClass.getSimpleName}: " +
              s"${Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString}")
            (name, None)
        }
      }
      val failures = results.collect { case (n, None) => n }
      // A query that silently empties (fixture drift, a filter gone
      // over-strict) must not pass the round gate: 0 rows is a failure
      // unless the query is expected-empty at smoke scale.
      val zeroRows = results.collect { case (n, Some(0L)) => n }
        .filterNot(MayBeEmpty)
      println(s"swept ${names.size} queries on $dir, " +
        s"${failures.size} failed, ${zeroRows.size} unexpectedly empty" +
        (if (failures.nonEmpty) s"; failed: ${failures.mkString(", ")}"
         else "") +
        (if (zeroRows.nonEmpty) s"; empty: ${zeroRows.mkString(", ")}"
         else ""))
      if (failures.nonEmpty || zeroRows.nonEmpty) {
        spark.stop()
        sys.exit(1)
      }
    }
    spark.stop()
  }

  /** Queries allowed to return 0 rows at smoke scale (sf0.001): the
    * adversarial/contamination probes whose hit sets are legitimately
    * empty on a tiny clean fixture. Everything else returning 0 rows
    * is treated as fixture drift and fails the sweep.
    */
  private val MayBeEmpty: Set[String] = Set()
}
