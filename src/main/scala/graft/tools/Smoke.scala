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
      val failures = names.flatMap { name =>
        try {
          val rows = graft.SparkEntry.queries(name)(spark, dir).count()
          println(s"ok   $name rows=$rows")
          if (rows == 0) println(s"WARN $name returned 0 rows")
          None
        } catch {
          case e: Throwable =>
            println(s"FAIL $name: ${e.getClass.getSimpleName}: " +
              s"${Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString}")
            Some(name)
        }
      }
      println(s"swept ${names.size} queries on $dir, ${failures.size} failed" +
        (if (failures.nonEmpty) s": ${failures.mkString(", ")}" else ""))
      if (failures.nonEmpty) sys.exit(1)
    }
    spark.stop()
  }
}
