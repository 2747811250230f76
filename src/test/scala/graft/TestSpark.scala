package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites. */
object TestSpark {
  lazy val spark: SparkSession = {
    val wh = java.nio.file.Files.createTempDirectory("graft-wh").toString
    System.setProperty("derby.system.home", wh)
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", s"$wh/warehouse")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf0001 = "/root/testdata/sf0.001"

  /** One executed (AQE-final) plan per registry query at sf0.001,
    * memoized across suites: ScanBudgetSpec and PlanShapeSpec both
    * sweep the whole registry's FINAL plans, and each sweep costs a
    * full query execution per entry — sharing the cache keeps the
    * registry-wide plan invariants at one execution total.
    */
  private val planCache =
    scala.collection.concurrent.TrieMap.empty[String, org.apache.spark.sql.execution.SparkPlan]

  def executedPlan(name: String): org.apache.spark.sql.execution.SparkPlan =
    planCache.getOrElseUpdate(name, {
      val df = Registry.byName(name).run(spark, sf0001)
      df.collect() // drive AQE to the final plan
      df.queryExecution.executedPlan
    })
}
