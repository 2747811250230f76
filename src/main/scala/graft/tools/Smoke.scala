package graft.tools

import org.apache.spark.sql.SparkSession

/** Smoke-runs the driver contract surface: SparkEntry.entry (flagship,
  * sf0.001) exactly as the driver's t1 smoke does.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.entry(spark)
    val n = df.count()
    println(s"entry rows=$n")
    df.show(10, false)
    spark.stop()
  }
}
