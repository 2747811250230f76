package graft.tools

import org.apache.spark.sql.SparkSession

/** Smoke-runs the driver contract surface: SparkEntry.entry (flagship,
  * sf0.001) exactly as the driver's t1 smoke does.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local("graft-smoke")
    val df = graft.SparkEntry.entry(spark)
    val n = df.count()
    println(s"entry rows=$n")
    df.show(10, false)
    spark.stop()
  }
}
