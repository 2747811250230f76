package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off environment probe: ANSI default, parquet timestamp type,
  * behavior of element_at / casts under the session defaults.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local("graft-probe", logLevel = "ERROR")
    println("ansi=" + spark.conf.get("spark.sql.ansi.enabled"))
    println("ntzInfer=" + spark.conf.get("spark.sql.parquet.inferTimestampNTZ.enabled"))
    val e0 = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    e0.printSchema()
    // Tables.apply owns the schema-adaptive ts normalization (raw-nanos
    // LongType on legacy fixtures vs native timestamp on current ones).
    val e = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "ts", "event_type", "props")
    e.printSchema()
    e.selectExpr(
      "date_format(ts, 'yyyy-MM-dd HH:mm:ss') AS s",
      "date_format(from_utc_timestamp(cast(ts as timestamp), 'America/Los_Angeles'), 'yyyy-MM-dd HH:mm:ss') AS pst",
      "try_cast(event_type AS BIGINT) AS tc"
    ).show(3, false)
    spark.sql("SELECT md5('abc') AS m, element_at(array(1,2), 1) AS ea, 1/2 AS div, regexp_extract('abc','([0-9]+)',1) AS nomatch").show(false)
    spark.stop()
  }
}
