package graft

import org.apache.spark.sql.SparkSession

/** One place for the session-level configuration every graft entry point
  * needs. In particular `spark.sql.legacy.parquet.nanosAsLong` must be on
  * BEFORE the events table is first read (its parquet type is
  * TIMESTAMP(NANOS), which the vectorized reader otherwise rejects) — it
  * lives here, once per session, instead of as a per-read side effect in
  * `Tables.apply`, which would be racy under concurrent queries.
  */
object GraftSession {
  def local(appName: String, cpus: String = "4", logLevel: String = "WARN"): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel(logLevel)
    s
  }
}
