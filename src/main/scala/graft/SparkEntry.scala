package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (plus the training-data
  * extensions) is registered in [[Registry]] as a named query with a
  * DuckDB oracle; this object just exposes the contract shape the driver
  * expects.
  */
object SparkEntry {

  /** The driver calls this surface with a session it built itself, which
    * won't have the events-table nanos conf GraftSession sets. Ensuring
    * it here (idempotent, constant value — concurrent sets are benign)
    * keeps the conf out of the per-read path in Tables.apply while still
    * accepting externally-owned sessions at the contract boundary.
    */
  private def ensureConf(spark: SparkSession): Unit =
    if (!spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"))
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

  /** Flagship query (SURVEY.md §3.3 end-to-end analytics path) on
    * sf=0.001; driver smoke-checks rows > 0.
    */
  def entry(spark: SparkSession): DataFrame = {
    ensureConf(spark)
    operators.RiskScoring.flagship(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.all.map(q => q.name -> { (s: SparkSession, d: String) =>
      ensureConf(s); q.run(s, d)
    }).toMap

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    Registry.all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
