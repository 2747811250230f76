package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Date-partitioned table layout: the canonical 100 TB scan lever.
  *
  * Facts are written as `path/event_date=YYYY-MM-DD/part-*.parquet`;
  * any query with a date predicate then prunes whole directories at
  * planning time (`PartitionFilters` in the scan, asserted in
  * PartitionedLayoutSpec) — the bytes for other days are never opened.
  * This replaces the reference's timestamp-in-filename discipline
  * (clean_data.py:283, helius.py:71) with engine-enforced layout.
  */
object PartitionedLayout {

  /** Write `df` partitioned by the date of `tsCol`. */
  def writeDatePartitioned(df: DataFrame, tsCol: String, path: String): Unit =
    df.withColumn("event_date", to_date(col(tsCol)))
      .write.mode("overwrite")
      .partitionBy("event_date")
      .parquet(path)

  /** Read back; date predicates on `event_date` prune directories. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
