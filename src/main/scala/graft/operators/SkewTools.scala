package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot group keys: two-phase salted aggregation.
  *
  * A plain `groupBy(key)` sends every row of a hot key to one reducer;
  * at 100 TB one viral key serializes an executor. Salting splits each
  * key into `saltBuckets` sub-groups aggregated in parallel, then
  * combines the partials in a second (tiny) aggregate keyed by the
  * original key. Decomposable aggregates only (count/sum/min/max —
  * exact distincts don't decompose; use HLL sketches there, see
  * ScaleVariants).
  *
  * AQE's skew-join handling covers joins; this covers aggregation skew,
  * which AQE does not rebalance.
  */
object SkewTools {

  /** count + sum(sumCol) per key, salted into `saltBuckets` sub-groups.
    * Equivalent to `df.groupBy(key).agg(count(*), sum(sumCol))`.
    */
  def saltedCountSum(df: DataFrame, key: Column, sumCol: Column,
      saltBuckets: Int): DataFrame = {
    require(saltBuckets > 0)
    df.select(key.as("k"), sumCol.as("v"))
      .withColumn("salt", (rand(seed = 42) * saltBuckets).cast("int"))
      .groupBy(col("k"), col("salt"))
      .agg(count(lit(1)).as("pn"), sum(col("v")).as("pv"))
      .groupBy(col("k"))
      .agg(sum(col("pn")).as("n"), sum(col("pv")).as("total"))
  }
}
