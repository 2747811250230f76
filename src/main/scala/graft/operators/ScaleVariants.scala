package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-path variants of exact operators (SURVEY.md §4 stretch, §7.7).
  *
  * q32 is the HLL++ form of the risk distincts (A3/A4): at 100 TB an
  * exact countDistinct forces a per-(key, value) shuffle before the
  * final aggregate, while approx_count_distinct keeps a constant-size
  * sketch per key and combines map-side — one shuffle of sketches, no
  * value explosion, bounded memory regardless of cardinality.
  *
  * No DuckDB oracle: HLL sketch implementations differ between engines,
  * so the driver records the weaker rows-only check. Accuracy against
  * the exact aggregate is asserted in ExtensionsSpec instead (rsd
  * 0.05 ⇒ well under 5% typical error at these cardinalities).
  */
object ScaleVariants {

  def approxRisk(events: DataFrame, rsd: Double = 0.05): DataFrame =
    events.groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        approx_count_distinct(col("event_type"), rsd).as("n_types_approx"),
        approx_count_distinct(
          when(col("event_type") === "purchase", col("event_id")), rsd)
          .as("n_purchases_approx"))

  private def q32(s: SparkSession, d: String): DataFrame =
    approxRisk(Tables.events(s, d))

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("q32_approx_distinct", "HLL approx-distinct risk variant (rows-only check)",
      q32, None))
}
