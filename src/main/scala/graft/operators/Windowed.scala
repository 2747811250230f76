package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Window and event-time operators. The reference has no window functions
  * (SURVEY.md §2.9: no event-time windows), but a scale-grade engine needs
  * them: per-key recency ranking replaces the reference's sort-then-head
  * per key, and tumbling event-time aggregation is the batch twin of the
  * Structured Streaming path.
  */
object Windowed {

  // ---- q19: per-key top-N by recency + lag (row_number / lag) ------------
  private def q19(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(s, d)
      .withColumn("rk", row_number().over(w))
      .withColumn("prev_value", lag(col("value"), 1).over(w))
      .filter(col("rk") <= 3)
      .select("user_id", "event_id", "rk", "prev_value")
  }

  private val o19 =
    """SELECT user_id, event_id, rk, prev_value FROM (
      |  SELECT user_id, event_id,
      |         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rk,
      |         lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS prev_value
      |  FROM events)
      |WHERE rk <= 3""".stripMargin

  // ---- q20: tumbling event-time window aggregate (hourly) ----------------
  private def q20(s: SparkSession, d: String): DataFrame = {
    val dec = DecimalType(18, 2)
    // group on the truncated timestamp (8-byte key), render the string
    // only after aggregation — narrower shuffle than a string group key
    Tables.events(s, d)
      .groupBy(date_trunc("hour", col("ts")).as("h"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast(dec)).cast(DoubleType).as("total_value"),
        countDistinct(col("user_id")).as("n_users"))
      .select(date_format(col("h"), "yyyy-MM-dd HH:mm").as("hour"),
        col("n"), col("total_value"), col("n_users"))
  }

  private val o20 =
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS hour,
      |       count(*) AS n,
      |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
      |       count(DISTINCT user_id) AS n_users
      |FROM events GROUP BY 1""".stripMargin

  // ---- q21: sessionization by inactivity gap (30 min) --------------------
  // Classic large-scale pattern: lag → gap flag → cumulative sum as
  // session id. One shuffle on user_id; all window work stays within the
  // partition.
  private def q21(s: SparkSession, d: String): DataFrame = {
    val byTs = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(s, d)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byTs))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > 1800, 1)
          .otherwise(0))
      .withColumn("session_seq", sum(col("new_session")).over(
        byTs.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast(LongType))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_end"))
  }

  private val o21 =
    """WITH g AS (
      |  SELECT user_id, event_id, ts,
      |         lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_ts
      |  FROM events),
      |f AS (
      |  SELECT user_id, event_id, ts,
      |         CASE WHEN prev_ts IS NULL
      |                   OR CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(prev_ts)) AS BIGINT) > 1800
      |              THEN 1 ELSE 0 END AS new_session
      |  FROM g),
      |sess AS (
      |  -- CAST: DuckDB types a window sum of INTEGER as HUGEINT (int128);
      |  -- Spark emits BIGINT. Arrow-normalizing comparators hash these
      |  -- differently, so pin both engines to int64.
      |  SELECT user_id, ts,
      |         CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
      |                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
      |  FROM f)
      |SELECT user_id, session_seq,
      |       count(*) AS n_events,
      |       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
      |       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end
      |FROM sess GROUP BY user_id, session_seq""".stripMargin

  // ---- q35: hierarchical rollup aggregate --------------------------------
  // Not in the reference (no grouping sets anywhere) but table stakes
  // for an analytics engine; Spark plans one Expand + hash aggregate.
  private def q35(s: SparkSession, d: String): DataFrame = {
    val dec = DecimalType(18, 2)
    Tables.lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("l_quantity").cast(dec)).cast(DoubleType).as("sum_qty"))
  }

  private val o35 =
    """SELECT l_returnflag, l_linestatus, count(*) AS n,
      |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin

  // ---- q36: as-of join (windowed sort-merge form) ------------------------
  // For each purchase event: the most recent STRICTLY-earlier event of
  // the same user that is not a purchase. The naive form is a range
  // join (quadratic); the scale-correct Spark form is one shuffle on
  // the key + a sorted window carrying the last non-purchase id
  // forward — linear, and exactly how a sort-merge as-of executes.
  private def q36(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(s, d)
      .withColumn("cand", when(col("event_type") =!= "purchase", col("event_id")))
      .withColumn("asof_event_id", last(col("cand"), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("asof_event_id"))
  }

  private val o36 =
    """SELECT event_id AS purchase_id, user_id, asof_event_id FROM (
      |  SELECT event_id, user_id, event_type,
      |         last_value(CASE WHEN event_type <> 'purchase' THEN event_id END IGNORE NULLS)
      |           OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS asof_event_id
      |  FROM events)
      |WHERE event_type = 'purchase'""".stripMargin

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("q19_window_rank", "row_number/lag per-key recency window", q19, Some(o19)),
    GraftQuery("q20_window_time", "tumbling hourly event-time aggregate", q20, Some(o20)),
    GraftQuery("q21_sessionize", "gap-based sessionization (lag + cumsum)", q21, Some(o21)),
    GraftQuery("q35_rollup", "hierarchical rollup aggregate", q35, Some(o35)),
    GraftQuery("q36_asof_join", "as-of join via sorted per-key window", q36, Some(o36)))
}
