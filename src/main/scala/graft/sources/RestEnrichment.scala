package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Staged external-lookup enrichment (SURVEY.md §2.1 S6/S7, §2.9 ST8).
  *
  * The reference fetches per-key REST data inline (Helius tx history,
  * dexscreener token names) with a 1 req/s sleep. The engine's shape:
  *
  *   1. distinct keys (A6) — the only data that leaves the cluster;
  *   2. `mapPartitions` fetch with a per-partition rate limiter — each
  *      key fetched once, parallelism = partition count, no driver
  *      round-trip;
  *   3. broadcast the (small) result table and left-join it back (J2).
  *
  * The transport is pluggable (`Lookup`); tests inject a stub — this
  * container has no egress, and the lookup function is exactly where a
  * real HTTP client would sit.
  */
object RestEnrichment {

  /** key → looked-up value; None = not found (joins to the fallback). */
  type Lookup = String => Option[String]

  /** Fetch values for the distinct keys of `keys.col(keyCol)`, at most
    * `maxRequestsPerSec` calls/sec per partition (ST8; the reference
    * sleeps 1 s between calls, helius.py:96).
    */
  def stageLookups(df: DataFrame, keyCol: String, lookup: Lookup,
      maxRequestsPerSec: Int, fetchPartitions: Int = 4): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val minIntervalNs = 1000000000L / math.max(1, maxRequestsPerSec)
    df.select(col(keyCol).cast("string")).na.drop().distinct()
      .repartition(fetchPartitions)
      .as[String]
      .mapPartitions { it =>
        var lastCall = 0L
        it.flatMap { key =>
          val elapsed = System.nanoTime() - lastCall
          if (elapsed < minIntervalNs)
            Thread.sleep((minIntervalNs - elapsed) / 1000000L + 1)
          lastCall = System.nanoTime()
          lookup(key).map(v => (key, v))
        }
      }
      .toDF(keyCol, "looked_up")
  }

  /** J2: enrich `df` with staged lookups; unmatched → `fallback`. */
  def enrich(df: DataFrame, keyCol: String, staged: DataFrame,
      outCol: String, fallback: String): DataFrame =
    df.join(broadcast(staged), Seq(keyCol), "left")
      .withColumn(outCol, coalesce(col("looked_up"), lit(fallback)))
      .drop("looked_up")
}
