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
  * Why q32 itself can never be hash-checked against DuckDB (the
  * documented impossibility): an HLL estimate is a function of the
  * sketch, and the sketch is a function of the engine's choices — hash
  * function (Spark uses xxHash64 of the Catalyst binary encoding;
  * DuckDB hashes its own value representation), register count layout
  * for a given rsd, sparse/dense promotion thresholds, and the bias-
  * correction table HLL++ interpolates from. Two correct
  * implementations therefore return DIFFERENT integers for the same
  * input by design; equality only re-emerges in regimes where both
  * engines special-case to exact counting, and pinning the fixture to
  * that regime would test nothing. So the estimate column is
  * structurally uncheckable by value comparison against any other
  * engine — not a weak test, a category error.
  *
  * q32b is the strongest driver-checkable companion instead (the
  * q60b staged-companion discipline): the exact distincts under the
  * SAME grouping and purchase filter hash-match DuckDB (verifying
  * every q32 semantic except the sketch arithmetic), and the sketch
  * arithmetic is verified as a PROPERTY the driver can hash: Spark
  * compares its own estimate to its own exact count per user and
  * emits a within-bound verdict (1/0) at 3·rsd (or ±1 at tiny
  * cardinalities, where integer rounding dominates); the oracle emits
  * the constant 1 the bound guarantees. Any per-user estimate drifting
  * outside the CI flips that row's verdict and the driver reports a
  * hash mismatch — the ExtensionsSpec 5% assertion, promoted from CI
  * to the driver gate, row by row.
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

  /** Exact twins of q32's distincts plus AGGREGATE within-CI verdicts
    * for the HLL estimates: `types_ci_ok`/`purchases_ci_ok` are 1 when
    * ≥ 99 % of users have |approx − exact| ≤ max(1, 4·rsd·exact).
    *
    * Why the gate is an aggregate at 4·rsd, not the earlier per-user
    * 1/0 column at 3·rsd (round-12 ADVICE): HLL++ error is ~Gaussian
    * with sd ≈ rsd, so a per-user verdict at 3·rsd flips at rate
    * ~0.3 % per user BY DESIGN once cardinalities leave the
    * sparse/exact regime — with many users the driver hash gate would
    * be flaky by construction. At 4·rsd the per-user excursion rate is
    * ~2Φ(−4) ≈ 6e-5, and the emitted verdict needs MORE THAN 1 % of
    * users outside to flip: P(fail) ≈ 6e-5 at n = 1 (one user must
    * miss), ~5e-5 at n = 150 (two must), and collapses exponentially
    * for large n (expected outside-fraction 6e-5 vs the 1 % budget) —
    * a statistically expected single-row excursion can no longer fail
    * the gate at any scale. The per-user EXACT distincts still
    * hash-check row by row; only the sketch-vs-exact comparison is
    * aggregated.
    *
    * The per-user frame is localCheckpoint'ed (user-volume — one row
    * per user) so the verdict aggregate and the emitted rows read one
    * evaluation of the events scan, then the 1-row verdict broadcasts
    * back onto every row (the bounded-crossJoin pattern).
    */
  def approxVsExact(events: DataFrame, rsd: Double = 0.05): DataFrame = {
    def bound(approx: org.apache.spark.sql.Column,
        exact: org.apache.spark.sql.Column) =
      (abs(approx.cast("double") - exact.cast("double")) <=
        greatest(lit(1.0), lit(4 * rsd) * exact.cast("double"))).cast("long")
    // Dedup-first, not multi-countDistinct: two DISTINCT aggregates in
    // one groupBy plan as an Expand that triples every event row before
    // the shuffle (measured 2.2 s at sf1 once the checkpoint stopped
    // count()-pruning the sketches — the lazy form's 0.17 s bench
    // reading had never computed them). Each distinct column instead
    // collapses to its own pre-deduplicated frame first (map-side
    // combine on tiny rows), and BOTH the exact count and the HLL
    // sketch ride the dedup'd rows — HLL is duplicate-insensitive
    // (re-aggregating an already-seen value re-sets the same register),
    // so the estimates are bit-identical to the raw-stream sketches.
    // Users with no purchases re-enter via the left join with (0, 0),
    // exactly the all-null countDistinct/empty-sketch values the fused
    // aggregate produced.
    // count(col), not count(*): the distinct frame keeps a (user, NULL)
    // row when a user has null-valued events, and COUNT DISTINCT
    // semantics (both engines) exclude NULLs — count over the value
    // column skips exactly those rows (the HLL sketch already does).
    val perTypes = events.select(col("user_id"), col("event_type")).distinct()
      .groupBy(col("user_id"))
      .agg(count(col("event_type")).as("n_types"),
        approx_count_distinct(col("event_type"), rsd).as("ta"))
    val perPurch = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id")).distinct()
      .groupBy(col("user_id"))
      .agg(count(col("event_id")).as("np"),
        approx_count_distinct(col("event_id"), rsd).as("pa"))
    val per = perTypes.join(perPurch, Seq("user_id"), "left")
      .select(col("user_id"), col("n_types"),
        coalesce(col("np"), lit(0L)).as("n_purchases"),
        bound(col("ta"), col("n_types")).as("tok"),
        bound(coalesce(col("pa"), lit(0L)),
          coalesce(col("np"), lit(0L))).as("pok"))
      .localCheckpoint()
    val verdict = per.agg(
      (sum(col("tok")).cast("double") >= lit(0.99) * count(lit(1)))
        .cast("long").as("types_ci_ok"),
      (sum(col("pok")).cast("double") >= lit(0.99) * count(lit(1)))
        .cast("long").as("purchases_ci_ok"))
    per.select(col("user_id"), col("n_types"), col("n_purchases"))
      .crossJoin(broadcast(verdict))
  }

  private def q32b(s: SparkSession, d: String): DataFrame =
    approxVsExact(Tables.events(s, d))

  private val o32b =
    """SELECT user_id,
      |       CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
      |       CAST(count(DISTINCT CASE WHEN event_type = 'purchase'
      |                                THEN event_id END) AS BIGINT) AS n_purchases,
      |       CAST(1 AS BIGINT) AS types_ci_ok,
      |       CAST(1 AS BIGINT) AS purchases_ci_ok
      |FROM events GROUP BY user_id""".stripMargin

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("q32_approx_distinct", "HLL approx-distinct risk variant (rows-only check)",
      q32, None),
    GraftQuery("q32b_approx_vs_exact",
      "exact distinct twins + aggregate HLL within-CI verdict (driver-hashed companion)",
      q32b, Some(o32b)))
}
