package graft

import graft.operators.RiskScoring
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Risk aggregation semantics (streamlit 1.3.txt:83-113,165-167) on
  * hand-computed fixtures, plus score-bound properties.
  */
class RiskScoringSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def eventsDf(rows: Seq[(Long, Long, Long, String, Double)]) =
    rows.toDF("event_id", "tsSec", "user_id", "event_type", "value")
      .select(col("event_id"), timestamp_seconds(col("tsSec")).as("ts"),
        col("user_id"), col("event_type"), col("value"),
        lit("{}").as("props"))

  test("hand-computed risk row") {
    // user 1: 4 events, 2 types, 2 distinct purchases
    val df = eventsDf(Seq(
      (1L, 100L, 1L, "purchase", 10.0),
      (2L, 200L, 1L, "purchase", 20.0),
      (3L, 300L, 1L, "click", 5.0),
      (4L, 400L, 1L, "click", 5.0)))
    val r = RiskScoring.riskTable(df).collect().head
    assert(r.getAs[Long]("n_events") == 4)
    assert(r.getAs[Long]("n_types") == 2)
    assert(r.getAs[Long]("n_purchases") == 2)
    assert(r.getAs[String]("first_type") == "click") // min(), deterministic
    assert(r.getAs[Double]("total_value") == 40.0)
    val ownership = 100.0 * (1.0 / 3)       // 1/(1+2 types)
    val liquidity = 100.0 * (1.0 / 3)       // 1/(1+2 purchases)
    val concentration = 4 / 3.0
    assert(r.getAs[Double]("ownership_risk") == ownership)
    assert(r.getAs[Double]("liquidity_risk") == liquidity)
    assert(r.getAs[Double]("concentration") == concentration)
    val rug = ownership * 0.4 + liquidity * 0.4 + concentration * 0.2
    assert(r.getAs[Double]("rug_risk") == rug)
    assert(r.getAs[Double]("safety_score") == math.max(0.0, 100.0 - rug))
  }

  test("zero-purchase group exercises the 1/(1+0) guard") {
    val df = eventsDf(Seq((1L, 100L, 7L, "view", 1.0)))
    val r = RiskScoring.riskTable(df).collect().head
    assert(r.getAs[Long]("n_purchases") == 0)
    assert(r.getAs[Double]("liquidity_risk") == 100.0) // max risk, no div-by-zero
  }

  test("safety score bounded in [0, 100] for random inputs") {
    // property-style: several seeded random datasets in one Spark job
    val allRows = (1 to 5).flatMap { seed =>
      val rnd = new scala.util.Random(seed)
      (0 until 30).map { i =>
        ((seed * 1000 + i).toLong, 100L + i, (seed * 10 + rnd.nextInt(3)).toLong,
          Seq("purchase", "click", "view")(rnd.nextInt(3)),
          math.abs(rnd.nextInt(10000)) / 100.0)
      }
    }
    val scores = RiskScoring.riskTable(eventsDf(allRows))
      .select("safety_score").collect().map(_.getDouble(0))
    assert(scores.nonEmpty)
    assert(scores.forall(sc => sc >= 0.0 && sc <= 100.0))
  }

  test("topK is deterministic under ties (user_id tiebreak)") {
    // two users with identical event profiles → identical scores
    val df = eventsDf(Seq(
      (1L, 100L, 2L, "click", 1.0), (2L, 200L, 2L, "purchase", 2.0),
      (3L, 100L, 1L, "click", 1.0), (4L, 200L, 1L, "purchase", 2.0),
      (5L, 100L, 3L, "view", 9.0)))
    val top = RiskScoring.topK(RiskScoring.riskTable(df), 2)
      .select("user_id").collect().map(_.getLong(0)).toSeq
    assert(top == Seq(1L, 2L))
  }
}
