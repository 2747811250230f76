package graft

import graft.operators.Bucketing
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed tables must join with no shuffle exchange. */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("same-bucketed join plans without ShuffleExchange") {
    val events = Tables.events(spark, TestSpark.sf0001)
    Bucketing.writeBucketed(
      events.select("event_id", "user_id", "event_type"), "ev_a", "user_id", 4)
    Bucketing.writeBucketed(
      events.select("event_id", "user_id", "value").withColumnRenamed("event_id", "eid2"),
      "ev_b", "user_id", 4)
    // force the sort-merge path (tiny fixtures would broadcast, which
    // bypasses bucketing entirely); buckets must then join shuffle-free
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.bucketedJoin(spark, "ev_a", "ev_b", "user_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        s"unexpected shuffle in:\n$plan")
      assert(plan.contains("SortMergeJoin"), s"expected SMJ over buckets in:\n$plan")
      // correctness: row count equals the shuffled join's
      val expected = events.select("event_id", "user_id").as("a")
        .join(events.select(col("event_id").as("e2"), col("user_id")), "user_id").count()
      assert(joined.count() == expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
  }
}
