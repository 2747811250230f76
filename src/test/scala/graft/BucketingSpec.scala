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

  test("persisted band index joins ingest batches with no index-side exchange") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "completely unrelated indexed content about spark plans"),
      (3L, "another indexed document with its own distinct words"))
      .toDF("doc_id", "text")
    graft.operators.Dedup.writeBandIndex(corpus, "band_idx", 4)
    val batch = Seq(
      (9L, "the quick brown fox jumps over the lazy dog tonight"),
      (10L, "fresh never-seen material with zero corpus overlap"))
      .toDF("doc_id", "text")
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val verdicts = graft.operators.Dedup.incrementalAgainstIndex(
        batch, spark.table("band_idx"))
      // the asymmetric plan: the batch side shuffles onto the index's
      // bucketing (exactly one band-key exchange); the index side reads
      // its buckets exchange-free — ingest cost ∝ batch, not corpus
      val plan = verdicts.queryExecution.executedPlan.toString
      val bandExchanges = "hashpartitioning\\(bk".r.findAllIn(plan).size
      assert(bandExchanges == 1,
        s"expected exactly one band-key exchange (batch side only) in:\n$plan")
      val r = verdicts.collect()
        .map(x => x.getAs[Long]("doc_id") -> x.getAs[Long]("dup_of")).toMap
      assert(r.get(9L).contains(1L)) // near-dup of indexed doc 1
      assert(!r.contains(10L))       // novel doc passes
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
  }
}
