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

  test("full-sketch verify separates borderline collisions from true near-dups") {
    import spark.implicits._
    // the index rows persist each doc's whole 8-slice sketch, so ingest
    // can rank collisions by slice agreement without re-reading text:
    // doc 9 is doc 1 with one word changed (most slices agree), doc 10
    // shares only a prefix with doc 1 (a band can collide — 2 matching
    // consecutive slices — while most slices differ)
    val base = "the quick brown fox jumps over the lazy dog today and " +
      "every day it runs through the quiet field near the old mill"
    val corpus = Seq(
      (1L, base),
      (2L, "completely unrelated indexed content about spark plans"))
      .toDF("doc_id", "text")
    graft.operators.Dedup.writeBandIndex(corpus, "band_idx_sig", 4)
    val batch = Seq(
      (9L, base.replace("old mill", "old barn")),
      (10L, "the quick brown fox jumps over the lazy dog cranes behind " +
        "and while rusted harbor gulls turbines docks rattle dusk beside " +
        "skies wheel"))
      .toDF("doc_id", "text")
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val verdicts = graft.operators.Dedup.incrementalVerifiedAgainstIndex(
        batch, spark.table("band_idx_sig"))
      // same asymmetric shape as the unverified join: exactly one
      // band-key exchange (batch side), index buckets exchange-free
      val plan = verdicts.queryExecution.executedPlan.toString
      val bandExchanges = "hashpartitioning\\(bk".r.findAllIn(plan).size
      assert(bandExchanges == 1,
        s"expected exactly one band-key exchange (batch side only) in:\n$plan")
      val r = verdicts.collect().map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("dup_of"), x.getAs[Double]("sig_agree"))).toMap
      r.get(9L).foreach { case (dupOf, agree) =>
        assert(dupOf == 1L && agree >= 0.75,
          s"near-identical pair must agree on most slices, got $agree")
      }
      assert(r.contains(9L), "one-word edit must still collide")
      // the borderline doc COLLIDES (shares a band with doc 1 — the
      // texts were chosen so one band's slice minima all come from the
      // shared prefix) yet agrees on only 2 of 8 slices: exactly the
      // false-positive shape a sig_agree threshold filters and the
      // band count alone cannot
      val (bDup, bAgree) = r(10L)
      assert(bDup == 1L && bAgree <= 0.25,
        s"prefix-only overlap must not look near-identical, got $bAgree")
      assert(r(9L)._2 > bAgree)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
  }
}
