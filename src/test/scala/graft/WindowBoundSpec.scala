package graft

import org.apache.spark.sql.execution.TakeOrderedAndProjectExec
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.window.WindowExec
import org.scalatest.funsuite.AnyFunSuite

/** CI bound for the engine's single-partition windows.
  *
  * A `Window.orderBy` with no partition key plans as a ONE-task window
  * — a deliberate, benign shape when (and only when) the frame feeding
  * it is tiny by construction (a capped-key aggregate, a top-k take).
  * The engine uses exactly that pattern in a handful of places, and
  * each run logs a `WindowExec: No Partition Defined` warning for it;
  * the risk the r10 review flagged is that the warning VOLUME masks a
  * future regression where some refactor slips a corpus-sized frame
  * into a global window. This spec turns the prose bounds into CI:
  *
  *   1. the registry-wide set of queries with single-partition windows
  *      is pinned to an exact allow-list — a NEW unpartitioned window
  *      anywhere in the full registry fails with attribution;
  *   2. every allow-listed window's input subtree must contain its
  *      documented bounding operator — the capped-cardinality
  *      aggregate key or the top-k take, checked structurally in the
  *      physical plan (pre-AQE), not by log inspection;
  *   3. where the window's frame is 1:1 with the query result, the
  *      actual row count is asserted against the documented cap.
  */
class WindowBoundSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def run(name: String) = Registry.byName(name).run(spark, TestSpark.sf0001)

  private def unpartitioned(name: String): Seq[WindowExec] =
    run(name).queryExecution.sparkPlan.collect {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }

  // query -> number of single-partition WindowExec nodes in its plan.
  // q78's ≤100k bucket frame plans once per union branch, hence 2; q87
  // has the ≤k lexical rank window plus the ≤2k fusion rank window.
  private val AllowList = Map(
    "q48_source_mixture" -> 1,      // per-source aggregate: ≤ |sources| rows
    "q64_dsir_weights" -> 1,        // md5-byte bucket aggregate: ≤ 256 rows
    "q70_temperature_mixture" -> 1, // per-source aggregate: ≤ |sources| rows
    "q73_cell_balance" -> 1,        // per-cell aggregate: ≤ NumCells = 16 rows
    "q78_token_budget" -> 2,        // quality-bucket aggregate: ≤ 100k rows
    "q87_hybrid_rrf" -> 2,          // top-k ranker outputs: ≤ k and ≤ 2k rows
    "q90_vocab_coverage" -> 1,      // TakeOrdered(VocabCap): ≤ 100k rows
    "q99_bpe_apply" -> 1,           // TakeOrdered(BpeMerges): ≤ 16 rows
    "q102_pack_bpe" -> 1,           // the q99 merge-rank window: ≤ 16 rows
    "q103_budget_bpe" -> 2,         // q78's quality-bucket aggregate: ≤ 100k rows
    "q108_cell_drift" -> 1,         // joined per-cell frame: ≤ NumCells = 16 rows (both totals in one node)
    "q110_bpe_fertility" -> 1,      // the q99 merge-rank window: ≤ 16 rows
    "q113_shard_manifest" -> 1,     // per-shard offset aggregate: ≤ 256 rows
    "q118_epoch_mix" -> 1,          // per-source aggregate: ≤ |sources| rows
    "q118b_epoch_mix_bpe" -> 2)     // q99 merge-rank (≤16) + per-source aggregate
  // q112_lang_budget is absent by construction: its q99 merge window
  // sits BEHIND the kernel's localCheckpoint (never in the final plan)
  // and both bucket windows are partitioned by language.

  test("registry-wide: single-partition windows are exactly the documented allow-list") {
    val found = Registry.all.map(q => q.name -> unpartitioned(q.name).size)
      .filter(_._2 != 0).toMap
    val extra = found.keySet -- AllowList.keySet
    val gone = AllowList.keySet -- found.keySet
    assert(found == AllowList,
      s"single-partition window set drifted — new unbounded global window? " +
        s"unexpected: ${extra.map(n => s"$n=${found(n)}").mkString(",")}; " +
        s"vanished: ${gone.mkString(",")}; " +
        s"count-changed: ${found.filter { case (k, v) => AllowList.get(k).exists(_ != v) }}")
  }

  /** Topmost bounding node in pre-order under the window: either a
    * capped-key aggregate (its grouping-key names) or a top-k take
    * (its limit). The topmost one is what the window directly consumes
    * (through sort/exchange/project), so a corpus-sized frame slipping
    * in between fails this even if a capped aggregate survives deeper
    * in the tree.
    */
  private def boundOf(w: WindowExec): String =
    w.child.collectFirst {
      case a: BaseAggregateExec =>
        s"agg(${a.groupingExpressions.map(_.name).sorted.mkString(",")})"
      case t: TakeOrderedAndProjectExec => s"take(${t.limit})"
    }.getOrElse("UNBOUNDED")

  test("each allow-listed window sits directly over its documented capped frame") {
    val expected = Map(
      "q48_source_mixture" -> Seq("agg(source)"),
      "q64_dsir_weights" -> Seq("agg(b)"),
      "q70_temperature_mixture" -> Seq("agg(source)"),
      "q73_cell_balance" -> Seq("agg(cid)"),
      "q78_token_budget" -> Seq("agg(bkt)", "agg(bkt)"),
      "q90_vocab_coverage" -> Seq("take(100000)"),
      "q99_bpe_apply" -> Seq("take(16)"),
      "q102_pack_bpe" -> Seq("take(16)"),
      "q103_budget_bpe" -> Seq("agg(bkt)", "agg(bkt)"),
      "q113_shard_manifest" -> Seq("agg(shard)"),
      "q118_epoch_mix" -> Seq("agg(source)"),
      "q118b_epoch_mix_bpe" -> Seq("agg(source)", "take(16)"))
    expected.foreach { case (name, want) =>
      val got = unpartitioned(name).map(boundOf).sorted
      assert(got == want.sorted, s"$name window bound drifted: $got != $want")
    }
    // q87's two windows both descend from ≤k-row ranker takes: every
    // window subtree must contain a take(k) with the HybridK limit
    unpartitioned("q87_hybrid_rrf").foreach { w =>
      val takes = w.child.collect { case t: TakeOrderedAndProjectExec => t.limit }
      assert(takes.nonEmpty && takes.forall(_ == 10),
        s"q87 window not bounded by the top-k ranker take: limits=$takes")
    }
  }

  test("shardManifest's cardinality guard fires on a high-cardinality shard alphabet") {
    import spark.implicits._
    // 5000 distinct shards > MaxManifestShards: the offset window must
    // raise_error instead of silently single-partitioning the frame
    val packs = (0 until 5000)
      .map(i => (i.toLong, f"s$i%04d", 0L, 10L))
      .toDF("doc_id", "shard", "pack_id", "n_tokens")
    val e = intercept[Exception] {
      graft.operators.TrainingData.shardManifest(packs, 512L).count()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("distinct shards exceed")),
      s"expected the shard-cardinality guard, got: $e")
    // and a bounded alphabet still works (the q113 shape)
    val ok = (0 until 50).map(i => (i.toLong, f"s${i % 8}", i.toLong / 4, 10L))
      .toDF("doc_id", "shard", "pack_id", "n_tokens")
    assert(graft.operators.TrainingData.shardManifest(ok, 60L).count() > 0)
  }

  test("1:1 frames: actual rows through the window respect the documented cap") {
    // q73 emits one row per IVF cell — the window frame IS the result
    assert(run("q73_cell_balance").count() <= 16L, "cell-balance frame exceeded NumCells")
    // q48/q70 emit one row per source — the per-source aggregate frame
    val nSources = Tables.documents(spark, TestSpark.sf0001)
      .select("source").distinct().count()
    assert(run("q48_source_mixture").count() == nSources)
    assert(run("q70_temperature_mixture").count() == nSources)
    // q87's fusion frame is ≤ 2k rows by construction (full-outer of
    // two top-k rankers), and the result is the fused frame itself
    assert(run("q87_hybrid_rrf").count() <= 20L, "RRF fusion frame exceeded 2k")
  }
}
