package graft

import org.apache.spark.sql.execution.FormattedMode
import org.scalatest.funsuite.AnyFunSuite

/** Pins the physical-plan properties SCALE.md claims, so a regression
  * in plan shape (a lost broadcast, a full sort where a top-k heap
  * belongs, a filter that stops pushing into the scan) fails CI instead
  * of silently costing a shuffle at scale. Dedup/similarity scan-count
  * guards live in DedupSimilaritySpec.
  */
class PlanShapeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def planOf(name: String): String =
    Registry.byName(name).run(spark, TestSpark.sf0001)
      .queryExecution.explainString(FormattedMode)

  test("q01 projection is scan-shaped: zero exchanges, inside codegen") {
    val p = planOf("q01_project")
    assert(!p.contains("Exchange"), "pure projection must not shuffle")
    assert(p.contains("[codegen id :"), "plan fell out of whole-stage codegen")
  }

  test("q04 pushes its equality filter into the parquet scan") {
    val p = planOf("q04_filter_eq")
    assert(p.contains("PushedFilters: [") && p.contains("EqualTo"),
      s"expected an EqualTo pushed filter in:\n${p.take(2000)}")
  }

  test("q09 dim enrichment broadcasts; the fact side never shuffles") {
    val p = planOf("q09_broadcast_enrich")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      "dim join must not shuffle the fact side")
  }

  test("q12 global top-k plans as TakeOrderedAndProject, not a full sort") {
    assert(planOf("q12_sort_limit").contains("TakeOrderedAndProject"))
  }

  test("q11 risk top-k avoids a global sort of the aggregate") {
    val p = planOf("q11_topk_risk")
    assert(p.contains("TakeOrderedAndProject") || p.contains("WindowGroupLimit"),
      s"expected a bounded top-k operator in:\n${p.take(2000)}")
  }

  test("q37 ranking windows use WindowGroupLimit pushdown") {
    assert(planOf("q37_term_salience").contains("WindowGroupLimit"))
  }

  test("q26 broadcasts the query side; the corpus streams unshuffled") {
    val p = planOf("q26_cosine_topk")
    assert(p.contains("BroadcastNestedLoopJoin"),
      "the qid =!= nid join must stay a broadcast nested loop")
    // queries are the join's right side: BuildRight == queries broadcast;
    // a BuildLeft anywhere means the corpus became the build side — a
    // scale-killer inversion (the corpus does not fit in a broadcast)
    assert(p.contains("BuildRight") && !p.contains("BuildLeft"),
      s"corpus side must never be the broadcast build side:\n${p.take(2000)}")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"))
  }

  test("q56 aggregates the token stream once and reuses the exchange") {
    val p = planOf("q56_unigram_lm")
    // every branch (freq, total, per-doc score) derives from the
    // (doc_id, w, cnt) pre-aggregate: exactly one token-level exchange
    // materializes and the others read it back — raw token occurrences
    // never feed the freq join, so the above-broadcast-ceiling fallback
    // shuffles the aggregate, not the Zipf-skewed occurrence stream.
    // AQE materializes the reuse at runtime, so execute, then pin.
    val df = Registry.byName("q56_unigram_lm").run(spark, TestSpark.sf0001)
    df.collect()
    val fin = df.queryExecution.explainString(FormattedMode)
    assert(fin.contains("ReusedExchange"),
      s"expected the (doc_id, w) pre-aggregate exchange to be reused:\n${fin.take(2000)}")
  }

  test("q63 reuses the (doc_id, span) pre-aggregate exchange; no doc-set collection") {
    // both join inputs (per-doc distinct spans, per-span doc frequency)
    // derive from the same pre-aggregate: one span-level exchange
    // materializes and the df branch reads it back. No collect_set of
    // doc ids may appear — a corpus-hot span must cost join rows
    // (linear), never one aggregation-state list on a single key.
    val df = Registry.byName("q63_dup_span_frac").run(spark, TestSpark.sf0001)
    df.collect()
    val fin = df.queryExecution.explainString(FormattedMode)
    assert(fin.contains("ReusedExchange"),
      s"expected the (doc_id, sh) pre-aggregate exchange to be reused:\n${fin.take(2000)}")
    assert(!fin.contains("collect_set"), "span df must come from a join, not a doc-id set")
  }

  test("q66 is one scan and no join: df is a window over the pre-aggregate") {
    // one scan, one Generate (the posexplode off the scan), zero joins:
    // doc frequency is a count window over gh on the (doc_id, gh)
    // pre-aggregate, and coverage is the per-doc interval-union fold —
    // the 8× position explode, its (doc_id, pos) dedup shuffle, and
    // the second documents scan must not reappear
    val p = planOf("q66_dup_token_coverage")
    val scans = p.linesIterator.count(_.matches("""^\(\d+\) Scan parquet\s*$"""))
    assert(scans == 1, s"expected one documents scan, got $scans")
    val gens = p.linesIterator.count(_.matches("""^\(\d+\) Generate\s*$"""))
    assert(gens == 1, s"expected only the posexplode Generate, got $gens")
    assert(!p.contains("Join"), "df must come from the gh window, not a join")
  }

  test("q64 broadcasts the 256-row weight table and reuses the feature exchange") {
    val df = Registry.byName("q64_dsir_weights").run(spark, TestSpark.sf0001)
    df.collect()
    val fin = df.queryExecution.explainString(FormattedMode)
    assert(fin.contains("BroadcastHashJoin"),
      "structurally-bounded bucket weights must broadcast")
    assert(!fin.contains("SortMergeJoin") && !fin.contains("ShuffledHashJoin"),
      "the feature stream must never shuffle for the weight join")
    assert(fin.contains("ReusedExchange"),
      s"expected the (doc_id, lang, b) pre-aggregate exchange to be reused:\n${fin.take(2000)}")
  }

  test("q67 never join-shuffles the train gram stream: bloom prune + broadcast confirm") {
    val p = planOf("q67_bloom_decontam")
    // the train side's grams are pruned row-locally by the broadcast
    // Bloom and confirmed by a broadcast join — the only exchanges in
    // the plan belong to the (small) benchmark-gram distinct and the
    // post-confirm count-distinct aggregate
    assert(p.contains("BroadcastHashJoin"),
      "the exact confirm against benchmark grams must broadcast")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      "the train gram stream must never be exchanged for a join")
  }

  test("q39 broadcasts centroids and probes; corpus rows never join-shuffle") {
    val p = planOf("q39_ivf_ann")
    // centroid/probe frames are always the right side of their joins;
    // only aggregate exchanges may shuffle corpus rows, never a join
    assert(p.contains("BuildRight") && !p.contains("BuildLeft"),
      s"small sides (centroids/probes) must stay the build side:\n${p.take(2000)}")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      "centroid/probe joins must broadcast, not shuffle the corpus")
  }

  test("q92's pair join keeps a user-pinned repartition (AQE-coalesce-exempt)") {
    // The within-cell self-join's output is quadratically larger than
    // its input, so its parallelism must come from an EXPLICIT
    // repartition, never from byte-based AQE sizing — AQE once
    // coalesced the 12 MB join input to one partition and ran the
    // whole 25M-pair volume single-threaded (SCALE.md round 12). The
    // executed plan must carry a REPARTITION_BY_NUM shuffle (the
    // user-specified, coalesce-exempt origin) feeding the join.
    val df = Registry.byName("q92_label_noise").run(spark, TestSpark.sf0001)
    df.collect()
    val origins = graft.tools.ScanAudit
      .deepNodes(df.queryExecution.executedPlan)
      .collect { case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
        e.shuffleOrigin.toString }
    assert(origins.contains("REPARTITION_BY_NUM"),
      s"q92 lost its pinned pair-join repartition; shuffle origins: $origins")
  }
}
