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

  // ---- registry-wide pair-join partition pinning (round 13) -------------
  // The q92 AQE-collapse lesson promoted to a full-registry sweep (the
  // ScanBudgetSpec discipline applied to partitioning): wherever a
  // join/explode's OUTPUT is far larger than its byte-tiny input —
  // banded LSH pair explodes, within-bucket/cell self-joins, the
  // verify-side joins that fan small pair rows into heavy per-pair
  // compute — AQE's byte heuristics can legally coalesce the feeding
  // exchange to one partition and serialize the quadratic work
  // (measured: q92 ran its 25M-pair volume single-threaded, 15.4 s at
  // sf1, SCALE.md round 12). Every such site must take its parallelism
  // from a USER repartition (REPARTITION_BY_NUM — the coalesce-exempt
  // origin). This map classifies EVERY registry query; pinned entries
  // must show the origin in their AQE-final plan, and the completeness
  // test forces each new query to declare itself, so a new pair kernel
  // that forgets the pin fails here with attribution.
  //
  // "none" entries either have no pair-producing join in their FINAL
  // plan, or their expansion is structurally safe: q26/q39/q84
  // expand through BROADCAST joins (no shuffle to coalesce —
  // parallelism is the probe side's scan/checkpoint partitioning);
  // q93/q94 stopped expanding at all in round 14 — they score the
  // session-staged retrieval logs (k·|queries|-row frames);
  // q44's pinned repartitions live in its checkpointed iteration jobs
  // (its own convergence/parallelism specs pin them) so its final plan
  // shows none; q42/q43/q67 fan through broadcast-pruned gram joins
  // whose output is match-bounded, not quadratic. The verify-side
  // joins (q25/q65/q74/q88) are classified "none" from a MEASURED
  // round-13 negative (SCALE.md): their pair frame streams off its
  // parquet scan into broadcast probes with zero pair-side exchanges
  // (scan partitioning is not AQE-coalescible), pinning added two real
  // shuffles (q88 1.2→3.6 s at sf1), and the collapse cannot arise
  // structurally — output rows ≈ input pair rows, and heavy member
  // arrays force the SMJ regime where AQE sizes from those same bytes.
  private val Pinned = "pinned"
  private val NoPairJoin = "none"
  private val PairJoin: Map[String, String] = Map(
    "q01_project" -> NoPairJoin, "q02_defaults" -> NoPairJoin,
    "q03_anti_filter" -> NoPairJoin, "q04_filter_eq" -> NoPairJoin,
    "q05_explode_outer" -> NoPairJoin, "q06_array_head" -> NoPairJoin,
    "q07_union_by_name" -> NoPairJoin, "q08_left_anti" -> NoPairJoin,
    "q09_broadcast_enrich" -> NoPairJoin, "q10_risk_agg" -> NoPairJoin,
    "q11_topk_risk" -> NoPairJoin, "q12_sort_limit" -> NoPairJoin,
    "q13_distinct" -> NoPairJoin, "q14_group_agg" -> NoPairJoin,
    "q15_tz_format" -> NoPairJoin, "q16_json_extract" -> NoPairJoin,
    "q17_string_ops" -> NoPairJoin, "q18_try_cast" -> NoPairJoin,
    "q19_window_rank" -> NoPairJoin, "q20_window_time" -> NoPairJoin,
    "q21_sessionize" -> NoPairJoin, "q22_dedup_exact" -> NoPairJoin,
    "q23_minhash_lsh" -> Pinned, // candidatePairs band explode
    "q24_simhash" -> NoPairJoin,
    "q25_jaccard_pairs" -> NoPairJoin, // measured negative: broadcast-probe pipeline
    "q26_cosine_topk" -> NoPairJoin, // broadcast NL expansion, no shuffle
    "q27_langid" -> NoPairJoin, "q28_quality" -> NoPairJoin,
    "q29_token_count" -> NoPairJoin, "q30_fingerprint" -> NoPairJoin,
    "q31_risk_explain" -> NoPairJoin, "q32_approx_distinct" -> NoPairJoin,
    "q32b_approx_vs_exact" -> NoPairJoin, "q33_media_meta" -> NoPairJoin,
    "q34_ann_lsh" -> Pinned, // within-bucket self-join
    "q35_rollup" -> NoPairJoin, "q36_asof_join" -> NoPairJoin,
    "q37_term_salience" -> NoPairJoin, "q38_bigram_stats" -> NoPairJoin,
    "q39_ivf_ann" -> NoPairJoin, // broadcast probes
    "q40_train_split" -> NoPairJoin, "q41_repetition" -> NoPairJoin,
    "q42_contamination" -> NoPairJoin, "q43_decontaminate" -> NoPairJoin,
    "q44_dup_clusters" -> NoPairJoin, // pins live in the iteration jobs
    "q45_quality_filter" -> NoPairJoin, "q46_pack_sequences" -> NoPairJoin,
    "q47_stratified_sample" -> NoPairJoin, "q48_source_mixture" -> NoPairJoin,
    "q49_simhash_pairs" -> Pinned, // bandedHammingPairs
    "q50_boilerplate" -> NoPairJoin, "q51_chunk" -> NoPairJoin,
    "q52_pii_redact" -> NoPairJoin, "q53_canonical_docs" -> NoPairJoin,
    "q54_oov_rate" -> NoPairJoin,
    "q55_semantic_dedup" -> Pinned, // cellPairSimsOf
    "q56_unigram_lm" -> NoPairJoin,
    "q57_incremental_dedup" -> Pinned, // batch×index band join
    "q58_lexical_topk" -> NoPairJoin,
    "q59_verified_ingest" -> Pinned, // batch×index band join
    "q60_image_near_dups" -> Pinned, "q60b_image_pairs_sql" -> Pinned,
    "q61_quality_ensemble" -> NoPairJoin,
    "q62_semantic_decontam" -> Pinned, // test×train cell join
    "q63_dup_span_frac" -> NoPairJoin, "q64_dsir_weights" -> NoPairJoin,
    "q65_containment_pairs" -> NoPairJoin, // measured negative: broadcast-probe pipeline
    "q66_dup_token_coverage" -> NoPairJoin, "q67_bloom_decontam" -> NoPairJoin,
    "q68_length_quantiles" -> NoPairJoin, "q69_fixed_sample" -> NoPairJoin,
    "q70_temperature_mixture" -> NoPairJoin, "q71_bigram_lm" -> NoPairJoin,
    "q72_dup_profile" -> NoPairJoin, "q73_cell_balance" -> NoPairJoin,
    "q74_lsh_quality" -> NoPairJoin, // measured negative: broadcast-probe pipeline
    "q75_intra_dedup" -> NoPairJoin,
    "q76_semantic_curve" -> Pinned, // cellPairSimsOf
    "q77_pack_efficiency" -> NoPairJoin, "q78_token_budget" -> NoPairJoin,
    "q79_gopher_rules" -> NoPairJoin,
    "q80_audio_near_dups" -> Pinned, "q80b_audio_pairs_sql" -> Pinned,
    "q81_normalize_text" -> NoPairJoin, "q82_c4_line_filter" -> NoPairJoin,
    "q83_bpe_pairs" -> NoPairJoin,
    "q84_pq_adc_topk" -> NoPairJoin, // broadcast LUT crossJoin
    "q85_pq_distortion" -> NoPairJoin, "q86_lm_buckets" -> NoPairJoin,
    "q87_hybrid_rrf" -> NoPairJoin,
    "q88_dup_spans" -> NoPairJoin, // measured negative: broadcast-probe pipeline
    "q89_integrity_audit" -> NoPairJoin, "q90_vocab_coverage" -> NoPairJoin,
    "q91_snapshot_diff" -> NoPairJoin,
    "q92_label_noise" -> Pinned, // within-cell kNN self-join
    "q93_ann_recall" -> NoPairJoin, "q94_pq_recall" -> NoPairJoin,
    "q95_hash_embed" -> NoPairJoin, "q96_idf_hash_embed" -> NoPairJoin,
    "q97_vocab_growth" -> NoPairJoin,
    "q98_video_near_dups" -> Pinned, "q98b_video_pairs_sql" -> Pinned,
    "q99_bpe_apply" -> NoPairJoin,
    "q100_domain_profile" -> NoPairJoin,
    "q101_cluster_split" -> NoPairJoin, // broadcast/equi cluster-map join, row-bounded
    "q102_pack_bpe" -> NoPairJoin, // vocab joins, match-bounded
    "q103_budget_bpe" -> NoPairJoin, // doc-level equi-join + broadcast buckets
    "q104_span_excision" -> NoPairJoin, // broadcast gram prune, match-bounded fan
    "q105_dist_drift" -> NoPairJoin, // vocab-keyed full-outer join, one row per word
    "q106_line_excision" -> NoPairJoin, // broadcast hot-line equi-join, row-bounded
    "q107_shuffled_pack" -> NoPairJoin, // no join at all: repartition + partition-local fold
    "q108_cell_drift" -> NoPairJoin, // full-outer join of two <=numCells-row aggregates
    "q109_source_overlap" -> NoPairJoin, // cluster-keyed self-join, fan <= |sources|^2 per cluster (bounded alphabet)
    "q110_bpe_fertility" -> NoPairJoin, // doc-level equi-join + <=|langs|-row aggregate
    "q111_cell_quota" -> NoPairJoin, // CellArgmax map + doc-level equi-joins; no expansion anywhere
    "q112_lang_budget" -> NoPairJoin, // doc-level equi-joins + broadcast bucket attach
    "q113_shard_manifest" -> NoPairJoin, // pack-volume aggregates + broadcast offset attach
    "q114_url_canon" -> NoPairJoin, // q22's hash-groupBy shape on the canonical key
    "q115_precedence_dedup" -> NoPairJoin, // q53's shape: doc-level equi-join + one max_by aggregation
    "q116_cluster_merge" -> NoPairJoin, // star-edge agg: output rows = Σ bucket sizes ≈ input rows (LINEAR, the q25 measured-negative class — the quadratic clique explode never materializes); stored base state is staged parquet, CC loops checkpointed
    "q117_sampled_recall" -> NoPairJoin, // one-row aggregate over the staged sampled logs
    "q118_epoch_mix" -> NoPairJoin, // doc-level equi-join + <=|sources|-row tail
    "q118b_epoch_mix_bpe" -> NoPairJoin, // q99 vocab join + doc-level equi-join, <=|sources|-row tail
    "q119_benchmark_report" -> NoPairJoin) // gram semi-join is match-bounded (<= benchmark gram rows), aggregates doc-keyed

  test("every registered query declares its pair-join pinning (and no stale entries)") {
    val names = Registry.all.map(_.name).toSet
    assert(names -- PairJoin.keySet == Set.empty[String],
      s"unclassified queries — declare 'pinned' (pair-producing join, must " +
        s"carry a user repartition) or 'none': ${(names -- PairJoin.keySet).toSeq.sorted}")
    assert(PairJoin.keySet -- names == Set.empty[String],
      s"stale pair-join entries: ${(PairJoin.keySet -- names).toSeq.sorted}")
  }

  PairJoin.collect { case (name, s) if s == Pinned => name }.toSeq.sorted.foreach { name =>
    test(s"$name's pair-producing join keeps a user-pinned repartition (AQE-coalesce-exempt)") {
      val origins = graft.tools.ScanAudit
        .deepNodes(TestSpark.executedPlan(name))
        .collect { case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
          e.shuffleOrigin.toString }
      assert(origins.contains("REPARTITION_BY_NUM"),
        s"$name lost its pinned pair-join repartition — AQE byte " +
          s"heuristics may serialize its quadratic output (the q92 " +
          s"collapse, SCALE.md round 12); shuffle origins: $origins")
    }
  }
}
