package graft.streaming

import graft.operators.{Bucketing, DomainCuration, Similarity, TextAnalysis, TrainingData}
import graft.sources.Schemas
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The streaming twin of [[graft.tools.Curate]]: corpus curation applied
  * to documents IN FLIGHT instead of at rest.
  *
  * Which stages move into the stream is dictated by their plan shape,
  * not preference:
  *   - quality scoring, the threshold gate, and PII redaction are pure
  *     row-local column expressions (zero state, zero shuffle) — they
  *     run inside the micro-batch at ingest cost;
  *   - near-dup detection needs cross-document memory, so it runs as
  *     the [[StreamingDedup]] stateful leg (per-signature state bounded
  *     by the watermark), and duplicates are anti-joined out when the
  *     curated batch lands;
  *   - the percentile threshold itself and anything corpus-global
  *     (mixture balancing, train/test split, packing) stay BATCH:
  *     a row-local stage cannot see the corpus, so production computes
  *     thresholds offline (TextAnalysis.qualityFilterApprox) and feeds
  *     the scalar here.
  *
  * At cluster scale both legs read the same feed partitions and the
  * post-drain anti-join is duplicate-offsets-sized (tiny), so the whole
  * path adds no shuffle to ingest beyond the dedup leg's signature
  * grouping — the same admission-controlled micro-batch shape as
  * Pipeline.runFromFeed.
  */
object StreamingCurate {

  /** The row-local curation stages, composable onto any (streaming or
    * batch) documents frame: q28 quality scoring + fixed-threshold
    * gate, the q41 repetition gate (`dup_frac <= maxDupFrac`, default
    * wide open for compatibility), then PII redaction over the
    * surviving text.
    *
    * Production ingest of raw web text should compose
    * `TextAnalysis.normalizeText` (q81) over `text` BEFORE this gate —
    * and derive [[offlineGateThresholds]] from a sample normalized the
    * same way — so signals and byte-level dedup see canonical bytes.
    * It is deliberately NOT embedded here: the gates must stay
    * bit-exact with the batch ensemble's row-local legs, which score
    * whatever text they are given; normalization is its own stage,
    * applied identically to both paths (identity on already-clean
    * corpora like the fixtures). Both gates are BOTH of the batch ensemble's
    * row-local legs, built from the same shared kernels
    * (qualityAtLeast / TrainingData.repetitionCols) so stream and
    * batch verdicts agree bit-exactly — only the corpus-frequency
    * legs (boilerplate, LM) stay batch-side, because a row cannot see
    * the corpus. Thresholds come from an offline batch run, as with
    * quality. Signals compute over the RAW text, before redaction
    * (redaction edits grams).
    */
  /** Derives the streaming gate's thresholds from an OFFLINE batch
    * sample — the "production computes the threshold offline" half of
    * the contract, as code: `minQuality` = the quality value keeping
    * the top `keepQualityFrac` of the sample, `maxDupFrac` = the
    * dup_frac value keeping the bottom `keepDupFrac`. ONE scan of the
    * sample (both signals computed row-locally off one staged
    * tokenization, both quantiles in one aggregate) using
    * `percentile_approx` — the sketch-mergeable form that scales to a
    * corpus-sized sample where an exact sort-percentile would
    * single-partition each column. Feed the result to [[curate]].
    */
  def offlineGateThresholds(sample: DataFrame,
      keepQualityFrac: Double = 0.5,
      keepDupFrac: Double = 0.95): (Double, Double) = {
    require(keepQualityFrac > 0 && keepQualityFrac <= 1.0 &&
      keepDupFrac > 0 && keepDupFrac <= 1.0, "keep fractions must be in (0, 1]")
    val scored = TextAnalysis.withQuality(sample, "text")
      .withColumn("grams", graft.functions.WordGrams(col("text"), 3))
    val sig = scored.select((col("quality") +: TrainingData.repetitionCols): _*)
    val row = sig.agg(
      percentile_approx(col("quality"), lit(1.0 - keepQualityFrac),
        lit(10000)).as("min_q"),
      percentile_approx(col("dup_frac"), lit(keepDupFrac),
        lit(10000)).as("max_dup")).head()
    (row.getDouble(0), row.getDouble(1))
  }

  def curate(docs: DataFrame, minQuality: Double,
      maxDupFrac: Double = 1.0): DataFrame = {
    val scored = TextAnalysis.qualityAtLeast(docs, minQuality)
      .withColumn("grams", graft.functions.WordGrams(col("text"), 3))
    scored
      .select((scored.columns.map(col).toSeq ++ TrainingData.repetitionCols): _*)
      .filter(col("dup_frac") <= maxDupFrac)
      .withColumn("text", TextAnalysis.redactPii(col("text")))
      .select("doc_id", "text", "lang", "source", "n_chars", "quality",
        "dup_frac")
  }

  /** End-to-end feed curation: JSON documents arrive on the DSv2 feed
    * `feed`, the row-local stages run in-stream, the near-dup leg
    * verdicts every RAW document (pre-gate — a duplicate of a
    * low-quality doc must not become "the original" just because its
    * twin was gated), and the landed batch drops verdicted duplicates
    * before the curated parquet is written.
    */
  def runFromFeed(spark: SparkSession, feed: String, workDir: String,
      minQuality: Double, retentionMs: Long = 3600L * 1000): DataFrame = {
    val trigger = Trigger.ProcessingTime(0L)
    val stream = StreamingIngest.readFeedStream(
      spark, feed, maxMessagesPerTrigger = Some(2L))
    val docs = stream
      .select(col("offset"), from_json(col("value"), Schemas.document).as("d"))
      .select(col("offset"), col("d.doc_id"), col("d.text"), col("d.lang"),
        col("d.source"))
      .withColumn("n_chars", length(col("text")).cast("long"))

    // leg 1: row-local curation → landed parquet
    val qCur = curate(docs, minQuality)
      .writeStream.format("parquet")
      .option("path", s"$workDir/curated_raw")
      .option("checkpointLocation", s"$workDir/ckpt_curate")
      .trigger(trigger)
      .start()
    // leg 2: near-dup verdicts over the RAW stream (event time from the
    // feed offset, epoch-day based — see StreamingDedup's late-row note)
    val qDup = StreamingDedup.nearDupVerdicts(
        docs.select(col("doc_id"), col("text"),
          timestamp_seconds(col("offset") + lit(86400)).as("ts")),
        "ts", retentionMs)
      .writeStream.format("parquet")
      .option("path", s"$workDir/verdicts")
      .option("checkpointLocation", s"$workDir/ckpt_verdicts")
      .trigger(trigger)
      .start()
    qCur.processAllAvailable(); qDup.processAllAvailable()
    qCur.stop(); qDup.stop()

    val dups = spark.read.parquet(s"$workDir/verdicts")
      .filter(col("dup_of") =!= col("doc_id"))
      .select("doc_id")
    spark.read.parquet(s"$workDir/curated_raw")
      .join(dups, Seq("doc_id"), "left_anti")
      .write.mode("overwrite").parquet(s"$workDir/curated")
    spark.read.parquet(s"$workDir/curated")
  }

  /** The OBSERVABILITY leg: watermarked event-time ingest statistics —
    * per (window, source): arrival count, token volume, mean q28
    * quality, and the fraction that clears the `minQuality` gate. This
    * is the dashboard feed an ingest operator watches to catch a source
    * going bad (a crawler regression shows up as a falling
    * `gate_pass_rate` within one window, long before any batch job
    * reads the corpus).
    *
    * Scale shape: quality is the same row-local q28 kernel the curation
    * leg runs (zero extra scans — Spark fuses both legs' projections
    * when chained); the windowed aggregate keeps one state row per
    * (window, source) — bounded by |sources| × windows-in-watermark,
    * independent of arrival volume — and the watermark both emits
    * finalized windows (append mode) and expires their state. Counts
    * collapse in partial aggregation before the one keyed exchange.
    */
  def statsStream(docs: DataFrame, tsCol: String, windowDuration: String,
      minQuality: Double, watermark: String = "1 hour"): DataFrame =
    TextAnalysis.withQuality(docs, tsCol, "source")
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDuration), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words").cast("long")).as("n_tokens"),
        avg(col("quality")).as("mean_quality"),
        avg(when(col("quality") >= minQuality, 1.0).otherwise(0.0))
          .as("gate_pass_rate"))
      .select(col("window.start").as("win_start"),
        col("window.end").as("win_end"), col("source"),
        col("n_docs"), col("n_tokens"), col("mean_quality"),
        col("gate_pass_rate"))

  /** The DRIFT-MONITOR leg (q105 in flight): per finalized event-time
    * window, the arriving word distribution is compared against a
    * static baseline `(w, cnt)` table — the staged token artifact of
    * the historical corpus — and the top movers by scaled probability
    * change land in a per-window report. A template rollout or spam
    * wave in the FEED shows up one window after it starts, instead of
    * at the next batch q105 run.
    *
    * VANISHED words are reconciled per finalized window (round 15,
    * closing the round-14 asymmetry): baseline words with no arriving
    * row in a window enter the ranking as cnt = 0 — the outer-diff
    * half of batch q105, paid only when a window finalizes and costing
    * |baseline vocab| rows per window (the honest floor for seeing a
    * disappearance; the in-stream state is untouched because the
    * reconciliation happens in the per-batch report join, not in the
    * windowed aggregation). Same integer arithmetic as batch q105
    * (both `div` operands nonnegative), so a window's dp_scaled for a
    * word equals what the batch query would compute for a corpus equal
    * to that window — including the vanished ones, whose dp_scaled is
    * exactly the negated baseline share.
    *
    * Scale shape: the in-stream state is one row per (window, w) —
    * vocab × windows-in-watermark, the honest floor for a distribution
    * monitor, watermark-expired like statsStream. Window totals are a
    * per-batch #windows-row broadcast; the baseline join is unhinted
    * (AQE broadcasts a typical vocabulary; web-scale vocabularies fall
    * back to a shuffle join keyed on uniform words). The report write
    * is batch_id-partitioned dynamic overwrite ([[writeVerdictBatch]]'s
    * replay idempotency); finalized windows emit exactly once (append
    * mode), so a window's report is never split across batches.
    */
  def driftStream(docs: DataFrame, baseline: DataFrame, tsCol: String,
      windowDuration: String, outPath: String, checkpoint: String,
      watermark: String = "1 hour",
      topK: Int = 10): org.apache.spark.sql.streaming.StreamingQuery = {
    StreamingIngest.requireBatchPartitionedLayout(docs.sparkSession, outPath)
    val driftScale = 1000000000L
    val baseTot = baseline.agg(sum(col("cnt"))).head().getLong(0)
    val base = baseline.select(col("w"), col("cnt").as("cnt_base"))
    docs
      .withWatermark(tsCol, watermark)
      .select(col(tsCol),
        explode(split(coalesce(col("text"), lit("")), " ")).as("w"))
      .groupBy(window(col(tsCol), windowDuration), col("w"))
      .agg(count(lit(1)).as("cnt"))
      .writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val winTot = batch.groupBy(col("window"))
          .agg(sum(col("cnt")).as("tot_new"))
        // vanished-word reconciliation: every baseline word absent from
        // a finalized window enters with cnt = 0 (one |vocab| diff per
        // window — the outer half of batch q105)
        val withVanished = batch.unionByName(
          batch.select(col("window")).distinct()
            .crossJoin(base.select(col("w")))
            .join(batch.select(col("window"), col("w")),
              Seq("window", "w"), "left_anti")
            .withColumn("cnt", lit(0L)))
        val scored = withVanished
          .join(broadcast(winTot), Seq("window"))
          .join(base, Seq("w"), "left")
          .na.fill(0L, Seq("cnt_base"))
          .select(col("window.start").as("win_start"),
            col("window.end").as("win_end"), col("w"), col("cnt"),
            col("cnt_base"),
            expr(s"(cnt * ${driftScale}L) div tot_new" +
              s" - (cnt_base * ${driftScale}L) div ${baseTot}L").as("dp_scaled"))
        val win = org.apache.spark.sql.expressions.Window
          .partitionBy(col("win_start"))
          .orderBy(abs(col("dp_scaled")).desc, col("w").asc)
        writeVerdictBatch(
          scored.withColumn("rk", row_number().over(win))
            .filter(col("rk") <= topK).drop("rk"),
          batchId, outPath)
      }
      .option("checkpointLocation", checkpoint)
      .start()
  }

  /** The SEMANTIC dedup leg, stream-static: q55's verdict applied in
    * flight against a persisted survivor index — the q57 index pattern
    * (`Dedup.writeBandIndex` / `indexVerdictStream`) transposed from
    * band keys to IVF cells.
    *
    * Per micro-batch: arriving `doc_id`s join the static `embeddings`
    * table (docs without an embedding row simply have no semantic
    * verdict — the batch-Curate contract), cells are assigned map-side
    * against broadcast `centroids`, and each vector is verdicted
    * against the co-located bucket of the cell-survivor index seeded by
    * [[graft.operators.Similarity.writeCellIndex]]. Batch survivors
    * APPEND to the index (same bucket spec, no rewrite), so a
    * paraphrase arriving later is verdicted against an earlier batch's
    * survivor. No state store exists on this leg at all — cross-batch
    * memory lives in the bucketed table, exactly like the band-index
    * leg; batch-internal duplicates are deliberately not compared
    * (today's batch joins the index next micro-batch, the q57
    * discipline).
    */
  def semanticVerdictStream(docs: DataFrame, embeddings: DataFrame,
      centroids: DataFrame, indexTable: String, outPath: String,
      checkpoint: String, threshold: Double,
      buckets: Int = 32): org.apache.spark.sql.streaming.StreamingQuery =
    semanticVerdictStreamWith(docs,
      batch => embeddings.join(
        batch.select(col("doc_id").as("vec_id")), Seq("vec_id"), "left_semi"),
      centroids, indexTable, outPath, checkpoint, threshold, buckets)

  /** Model-free variant of [[semanticVerdictStream]]: each batch's
    * embeddings are computed IN-FLIGHT from its text via the q95
    * hashing trick ([[TextAnalysis.hashEmbedDense]]) — streaming
    * semantic dedup for corpora with NO model-embedding table at all.
    * Centroids and the seeded index must live in the same hash space
    * (build both from `hashEmbedDense` of the historical corpus).
    */
  def hashedSemanticVerdictStream(docs: DataFrame, centroids: DataFrame,
      indexTable: String, outPath: String, checkpoint: String,
      threshold: Double, buckets: Int = 32,
      dim: Int = 64): org.apache.spark.sql.streaming.StreamingQuery =
    semanticVerdictStreamWith(docs,
      batch => TextAnalysis.hashEmbedDense(
        batch.select(col("doc_id"), col("text")), dim),
      centroids, indexTable, outPath, checkpoint, threshold, buckets)

  /** Replay idempotency (shared by the semantic and decontamination
    * legs, the [[StreamingIngest.writeQuarantineBatch]] discipline):
    * foreachBatch is at-least-once — a crash between the verdict write
    * and the checkpoint commit re-runs the batch — so the verdict sink
    * is `batch_id`-partitioned dynamic overwrite, never a plain
    * append: the replay rewrites its own partition in place instead of
    * double-delivering every verdict. The INDEX append needs no such
    * guard: its consumers are duplicate-insensitive by construction
    * (cellIndexVerdicts takes an argmax over index rows — a re-appended
    * identical survivor row cannot change the winner; the gram leg
    * anti-joins fresh grams against the index, so a replayed train
    * batch appends nothing at all). One honest caveat, documented
    * rather than hidden: a replayed semantic batch sees its OWN first
    * attempt's survivors in the index, so it may verdict same-batch
    * near-twins against each other where the crash-free run kept both
    * — strictly MORE dedup, never less, and never a duplicated row.
    */
  private def writeVerdictBatch(verdicts: DataFrame, batchId: Long,
      outPath: String): Unit =
    verdicts.withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(outPath)

  private def semanticVerdictStreamWith(docs: DataFrame,
      batchEmbOf: DataFrame => DataFrame, centroids: DataFrame,
      indexTable: String, outPath: String, checkpoint: String,
      threshold: Double,
      buckets: Int): org.apache.spark.sql.streaming.StreamingQuery = {
    StreamingIngest.requireBatchPartitionedLayout(docs.sparkSession, outPath)
    docs.writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        val batchEmb = batchEmbOf(batch)
        val assigned = Similarity.cellAssignments(batchEmb, centroids)
        // resolve the table INSIDE the batch so each micro-batch sees
        // the survivors every earlier batch appended; cache the
        // (batch-sized) verdicts so the survivor append never reads the
        // index table it is appending to
        val verdicts = Similarity.cellIndexVerdicts(
          assigned, spark.table(indexTable), threshold).cache()
        try {
          writeVerdictBatch(
            verdicts.withColumnRenamed("vec_id", "doc_id"), batchId, outPath)
          Bucketing.appendBucketed(
            Similarity.indexRowsOf(
              assigned.join(verdicts.select("vec_id"), Seq("vec_id"), "left_anti")),
            indexTable, "cid", buckets)
        } finally { verdicts.unpersist(); () }
      }
      .option("checkpointLocation", checkpoint)
      .start()
  }

  /** The DECONTAMINATION leg, stream-static: q43's long-n-gram leakage
    * check applied in flight against a persisted train-gram index
    * ([[graft.operators.TrainingData.writeGramIndex]] seeds it from the
    * historical train corpus).
    *
    * Per micro-batch: arriving docs take their hash split row-locally
    * (the q40 column — no corpus knowledge needed); test-split arrivals
    * are verdicted by distinct-shared-gram count against the co-located
    * index buckets; train-split arrivals grow the index by their FRESH
    * grams (batch-sized anti-join, materialized before the append so
    * the write never scans the table it is appending to). No state
    * store on this leg — cross-batch memory is the bucketed table, the
    * band/cell-index discipline. Batch-internal train→test leakage is
    * deliberately deferred one batch (today's train grams join the
    * index at the next micro-batch — the q57 discipline).
    */
  /** Per-leg output counts + the ONLY state store's size (the near-dup
    * leg — every other leg is stream-static or row-local by design,
    * asserted in StreamingSpec) + wall seconds for the drain +
    * per-leg drain progress (round 14, for the scale soak's receipts:
    * micro-batch count, input rows, the final event-time watermark on
    * the watermarked legs, and per-leg state size).
    */
  final case class LegProgress(batches: Long, inputRows: Long,
      watermark: String, stateRows: Long, stateBytes: Long)

  final case class AllLegsReport(counts: Map[String, Long],
      dedupStateRows: Long, dedupStateBytes: Long, wallSec: Double,
      legs: Map[String, LegProgress] = Map.empty)

  private def progressOf(
      q: org.apache.spark.sql.streaming.StreamingQuery): LegProgress =
    Option(q.lastProgress).fold(LegProgress(0L, 0L, "", 0L, 0L)) { lp =>
      LegProgress(
        batches = lp.batchId + 1,
        inputRows = q.recentProgress.map(_.numInputRows).sum,
        watermark = Option(lp.eventTime.get("watermark")).getOrElse(""),
        stateRows = lp.stateOperators.map(_.numRowsTotal).sum,
        stateBytes = lp.stateOperators.map(_.memoryUsedBytes).sum)
    }

  /** The COMPOSITION soak: every streaming leg running CONCURRENTLY
    * over one feed in one session/workDir — the configuration a real
    * ingest deployment runs, vs the per-leg isolation of the unit
    * tests. Legs (each with its own checkpoint under `workDir`, as
    * Structured Streaming requires per query):
    *
    *   1. row-local curation (quality + repetition gates, PII) →
    *      `curated_raw`;
    *   2. watermarked near-dup verdicts (the one STATEFUL leg) →
    *      `verdicts`;
    *   3. windowed ingest statistics → `stats`;
    *   4. hashed semantic dedup (stream-static cell index, model-free)
    *      → `sem_verdicts`;
    *   5. decontamination (stream-static gram index) → `dc_verdicts`;
    *   6. dead-letter split (idempotent batch_id-partitioned writes) →
    *      `delivered` / `quarantine`.
    *
    * All legs parse the same feed independently (the feed is a
    * replayable offset log, so N readers cost N scans of the arriving
    * micro-batch, not N copies of state); malformed payloads carry
    * null doc_ids and are filtered from the document legs — the
    * dead-letter leg is where they are accounted for. After the drain,
    * the curated output assembles exactly as [[runFromFeed]] does
    * (anti-join the near-dup verdicts).
    *
    * `cellIndexTable` must be seeded via `Similarity.writeCellIndex`
    * over `hashEmbedDense` of the historical corpus (same space as
    * `centroids`), `gramIndexTable` via `TrainingData.writeGramIndex`.
    */
  def runAllLegs(spark: SparkSession, feed: String, workDir: String,
      minQuality: Double, centroids: DataFrame, cellIndexTable: String,
      gramIndexTable: String, semThreshold: Double = 0.95,
      retentionMs: Long = 3600L * 1000, buckets: Int = 4,
      maxDupFrac: Double = 1.0,
      maxMessagesPerTrigger: Option[Long] = None,
      statsWatermark: String = "1 hour",
      driftBaseline: Option[DataFrame] = None,
      urlIndexTable: Option[String] = None): AllLegsReport = {
    val t0 = System.nanoTime()
    def docs: DataFrame = StreamingIngest.readFeedStream(spark, feed,
        maxMessagesPerTrigger = maxMessagesPerTrigger)
      .select(col("offset"), from_json(col("value"), Schemas.document).as("d"))
      .select(col("offset"), col("d.doc_id"), col("d.text"), col("d.lang"),
        col("d.source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .filter(col("doc_id").isNotNull)
    def ts = timestamp_seconds(col("offset") + lit(86400))

    val qCur = curate(docs, minQuality, maxDupFrac)
      .writeStream.format("parquet")
      .option("path", s"$workDir/curated_raw")
      .option("checkpointLocation", s"$workDir/ckpt_curate").start()
    val qDup = StreamingDedup.nearDupVerdicts(
        docs.select(col("doc_id"), col("text"), ts.as("ts")), "ts", retentionMs)
      .writeStream.format("parquet")
      .option("path", s"$workDir/verdicts")
      .option("checkpointLocation", s"$workDir/ckpt_verdicts").start()
    val qStats = statsStream(docs.withColumn("ts", ts), "ts", "60 seconds",
        minQuality, statsWatermark)
      .writeStream.format("parquet").outputMode("append")
      .option("path", s"$workDir/stats")
      .option("checkpointLocation", s"$workDir/ckpt_stats").start()
    val qSem = hashedSemanticVerdictStream(
      docs.select(col("doc_id"), col("text")), centroids, cellIndexTable,
      s"$workDir/sem_verdicts", s"$workDir/ckpt_sem", semThreshold, buckets)
    val qDc = decontamVerdictStream(
      docs.select(col("doc_id"), col("text")), gramIndexTable,
      s"$workDir/dc_verdicts", s"$workDir/ckpt_dc", buckets)
    // drift-monitor leg only when a historical baseline is supplied
    val qDrift = driftBaseline.map(base => driftStream(
      docs.select(col("doc_id"), col("text"), ts.as("ts")), base,
      "ts", "60 seconds", s"$workDir/drift", s"$workDir/ckpt_drift",
      watermark = statsWatermark))
    // URL-dedup leg only when a first-sighting index is supplied; the
    // feed carries no url column, so the fixture convention derives
    // the messy spelling from doc_id (the q114 planting pattern)
    val qUrl = urlIndexTable.map(t => urlVerdictStream(
      docs.select(col("doc_id"),
        graft.operators.DomainCuration.messyUrl(col("doc_id")).as("url")),
      t, s"$workDir/url_verdicts", s"$workDir/ckpt_url", buckets))

    val withCorrupt = Schemas.document
      .add("_corrupt", org.apache.spark.sql.types.StringType)
    val qDl = StreamingIngest.readFeedStream(spark, feed,
        maxMessagesPerTrigger = maxMessagesPerTrigger)
      .select(col("value"), from_json(col("value"), withCorrupt,
        Map("columnNameOfCorruptRecord" -> "_corrupt")).as("e"))
      .withColumn("malformed", col("e._corrupt").isNotNull)
      .writeStream
      .option("checkpointLocation", s"$workDir/ckpt_dl")
      .foreachBatch { (b: Dataset[Row], id: Long) =>
        StreamingIngest.writeQuarantineBatch(b, id,
          s"$workDir/delivered", s"$workDir/quarantine")
      }
      .start()

    val legs = Seq(qCur, qDup, qStats, qSem, qDc, qDl) ++ qDrift ++ qUrl
    legs.foreach(_.processAllAvailable())
    val stateRows = Option(qDup.lastProgress)
      .map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(0L)
    val stateBytes = Option(qDup.lastProgress)
      .map(_.stateOperators.map(_.memoryUsedBytes).sum).getOrElse(0L)
    val legProgress = (Seq("curate" -> qCur, "neardup" -> qDup,
      "stats" -> qStats, "semantic" -> qSem, "decontam" -> qDc,
      "deadletter" -> qDl) ++ qDrift.map("drift" -> _) ++
      qUrl.map("urldedup" -> _))
      .map { case (n, q) => n -> progressOf(q) }.toMap
    legs.foreach(_.stop())

    val dups = spark.read.parquet(s"$workDir/verdicts")
      .filter(col("dup_of") =!= col("doc_id")).select("doc_id")
    spark.read.parquet(s"$workDir/curated_raw")
      .join(dups, Seq("doc_id"), "left_anti")
      .write.mode("overwrite").parquet(s"$workDir/curated")
    def cnt(p: String): Long =
      scala.util.Try(spark.read.parquet(s"$workDir/$p").count()).getOrElse(0L)
    AllLegsReport(
      Map("curated" -> cnt("curated"), "dup_verdicts" -> cnt("verdicts"),
        "sem_verdicts" -> cnt("sem_verdicts"),
        "dc_verdicts" -> cnt("dc_verdicts"), "stats_rows" -> cnt("stats"),
        "delivered" -> cnt("delivered"), "quarantined" -> cnt("quarantine"),
        "drift_rows" -> cnt("drift"), "url_verdicts" -> cnt("url_verdicts")),
      stateRows, stateBytes, (System.nanoTime() - t0) / 1e9, legProgress)
  }

  /** Stream-static span EXCISION leg (the q104 kernel in flight):
    * arriving train docs are cleaned against a fixed benchmark suite
    * per micro-batch — the clean-at-ingest policy, where the batch
    * pipeline's stage 5b cleans at build time. The benchmark is
    * stream-static (eval suites change on release cadence, not
    * per-batch), so the leg is STATELESS: the gram set broadcasts
    * into each micro-batch and the excision is row-local — no state
    * store, no watermark, idempotent batch_id-partitioned writes
    * (replays overwrite their own partition). Output rows:
    * `(doc_id, n_tokens, n_removed, clean_text, batch_id)` for every
    * arriving doc, clean ones unchanged.
    */
  def exciseStream(docs: DataFrame, benchmark: DataFrame,
      outPath: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    StreamingIngest.requireBatchPartitionedLayout(docs.sparkSession, outPath)
    docs.writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        writeVerdictBatch(
          TrainingData.exciseBenchmarkSpans(batch, benchmark),
          batchId, outPath)
      }
      .option("checkpointLocation", checkpoint)
      .start()
  }

  /** q114 in flight — the crawl-frontier "have we seen this canonical
    * URL?" gate, the cheapest dedup a streaming ingest can run because
    * it fires BEFORE any text processing: each arriving doc's URL
    * canonicalizes row-locally (the q114 regex chain), gets a duplicate
    * verdict against the persisted canonical-URL index plus its own
    * micro-batch (min doc_id is the batch's representative), and each
    * batch appends its NEW canonical URLs to the index — the
    * decontam/semantic-leg pattern: stream-static join against a
    * canon-bucketed table, zero state store. Replay-idempotent BY
    * CONSTRUCTION even though verdicts and appends touch the same
    * rows: a doc is never `dup_of` itself (the self-match guard), so a
    * replayed batch whose first attempt already appended its URLs
    * reproduces byte-identical verdicts, and the append's anti-join
    * adds nothing twice. Output rows: `(doc_id, url, canon_url,
    * dup_of, batch_id)` — dup_of NULL for first sightings.
    */
  def urlVerdictStream(docs: DataFrame, indexTable: String,
      outPath: String, checkpoint: String,
      buckets: Int = 32): org.apache.spark.sql.streaming.StreamingQuery = {
    StreamingIngest.requireBatchPartitionedLayout(docs.sparkSession, outPath)
    docs.writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        val canon = batch.select(col("doc_id"), col("url"),
          DomainCuration.canonicalizeUrl(col("url")).as("canon_url"))
        // resolve the table INSIDE the batch (decontam-leg rule) so
        // each micro-batch sees every earlier batch's appended URLs
        val index = spark.table(indexTable)
        val batchRep = canon.groupBy(col("canon_url"))
          .agg(min(col("doc_id")).as("batch_rep"))
        // An INDEXED canon_url's verdict comes entirely from the index:
        // dup_of = null for the recorded first sighting itself, else
        // first_doc_id. The within-batch rule applies ONLY to unindexed
        // URLs. (Round-14 ADVICE: the earlier coalesce fell through to
        // the batch rule when doc_id == first_doc_id, so a redelivered
        // first sighting arriving alongside a LOWER-id copy produced a
        // mutual dup_of cycle — a consumer dropping dup_of-non-null
        // rows lost every copy of the page.)
        val verdicts = canon
          .join(index, Seq("canon_url"), "left")
          .join(batchRep, Seq("canon_url"))
          .select(col("doc_id"), col("url"), col("canon_url"),
            when(col("first_doc_id").isNotNull,
              when(col("first_doc_id") =!= col("doc_id"), col("first_doc_id")))
              .otherwise(
                when(col("doc_id") =!= col("batch_rep"), col("batch_rep")))
              .as("dup_of"))
        writeVerdictBatch(verdicts, batchId, outPath)
        val fresh = batchRep
          .join(index, Seq("canon_url"), "left_anti")
          .select(col("canon_url"), col("batch_rep").as("first_doc_id"))
        Bucketing.appendBucketed(fresh, indexTable, "canon_url", buckets)
      }
      .option("checkpointLocation", checkpoint)
      .start()
  }

  def decontamVerdictStream(docs: DataFrame, indexTable: String,
      outPath: String, checkpoint: String,
      buckets: Int = 32): org.apache.spark.sql.streaming.StreamingQuery = {
    StreamingIngest.requireBatchPartitionedLayout(docs.sparkSession, outPath)
    docs.writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        val withSplit = batch.withColumn("split", TrainingData.splitColumn)
        // resolve the table INSIDE the batch so each micro-batch sees
        // every earlier batch's appended grams
        val index = spark.table(indexTable)
        // batch_id-overwrite, not append — see writeVerdictBatch; the
        // gram append below is replay-idempotent on its own (fresh
        // grams anti-join the index the first attempt already grew)
        writeVerdictBatch(
          TrainingData.gramIndexVerdicts(
            withSplit.filter(col("split") === "test"), index),
          batchId, outPath)
        val fresh = TrainingData.gramRowsOf(
            withSplit.filter(col("split") === "train"))
          .join(index, Seq("gh"), "left_anti").cache()
        try {
          fresh.count() // materialize: the append must not scan its own table
          Bucketing.appendBucketed(fresh, indexTable, "gh", buckets)
        } finally { fresh.unpersist(); () }
      }
      .option("checkpointLocation", checkpoint)
      .start()
  }
}
