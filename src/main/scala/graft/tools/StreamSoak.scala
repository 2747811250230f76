package graft.tools

import graft.operators.{Similarity, TextAnalysis, TrainingData}
import org.apache.spark.sql.functions._

/** The all-legs streaming soak at fixture scale: replays half the
  * `documents` table of a scale-factor dir through the in-JVM feed with
  * EVERY streaming leg running concurrently
  * ([[graft.streaming.StreamingCurate.runAllLegs]]), the other half
  * seeding the stream-static indexes (cell index from hash embeddings,
  * train-gram index) — the configuration a real ingest deployment runs.
  * Prints ONE JSON line: replay size, wall seconds, docs/sec, per-leg
  * output counts, and the near-dup leg's state-store size (the only
  * stateful leg; the others are asserted state-free in StreamingSpec).
  *
  * Usage: StreamSoak [sfDir] [batchSize=2000]
  */
object StreamSoak {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val batchSize = if (args.length > 1) args(1).toLong else 2000L
    val spark = graft.GraftSession.local("graft-stream-soak",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
    val hist = docs.filter(col("doc_id") % 2 === 0)
    val arriving = docs.filter(col("doc_id") % 2 =!= 0)

    // fresh index tables per run: drop any prior soak's tables AND
    // their managed locations (saveAsTable refuses a stale dir)
    Seq("soak_cell_idx", "soak_gram_idx", "soak_url_idx").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(loc)
      }
    }

    // stream-static seeds, all in the model-free q95 hash space; the
    // cell count derives from the seeding corpus (cells ∝ corpus, the
    // q92 sf10 rule) with a 32-cell floor so the soak always exercises
    // multi-cell verdicts even on tiny fixtures
    val histEmb = TextAnalysis.hashEmbedDense(hist)
    val numCells = Similarity.derivedNumCells(histEmb, minCells = 32)
    val centroids = Similarity.asCentroids(
      histEmb.orderBy(col("vec_id")).limit(numCells))
    Similarity.writeCellIndex(histEmb, centroids, "soak_cell_idx", 32)
    TrainingData.writeGramIndex(hist, "soak_gram_idx", 32)
    // URL first-sighting index from the seeding half's messy spellings
    // (the q114 fixture convention — the feed carries no url column)
    graft.operators.DomainCuration.writeUrlIndex(
      hist.select(col("doc_id"),
        graft.operators.DomainCuration.messyUrl(col("doc_id")).as("url")),
      "soak_url_idx", 32)

    // replay the arriving half as JSON messages (the in-JVM feed is a
    // test double; the collect is soak tooling, not a query path)
    val msgs = arriving
      .select(to_json(struct(col("doc_id"), col("text"), col("lang"),
        col("source"))).as("j"))
      .collect().map(_.getString(0))
    graft.sources.FeedRegistry.clear("soak")
    graft.sources.FeedRegistry.post("soak", msgs.toIndexedSeq: _*)

    val work = java.nio.file.Files.createTempDirectory("soak").toString
    // the drift leg's historical baseline: the seeding half's word
    // distribution (what the staged token artifact holds in production)
    val baseline = hist
      .select(explode(split(coalesce(col("text"), lit("")), " ")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
    val rep = graft.streaming.StreamingCurate.runAllLegs(
      spark, "soak", work, minQuality = 50.0,
      centroids, "soak_cell_idx", "soak_gram_idx", buckets = 32,
      maxMessagesPerTrigger = Some(batchSize),
      // replay offsets span ~n_docs seconds of event time; a short
      // watermark lets the stats leg FINALIZE most windows inside the
      // soak, so the emitted row count is part of the evidence
      statsWatermark = "2 minutes",
      driftBaseline = Some(baseline),
      urlIndexTable = Some("soak_url_idx"))
    val counts = rep.counts.toSeq.sortBy(_._1)
      .map { case (k, v) => s"\"$k\":$v" }.mkString("{", ",", "}")
    // watermark lag per watermarked leg: replay event time is
    // offset+86400s, so the newest event the feed carries is known
    val maxEventSec = 86400L + msgs.length - 1
    val legs = rep.legs.toSeq.sortBy(_._1).map { case (n, p) =>
      val lagSec = if (p.watermark.isEmpty) -1L
        else maxEventSec - java.time.Instant.parse(p.watermark).getEpochSecond
      s""""$n":{"batches":${p.batches},"rows":${p.inputRows},""" +
        s""""state_rows":${p.stateRows},"state_bytes":${p.stateBytes},""" +
        s""""watermark_lag_sec":$lagSec}"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"stream_soak","sf":"$sfDir","n_replayed":${msgs.length},""" +
      s""""batch_size":$batchSize,"wall_sec":${math.rint(rep.wallSec * 100) / 100},""" +
      s""""docs_per_sec":${math.rint(msgs.length / rep.wallSec)},""" +
      s""""dedup_state_rows":${rep.dedupStateRows},""" +
      s""""dedup_state_bytes":${rep.dedupStateBytes},"counts":$counts,""" +
      s""""legs":$legs}""")
    spark.stop()
  }
}
