package graft

import graft.operators.Similarity
import graft.streaming.StreamingIngest
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Streaming semantics ST1-ST7 (SURVEY.md §2.9) via drop-directory and
  * MemoryStream micro-batch tests.
  */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def writeEventFile(dir: String, name: String, lines: String*): Unit =
    Files.write(java.nio.file.Paths.get(dir, name),
      lines.mkString("\n").getBytes)

  test("ST1/ST2: drop-dir ingest projects and caps files per trigger") {
    val drop = Files.createTempDirectory("drop").toString
    val out = Files.createTempDirectory("out").toString
    val ckpt = Files.createTempDirectory("ckpt").toString
    (1 to 5).foreach { i =>
      writeEventFile(drop, s"e$i.json",
        s"""{"mint":"M$i","txType":"create","solAmount":$i.5,"name":"T$i","symbol":"S$i","junk":1}""")
    }
    val q = StreamingIngest.runIngestOnce(spark, drop, out, ckpt, maxFilesPerTrigger = 2)
    q.awaitTermination(120000)
    val got = spark.read.parquet(out)
    assert(got.count() == 5)
    assert(got.columns.toSet == Set("mint", "txType", "solAmount", "name", "symbol"))
    // ST2: with cap 2 and 5 files, AvailableNow needed >= 3 micro-batches
    assert(q.recentProgress.length >= 3)
  }

  test("ST5: incremental restart processes only new files (checkpoint offsets)") {
    val drop = Files.createTempDirectory("drop2").toString
    val out = Files.createTempDirectory("out2").toString
    val ckpt = Files.createTempDirectory("ckpt2").toString
    writeEventFile(drop, "a.json", """{"mint":"A","txType":"create","solAmount":1.0,"name":"a","symbol":"a"}""")
    StreamingIngest.runIngestOnce(spark, drop, out, ckpt).awaitTermination(120000)
    assert(spark.read.parquet(out).count() == 1)
    // second run with one more file: only the new one is consumed
    writeEventFile(drop, "b.json", """{"mint":"B","txType":"buy","solAmount":2.0,"name":"b","symbol":"b"}""")
    StreamingIngest.runIngestOnce(spark, drop, out, ckpt).awaitTermination(120000)
    val rows = spark.read.parquet(out)
    assert(rows.count() == 2)
    assert(rows.select("mint").collect().map(_.getString(0)).toSet == Set("A", "B"))
  }

  test("ST5/J1: watermarked dedup drops in-window duplicate signatures") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long)]
    val df = mem.toDF().toDF("signature", "sec")
      .select(col("signature"), timestamp_seconds(col("sec")).as("ts"))
    val deduped = StreamingIngest.dedupWithinWatermark(df, "ts", "10 minutes", "signature")
    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    mem.addData(("sig1", 1000L), ("sig1", 1010L), ("sig2", 1020L))
    q.processAllAvailable()
    mem.addData(("sig1", 1030L), ("sig3", 1040L)) // sig1 again within window
    q.processAllAvailable()
    q.stop()
    val sigs = spark.table("dedup_out").select("signature")
      .collect().map(_.getString(0)).toSeq
    assert(sigs.sorted == Seq("sig1", "sig2", "sig3"))
  }

  test("ST9: two concurrent streaming queries share one session") {
    val dropA = Files.createTempDirectory("ca").toString
    val dropB = Files.createTempDirectory("cb").toString
    val outA = Files.createTempDirectory("oa").toString
    val outB = Files.createTempDirectory("ob").toString
    writeEventFile(dropA, "a.json", """{"mint":"A","txType":"create","solAmount":1.0,"name":"a","symbol":"a"}""")
    writeEventFile(dropB, "b.json", """{"mint":"B","txType":"buy","solAmount":2.0,"name":"b","symbol":"b"}""")
    // reference runs websocket ingest ∥ 3h batch loop as threads
    // (my_websocket.py:149-152); here: two concurrent queries
    val qA = StreamingIngest.runIngestOnce(spark, dropA, outA,
      Files.createTempDirectory("cka").toString)
    val qB = StreamingIngest.runIngestOnce(spark, dropB, outB,
      Files.createTempDirectory("ckb").toString)
    qA.awaitTermination(120000); qB.awaitTermination(120000)
    assert(spark.read.parquet(outA).select("mint").collect().head.getString(0) == "A")
    assert(spark.read.parquet(outB).select("mint").collect().head.getString(0) == "B")
  }

  test("watermarked tumbling window aggregate emits finalized windows (append)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val df = mem.toDF().toDF("sec", "etype")
      .select(timestamp_seconds(col("sec")).as("ts"), col("etype"))
    val agg = df.withWatermark("ts", "10 seconds")
      .groupBy(window(col("ts"), "60 seconds"), col("etype"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("win_out")
      .outputMode("append").start()
    mem.addData((5L, "a"), (15L, "a"), (30L, "b"))
    q.processAllAvailable()
    // nothing finalized yet: watermark = 30 - 10 < window end 60
    assert(spark.table("win_out").count() == 0)
    mem.addData((200L, "a")) // watermark 190 → [0, 60) finalized
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("win_out")
      .select(col("etype"), col("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows == Map("a" -> 2L, "b" -> 1L))
  }

  test("ST6: foreachBatch chains normalization + load inside one stream") {
    val drop = Files.createTempDirectory("fb").toString
    val out = Files.createTempDirectory("fbout").toString
    writeEventFile(drop, "e.json",
      """{"mint":"MM","txType":"create","solAmount":3.0,"name":"N","symbol":"S"}""")
    val q = StreamingIngest.readEventStream(spark, drop)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        // stage chain (reference: subprocess clean_data.py) in one app:
        graft.operators.Normalize.fromRawEvents(batch)
          .write.mode("append").parquet(out)
        ()
      }
      .option("checkpointLocation", Files.createTempDirectory("fbc").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val rows = spark.read.parquet(out)
    assert(rows.count() == 1)
    assert(rows.select("mint").collect().head.getString(0) == "MM")
    assert(rows.columns.length == 15) // canonical table
  }

  test("S10: cleanSource=delete destructively consumes processed files") {
    val drop = Files.createTempDirectory("s10").toString
    val out = Files.createTempDirectory("s10out").toString
    val ckpt = Files.createTempDirectory("s10ckpt").toString
    (1 to 3).foreach { i =>
      writeEventFile(drop, s"e$i.json",
        s"""{"mint":"D$i","txType":"create","solAmount":$i.0,"name":"d$i","symbol":"d$i"}""")
    }
    def remaining(): Set[String] =
      new java.io.File(drop).listFiles().map(_.getName).toSet
    // cap 1 → 3 micro-batches; batch i's file is cleaned when batch i+1
    // commits, so after one run at most the final batch's file survives
    StreamingIngest.runIngestOnce(spark, drop, out, ckpt,
      maxFilesPerTrigger = 1, cleanSource = "delete").awaitTermination(120000)
    val deadline = System.currentTimeMillis() + 30000 // cleaner is async
    while (remaining().size > 1 && System.currentTimeMillis() < deadline)
      Thread.sleep(200)
    assert(remaining().size <= 1, s"files not consumed: ${remaining()}")
    // a later pass consumes the tail file too (the reference's next poll)
    writeEventFile(drop, "e4.json",
      """{"mint":"D4","txType":"buy","solAmount":4.0,"name":"d4","symbol":"d4"}""")
    StreamingIngest.runIngestOnce(spark, drop, out, ckpt,
      maxFilesPerTrigger = 1, cleanSource = "delete").awaitTermination(120000)
    val deadline2 = System.currentTimeMillis() + 30000
    while (remaining().exists(_ != "e4.json") && System.currentTimeMillis() < deadline2)
      Thread.sleep(200)
    assert(remaining().subsetOf(Set("e4.json")), s"stale files: ${remaining()}")
    // nothing lost: all four rows landed exactly once
    assert(spark.read.parquet(out).select("mint").collect()
      .map(_.getString(0)).toSet == Set("D1", "D2", "D3", "D4"))
  }

  test("dead-letter ingest: malformed payloads quarantine, valid rows deliver, nothing vanishes") {
    graft.sources.FeedRegistry.clear("wsq")
    graft.sources.FeedRegistry.post("wsq",
      """{"mint":"Q1","txType":"create","solAmount":1.0,"name":"q1","symbol":"q1"}""",
      """{nope""", // unparseable
      """{"mint":"Q2","txType":"buy","solAmount":2.0,"name":"q2","symbol":"q2"}""",
      """not json at all""", // unparseable
      """{"unexpected":"fields"}""") // valid JSON, wrong shape => NOT quarantined
    val out = Files.createTempDirectory("qout").toString
    val quar = Files.createTempDirectory("qbad").toString
    val ckpt = Files.createTempDirectory("qckpt").toString
    val q = StreamingIngest.runIngestWithQuarantine(
      spark, "wsq", out, quar, ckpt)
    q.awaitTermination(60000)
    val delivered = spark.read.parquet(out)
    // 3 parseable payloads delivered: Q1, Q2, and the schema-projected
    // all-null row (valid JSON is data, not a transport error)
    assert(delivered.count() == 3)
    assert(delivered.select("mint").collect().map(_.getString(0)).toSet
      == Set("Q1", "Q2", null))
    val bad = spark.read.parquet(quar).select("payload").collect()
      .map(_.getString(0)).toSet
    assert(bad == Set("{nope", "not json at all"))
  }

  test("dead-letter ingest is idempotent: replaying a micro-batch never double-delivers") {
    // foreachBatch is at-least-once — a crash between the delivered
    // write and the checkpoint commit replays the batch. The sinks are
    // batch_id-partitioned dynamic overwrite, so the replay rewrites
    // its own partition in place. Drive the batch writer directly with
    // the same (batch, batchId) twice and assert exactly-once counts.
    val withCorrupt = graft.sources.Schemas.rawEvent
      .add("_corrupt", org.apache.spark.sql.types.StringType)
    import spark.implicits._
    val batch = Seq(
      """{"mint":"R1","txType":"create","solAmount":1.0,"name":"r1","symbol":"r1"}""",
      """{broken""").toDF("value")
      .select(col("value"), from_json(col("value"), withCorrupt,
        Map("columnNameOfCorruptRecord" -> "_corrupt")).as("e"))
      .withColumn("malformed", col("e._corrupt").isNotNull)
    val out = Files.createTempDirectory("idemout").toString
    val quar = Files.createTempDirectory("idemquar").toString
    StreamingIngest.writeQuarantineBatch(batch, 7L, out, quar)
    StreamingIngest.writeQuarantineBatch(batch, 7L, out, quar) // the replay
    assert(spark.read.parquet(out).count() == 1L, "delivered row duplicated on replay")
    assert(spark.read.parquet(quar).count() == 1L, "quarantined row duplicated on replay")
    // a DIFFERENT batch appends alongside, untouched by the first
    val batch2 = Seq(
      """{"mint":"R2","txType":"buy","solAmount":2.0,"name":"r2","symbol":"r2"}""")
      .toDF("value")
      .select(col("value"), from_json(col("value"), withCorrupt,
        Map("columnNameOfCorruptRecord" -> "_corrupt")).as("e"))
      .withColumn("malformed", col("e._corrupt").isNotNull)
    StreamingIngest.writeQuarantineBatch(batch2, 8L, out, quar)
    assert(spark.read.parquet(out).select("mint").collect()
      .map(_.getString(0)).toSet == Set("R1", "R2"))
  }

  test("dead-letter ingest rejects a legacy flat-layout sink before writing") {
    // the sinks moved from flat appended parquet to batch_id=N/
    // partitions; restarting an old deployment against its old flat
    // outDir would mix both layouts in one root, which Spark partition
    // discovery rejects only at READ time. The stream must fail fast
    // with a migration message instead.
    import spark.implicits._
    val legacy = Files.createTempDirectory("legacyout").toString
    Seq(("L1", 1.0)).toDF("mint", "solAmount").write
      .mode("append").parquet(legacy) // flat files, no batch_id=
    val ex = intercept[IllegalArgumentException] {
      StreamingIngest.requireBatchPartitionedLayout(spark, legacy)
    }
    assert(ex.getMessage.contains("batch_id"), ex.getMessage)
    // an already-partitioned sink (or a fresh one) passes
    val fine = Files.createTempDirectory("partout").toString
    Seq(("L2", 2.0)).toDF("mint", "solAmount")
      .withColumn("batch_id", lit(0L))
      .write.mode("append").partitionBy("batch_id").parquet(fine)
    StreamingIngest.requireBatchPartitionedLayout(spark, fine)
    StreamingIngest.requireBatchPartitionedLayout(spark,
      Files.createTempDirectory("freshout").toString + "/nonexistent")
  }

  test("S1: DSv2 feed source streams posted messages with checkpointed offsets") {
    graft.sources.FeedRegistry.clear("ws1")
    graft.sources.FeedRegistry.post("ws1",
      """{"mint":"F1","txType":"create","solAmount":1.0,"name":"f1","symbol":"f1"}""",
      """{"mint":"F2","txType":"buy","solAmount":2.0,"name":"f2","symbol":"f2"}""")
    val q = StreamingIngest.feedEventStream(spark, "ws1")
      .writeStream.format("memory").queryName("feed_out")
      .outputMode("append").start()
    q.processAllAvailable()
    assert(spark.table("feed_out").count() == 2)
    // messages posted while the query runs arrive in the next batch
    graft.sources.FeedRegistry.post("ws1",
      """{"mint":"F3","txType":"sell","solAmount":3.0,"name":"f3","symbol":"f3"}""")
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("feed_out")
    assert(rows.count() == 3)
    assert(rows.select("mint").collect().map(_.getString(0)).toSet ==
      Set("F1", "F2", "F3"))
  }

  test("S1: feed batch range splits across the configured input partitions") {
    graft.sources.FeedRegistry.clear("ws2")
    graft.sources.FeedRegistry.post("ws2", (1 to 10).map(i => s"""{"m":$i}"""): _*)
    // non-default numPartitions: 10 msgs / 3 partitions plans ranges
    // [0,4)[4,8)[8,10) — a silent fall-back to the default 4 would show
    // as 4 distinct partition ids (regression: option-key case matching)
    val q = StreamingIngest.readFeedStream(spark, "ws2", numPartitions = 3)
      .withColumn("pid", spark_partition_id())
      .writeStream.format("memory").queryName("feed_part_out")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("feed_part_out")
    assert(got.count() == 10)
    // offsets are the feed positions, exactly once each
    assert(got.select("offset").collect().map(_.getLong(0)).sorted.toSeq ==
      (0L until 10L).toSeq)
    assert(got.select("pid").distinct().count() == 3)
  }

  test("S1/ST2: maxMessagesPerTrigger drains a backlog as bounded batches") {
    graft.sources.FeedRegistry.clear("ws3")
    graft.sources.FeedRegistry.post("ws3", (1 to 10).map(i => s"""{"m":$i}"""): _*)
    val q = StreamingIngest.readFeedStream(spark, "ws3",
        maxMessagesPerTrigger = Some(3L))
      .writeStream.format("memory").queryName("feed_cap_out")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    assert(spark.table("feed_cap_out").count() == 10)
    val batchSizes = q.recentProgress.map(_.numInputRows).filter(_ > 0)
    assert(batchSizes.length >= 4, // 3+3+3+1: no giant catch-up batch
      s"expected >=4 capped batches, got ${batchSizes.mkString(",")}")
    assert(batchSizes.max <= 3)
  }

  test("S1/ST7: feed query restarts from checkpoint, reads only new messages") {
    graft.sources.FeedRegistry.clear("ws5")
    graft.sources.FeedRegistry.post("ws5", (1 to 4).map(i => s"""{"m":$i}"""): _*)
    val out = Files.createTempDirectory("feedout").toString
    val ckpt = Files.createTempDirectory("feedckpt").toString
    def runOnce(): Unit = {
      val q = StreamingIngest.readFeedStream(spark, "ws5",
          maxMessagesPerTrigger = Some(2L))
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .start()
      q.processAllAvailable(); q.stop()
    }
    runOnce()
    assert(spark.read.parquet(out).count() == 4)
    // restart against the same checkpoint: resumes at offset 4, capped
    graft.sources.FeedRegistry.post("ws5", """{"m":5}""", """{"m":6}""")
    runOnce()
    val got = spark.read.parquet(out).select("offset")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got == (0L until 6L)) // exactly once: no replay, no loss
  }

  test("S1: socket transport drains a FeedServer with admission control and checkpoint restart") {
    val srv = new graft.sources.FeedServer().start()
    try {
      graft.sources.FeedRegistry.clear("wsock")
      val producer = graft.sources.SocketTransport("localhost", srv.boundPort)
      // produce over TCP — the websocket-callback analog; the embedded
      // newline exercises the base64 framing
      producer.post("wsock",
        (1 to 7).map(i => s"""{"m":$i}""") :+ "{\"m\":8,\n \"multi\":true}": _*)
      assert(producer.size("wsock") == 8)
      val out = Files.createTempDirectory("sockout").toString
      val ckpt = Files.createTempDirectory("sockckpt").toString
      def runOnce() = {
        val q = StreamingIngest.readFeedStream(spark, "wsock",
            maxMessagesPerTrigger = Some(3L),
            server = Some("localhost" -> srv.boundPort))
          .writeStream.format("parquet")
          .option("path", out).option("checkpointLocation", ckpt)
          .start()
        q.processAllAvailable(); q.stop(); q
      }
      val q1 = runOnce()
      assert(spark.read.parquet(out).count() == 8)
      // admission control operated through the socket size() path
      val batchSizes = q1.recentProgress.map(_.numInputRows).filter(_ > 0)
      assert(batchSizes.nonEmpty && batchSizes.max <= 3,
        s"expected capped batches, got ${batchSizes.mkString(",")}")
      // restart from checkpoint: only the two messages posted after
      producer.post("wsock", """{"m":9}""", """{"m":10}""")
      runOnce()
      val got = spark.read.parquet(out)
      assert(got.select("offset").collect().map(_.getLong(0)).sorted.toSeq
        == (0L until 10L)) // exactly once through TCP: no replay, no loss
      // the newline-bearing message round-tripped byte-identically
      assert(got.filter(col("offset") === 7).select("value")
        .collect().head.getString(0) == "{\"m\":8,\n \"multi\":true}")
    } finally srv.stop()
  }

  test("socket transport round-trips empty messages and rejects bad feed names") {
    val srv = new graft.sources.FeedServer().start()
    try {
      graft.sources.FeedRegistry.clear("wsock3")
      val t = graft.sources.SocketTransport("localhost", srv.boundPort)
      // the empty string base64-encodes to an empty token — a \s+ split
      // server-side would silently drop it and shift every offset
      t.post("wsock3", "a", "", "b")
      assert(t.size("wsock3") == 3)
      assert(t.slice("wsock3", 0L, 3L).map(_._2) == Seq("a", "", "b"))
      // whitespace feed names would break the space-framed protocol
      intercept[IllegalArgumentException] { t.post("bad feed", "x") }
    } finally srv.stop()
  }

  test("socket transport fails loudly against a stopped server and on bad ranges") {
    val srv = new graft.sources.FeedServer().start()
    graft.sources.FeedRegistry.clear("wsock2")
    val t = graft.sources.SocketTransport("localhost", srv.boundPort)
    t.post("wsock2", "a")
    // server-side slice guard surfaces as a client-side error, not silence
    val e = intercept[IllegalStateException] { t.slice("wsock2", 0L, 5L) }
    assert(e.getMessage.contains("lifetime"))
    srv.stop()
    // unreachable server: port 1 is never bound in this environment —
    // asserting on srv's just-freed ephemeral port is racy (another
    // listener, or a localhost self-connect, can claim it immediately)
    intercept[java.io.IOException] {
      graft.sources.SocketTransport("localhost", 1).size("wsock2")
    }
  }

  test("FeedRegistry.slice fails loudly on out-of-registry ranges") {
    graft.sources.FeedRegistry.clear("ws4")
    graft.sources.FeedRegistry.post("ws4", "a", "b")
    // beyond the Int-indexable test-double capacity
    val e1 = intercept[IllegalArgumentException] {
      graft.sources.FeedRegistry.slice("ws4", Int.MaxValue.toLong, Int.MaxValue + 2L)
    }
    assert(e1.getMessage.contains("at most"))
    // checkpoint offsets outliving the registry contents (cleared feed)
    val e2 = intercept[IllegalArgumentException] {
      graft.sources.FeedRegistry.slice("ws4", 0L, 5L)
    }
    assert(e2.getMessage.contains("lifetime"))
    assert(graft.sources.FeedRegistry.slice("ws4", 0L, 2L).map(_._2) == Seq("a", "b"))
  }

  test("stateful streaming near-dup maps copies to their original, expires state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Long)]
    val docs = mem.toDF().toDF("doc_id", "text", "sec")
      .select(col("doc_id"), col("text"), timestamp_seconds(col("sec")).as("ts"))
    val q = graft.streaming.StreamingDedup
      .nearDupVerdicts(docs, "ts", retentionMs = 10000L)
      .writeStream.format("memory").queryName("neardup_out")
      .outputMode("append").start()
    def verdicts(): Map[Long, (Long, Long)] =
      spark.table("neardup_out").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // batch 1: original + same-batch duplicate + distinct doc
    mem.addData((1L, "the quick brown fox jumps", 100L),
      (2L, "the quick brown fox jumps", 105L),
      (3L, "completely different words entirely", 106L))
    q.processAllAvailable()
    assert(verdicts() == Map(1L -> (1L, 0L), 2L -> (1L, 1L), 3L -> (3L, 0L)))
    // batch 2: state persists across batches — doc 4 still maps to doc 1
    // (watermark 106-10=96s has not passed the signature's 105+10s timeout)
    mem.addData((4L, "the quick brown fox jumps", 110L))
    q.processAllAvailable()
    assert(verdicts()(4L) == (1L, 2L))
    // batch 3: jump event time far past retention so the watermark
    // expires the signature state...
    mem.addData((5L, "unrelated filler advancing the watermark", 500L))
    q.processAllAvailable()
    // ...then the same text starts a fresh group: doc 6 is its own original
    mem.addData((6L, "the quick brown fox jumps", 510L))
    q.processAllAvailable()
    q.stop()
    assert(verdicts()(6L) == (6L, 0L))
  }

  test("windowed ingest stats: per-(window, source) counts finalize on watermark, state stays bounded") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, String, Long)]
    val docs = mem.toDF().toDF("doc_id", "text", "source", "sec")
      .select(col("doc_id"), col("text"), col("source"),
        length(col("text")).cast("long").as("n_chars"),
        timestamp_seconds(col("sec")).as("ts"))
    val q = graft.streaming.StreamingCurate
      .statsStream(docs, "ts", "1 minute", minQuality = 0.0,
        watermark = "10 seconds")
      .writeStream.format("memory").queryName("ingest_stats")
      .outputMode("append").start()
    // window [60,120): two srcA docs + one srcB doc; then advance the
    // watermark far past it so the window finalizes and emits
    mem.addData((1L, "alpha beta gamma delta", "srcA", 70L),
      (2L, "epsilon zeta", "srcA", 80L),
      (3L, "unique words entirely here", "srcB", 90L))
    q.processAllAvailable()
    mem.addData((4L, "watermark mover", "srcA", 600L))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("ingest_stats").collect()
      .map(r => (r.getAs[java.sql.Timestamp]("win_start").toInstant.getEpochSecond,
        r.getAs[String]("source")) ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
          r.getAs[Double]("gate_pass_rate"))).toMap
    // only the finalized [60,120) window is emitted (append mode); the
    // 600s window is still open
    assert(rows.keySet == Set((60L, "srcA"), (60L, "srcB")))
    assert(rows((60L, "srcA")) == ((2L, 6L, 1.0)))
    assert(rows((60L, "srcB")) == ((1L, 4L, 1.0)))
  }

  test("drift leg: a spam wave tops its window's movers with exact scaled deltas") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Long)]
    val docs = mem.toDF().toDF("doc_id", "text", "sec")
      .select(col("doc_id"), col("text"),
        timestamp_seconds(col("sec")).as("ts"))
    // historical baseline: alpha and beta each half the mass (tot 10)
    val baseline = Seq(("alpha", 5L), ("beta", 5L)).toDF("w", "cnt")
    val out = Files.createTempDirectory("driftout").toString
    val q = graft.streaming.StreamingCurate.driftStream(
      docs, baseline, "ts", "1 minute", out,
      Files.createTempDirectory("driftck").toString,
      watermark = "10 seconds", topK = 10)
    // window [60,120): 2×alpha + 3×spamtoken (tot 5); then advance the
    // watermark far past it so the window finalizes
    mem.addData((1L, "alpha spamtoken spamtoken", 70L),
      (2L, "alpha spamtoken", 80L))
    q.processAllAvailable()
    mem.addData((3L, "watermark mover", 600L))
    q.processAllAvailable()
    q.stop()
    val rows = spark.read.parquet(out).collect()
      .map(r => (r.getAs[java.sql.Timestamp]("win_start").toInstant.getEpochSecond,
        r.getAs[String]("w")) ->
        (r.getAs[Long]("cnt"), r.getAs[Long]("cnt_base"), r.getAs[Long]("dp_scaled")))
      .toMap
    // only the finalized [60,120) window reports; the 600s window is
    // open. beta VANISHED from the feed (baseline mass, zero arrivals)
    // and must surface in the report — the round-15 reconciliation leg
    assert(rows.keySet ==
      Set((60L, "alpha"), (60L, "spamtoken"), (60L, "beta")))
    // spamtoken: 3/5 arriving vs 0 baseline -> +600000000
    assert(rows((60L, "spamtoken")) == ((3L, 0L, 600000000L)))
    // alpha: 2/5 arriving vs 5/10 baseline -> 400000000 - 500000000
    assert(rows((60L, "alpha")) == ((2L, 5L, -100000000L)))
    // beta: 0/5 arriving vs 5/10 baseline -> the negated baseline share
    assert(rows((60L, "beta")) == ((0L, 5L, -500000000L)))
  }

  test("stream-static incremental dedup verdicts micro-batches against the persisted index") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    graft.operators.Dedup.writeBandIndex(Seq(
        (1L, "the quick brown fox jumps over the lazy dog today"),
        (2L, "completely unrelated indexed content about spark plans"))
      .toDF("doc_id", "text"), "band_idx_stream", 4)
    val mem = MemoryStream[(Long, String)]
    val out = Files.createTempDirectory("ivout").toString
    val q = graft.streaming.StreamingDedup.indexVerdictStream(
      mem.toDF().toDF("doc_id", "text"), spark.table("band_idx_stream"),
      out, Files.createTempDirectory("ivck").toString)
    mem.addData(
      (9L, "the quick brown fox jumps over the lazy dog tonight"),
      (10L, "novel content with no index overlap at all"))
    q.processAllAvailable()
    mem.addData((14L, "the quick brown fox jumps over the lazy dog toward")) // second batch
    q.processAllAvailable()
    q.stop()
    val r = spark.read.parquet(out).collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[Long]("dup_of")).toMap
    assert(r.get(9L).contains(1L))  // flagged against the historical corpus
    assert(r.get(14L).contains(1L)) // later micro-batch, same index
    assert(!r.contains(10L))        // novel doc passes
  }

  test("stream-static semantic dedup verdicts paraphrases against earlier-batch survivors") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = 8
    def axis(i: Int, scale: Float) = {
      val a = Array.fill(dim)(0.01f); a(i) = scale; a
    }
    // static embeddings for every doc that may arrive; centroids are two
    // fixed axis vectors (cids 1000/1001)
    val embeddings = Seq(
      (1L, axis(0, 0.9f)), (2L, axis(1, 0.9f)),
      (20L, axis(0, 0.85f)),           // near-identical to indexed doc 1
      (21L, axis(2, 0.9f)),            // novel direction: a new survivor
      (30L, axis(2, 0.88f)),           // paraphrase of 21, arrives later
      (31L, axis(3, 0.9f)))            // novel again
      .toDF("vec_id", "embedding")
    val centroids = Similarity.asCentroids(
      Seq((1000L, axis(0, 1.0f)), (1001L, axis(1, 1.0f)))
        .toDF("vec_id", "embedding"))
    // seed the survivor index with the historical corpus (docs 1 and 2)
    Similarity.writeCellIndex(
      embeddings.filter(col("vec_id") <= 2L), centroids, "cell_idx_stream", 4)
    val mem = MemoryStream[(Long, String)]
    val out = Files.createTempDirectory("semvout").toString
    val q = graft.streaming.StreamingCurate.semanticVerdictStream(
      mem.toDF().toDF("doc_id", "text"), embeddings, centroids,
      "cell_idx_stream", out, Files.createTempDirectory("semvck").toString,
      threshold = 0.8, buckets = 4)
    // batch 1: 20 dups against the seeded index; 21 survives and is
    // APPENDED to the index
    mem.addData((20L, "ignored"), (21L, "ignored"))
    q.processAllAvailable()
    // batch 2: 30 is a paraphrase of batch-1 survivor 21 — the index
    // remembered it with no state store; 31 is novel
    mem.addData((30L, "ignored"), (31L, "ignored"))
    q.processAllAvailable()
    // this leg keeps NO streaming state: cross-batch memory is the table
    assert(q.lastProgress.stateOperators.isEmpty,
      "semantic leg must not grow a state store")
    q.stop()
    val r = spark.read.parquet(out).collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[Long]("dup_of")).toMap
    assert(r.get(20L).contains(1L))   // historical-corpus duplicate
    assert(r.get(30L).contains(21L))  // batch-2 paraphrase vs batch-1 survivor
    assert(!r.contains(21L) && !r.contains(31L)) // survivors pass
    // and the index grew by exactly the survivors
    val idx = spark.table("cell_idx_stream").select("idx_id")
      .collect().map(_.getLong(0)).toSet
    assert(idx == Set(1L, 2L, 21L, 31L))
  }

  test("hashed semantic leg dedups a re-arriving text with no embedding table at all") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    implicit val sqlCtx = spark.sqlContext
    // historical corpus: two docs with disjoint vocabularies; centroids
    // = their own hash embeddings (each doc anchors a cell), index
    // seeded from the same frame — everything lives in the q95 space
    val hist = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight nine"))
      .toDF("doc_id", "text")
    val histEmb = TextAnalysis.hashEmbedDense(hist)
    val centroids = Similarity.asCentroids(histEmb)
    Similarity.writeCellIndex(histEmb, centroids, "hash_cell_idx", 4)
    val mem = MemoryStream[(Long, String)]
    val out = Files.createTempDirectory("hsemout").toString
    val q = graft.streaming.StreamingCurate.hashedSemanticVerdictStream(
      mem.toDF().toDF("doc_id", "text"), centroids, "hash_cell_idx", out,
      Files.createTempDirectory("hsemck").toString,
      threshold = 0.95, buckets = 4)
    // batch 1: doc 10 is doc 1's text verbatim (cosine ~1 in hash
    // space); doc 11 is novel vocabulary and survives into the index
    mem.addData((10L, "alpha beta gamma delta epsilon zeta eta theta"),
      (11L, "red orange yellow green blue indigo violet amber"))
    q.processAllAvailable()
    // batch 2: doc 20 re-sends batch-1 survivor 11's text — the index
    // remembered it, still with zero model embeddings anywhere
    mem.addData((20L, "red orange yellow green blue indigo violet amber"))
    q.processAllAvailable()
    q.stop()
    val r = spark.read.parquet(out).collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[Long]("dup_of")).toMap
    assert(r.get(10L).contains(1L), s"verbatim re-arrival must dup: $r")
    assert(r.get(20L).contains(11L), s"batch-2 vs batch-1 survivor: $r")
    assert(!r.contains(11L))
  }

  test("stream-static decontamination verdicts test arrivals against a growing train-gram index") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // hash-split facts (md5 of doc_id): 1,2 train; 3,44,49,64 test
    def words(p: String) = (1 to 8).map(i => s"$p$i").mkString(" ")
    val (g, h, c) = (words("g"), words("h"), words("c"))
    // seed: historical train corpus = doc 1 carrying gram G
    graft.operators.TrainingData.writeGramIndex(
      Seq((1L, g)).toDF("doc_id", "text"), "gram_idx_stream", 4)
    val mem = MemoryStream[(Long, String)]
    val out = Files.createTempDirectory("dcvout").toString
    val q = graft.streaming.StreamingCurate.decontamVerdictStream(
      mem.toDF().toDF("doc_id", "text"), "gram_idx_stream", out,
      Files.createTempDirectory("dcvck").toString, buckets = 4)
    // batch 1: test doc 3 leaks G (flagged), test doc 44 is clean,
    // train doc 2 arrives carrying NEW gram H (appended to the index)
    mem.addData((3L, g), (44L, c), (2L, h))
    q.processAllAvailable()
    // batch 2: test doc 49 leaks H — known only from batch 1's train
    // arrival; test doc 64 leaks the seeded G
    mem.addData((49L, h), (64L, g))
    q.processAllAvailable()
    assert(q.lastProgress.stateOperators.isEmpty,
      "decontamination leg must not grow a state store")
    q.stop()
    val r = spark.read.parquet(out).collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[Long]("n_shared_grams")).toMap
    assert(r == Map(3L -> 1L, 49L -> 1L, 64L -> 1L)) // 44 clean, 2 is train
    // the index grew by exactly doc 2's fresh gram
    assert(spark.table("gram_idx_stream").count() == 2L)
  }

  test("stream-static URL dedup verdicts arrivals against a growing canonical-URL index") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // seed: the frontier has already fetched page /p/1 (via a messy
    // spelling — the index stores the CANONICAL form)
    graft.operators.DomainCuration.writeUrlIndex(
      Seq((1L, "http://www.ex.com/p/1?utm_source=a")).toDF("doc_id", "url"),
      "url_idx_stream", 4)
    val mem = MemoryStream[(Long, String)]
    val out = Files.createTempDirectory("urlvout").toString
    val q = graft.streaming.StreamingCurate.urlVerdictStream(
      mem.toDF().toDF("doc_id", "url"), "url_idx_stream", out,
      Files.createTempDirectory("urlvck").toString, buckets = 4)
    // batch 1: doc 10 respells the seeded page (dup of 1); docs 11/12
    // are the SAME new page within one batch (12 dups 11); doc 13 new
    mem.addData(
      (10L, "https://ex.com/p/1#frag"),
      (11L, "https://ex.com/p/2"),
      (12L, "http://WWW.EX.com/p/2/"),
      (13L, "https://ex.com/p/3?id=7&utm_campaign=x"))
    q.processAllAvailable()
    // batch 2: doc 20 hits batch 1's new page — known only from the
    // appended index; doc 21 re-sends the semantic-param page
    mem.addData((20L, "http://ex.com/p/2"), (21L, "https://ex.com/p/3?id=7"))
    q.processAllAvailable()
    assert(q.lastProgress.stateOperators.isEmpty,
      "URL-dedup leg must not grow a state store")
    q.stop()
    val r = spark.read.parquet(out).collect()
      .map(x => x.getAs[Long]("doc_id") -> Option(x.getAs[java.lang.Long]("dup_of"))).toMap
    assert(r(10L).contains(1L), s"respelled seeded page must dup: $r")
    assert(r(11L).isEmpty && r(12L).contains(11L), s"within-batch dup: $r")
    assert(r(13L).isEmpty)
    assert(r(20L).contains(11L), s"batch-2 vs batch-1 first sighting: $r")
    assert(r(21L).contains(13L), s"semantic-param page remembered: $r")
    // index grew by exactly the two new canonical pages
    assert(spark.table("url_idx_stream").count() == 3L)
  }

  test("cluster-state stream: micro-batches fold into the SAME persistent map the batch head reads") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.documents(spark, TestSpark.sf0001)
      .select("doc_id", "text")
    val state = Files.createTempDirectory("cs-stream").toString
    val out = Files.createTempDirectory("cs-out").toString
    val mem = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamingDedup.clusterStateStream(
      mem.toDF().toDF("doc_id", "text"), state, out,
      Files.createTempDirectory("cs-ck").toString)
    // feed the corpus as three snapshots growing by doc_id % 10
    def part(p: Long => Boolean): Seq[(Long, String)] = docs.collect()
      .map(r => (r.getLong(0), r.getString(1))).filter(x => p(x._1 % 10)).toSeq
    mem.addData(part(_ < 8): _*)
    q.processAllAvailable()
    mem.addData(part(_ == 8): _*)
    q.processAllAvailable()
    // at-least-once: batch 2 redelivered alongside the final batch
    mem.addData((part(_ == 8) ++ part(_ == 9)): _*)
    q.processAllAvailable()
    assert(q.lastProgress.stateOperators.isEmpty,
      "cluster-state leg must not grow a state store")
    q.stop()
    // the stored map equals the from-scratch re-cluster of everything
    // that arrived — the same identity the batch Curate head pins
    val stored = graft.operators.Dedup.readClusterState(spark, state)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val scratch = graft.operators.Dedup.dupClusters(
        graft.operators.Dedup.candidatePairsOf(docs))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(stored == scratch,
      "streamed cluster state diverged from the from-scratch re-cluster")
  }

  test("URL dedup: a redelivered first sighting never forms a mutual dup_of cycle") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // index records doc 5 as the page's first sighting
    graft.operators.DomainCuration.writeUrlIndex(
      Seq((5L, "https://cyc.com/p/1")).toDF("doc_id", "url"),
      "url_idx_cycle", 4)
    val mem = MemoryStream[(Long, String)]
    val out = Files.createTempDirectory("urlcout").toString
    val q = graft.streaming.StreamingCurate.urlVerdictStream(
      mem.toDF().toDF("doc_id", "url"), "url_idx_cycle", out,
      Files.createTempDirectory("urlcck").toString, buckets = 4)
    // at-least-once redelivery: the indexed first sighting (doc 5)
    // arrives AGAIN, alongside a LOWER-id copy of the same page. The
    // old coalesce gave 5 dup_of=3 (batch rep) and 3 dup_of=5 — a
    // cycle where dropping dup_of-non-null rows loses every copy. The
    // index must rule: 5 stays canonical, 3 dups onto 5.
    mem.addData((5L, "https://cyc.com/p/1"), (3L, "http://www.cyc.com/p/1/"))
    q.processAllAvailable()
    q.stop()
    val r = spark.read.parquet(out).collect()
      .map(x => x.getAs[Long]("doc_id") -> Option(x.getAs[java.lang.Long]("dup_of"))).toMap
    assert(r(5L).isEmpty, s"redelivered first sighting must stay canonical: $r")
    assert(r(3L).contains(5L), s"lower-id copy must dup onto the INDEXED rep: $r")
    // and the index did not grow a second entry for the page
    assert(spark.table("url_idx_cycle").count() == 1L)
  }

  test("stream-static span excision cleans leaked spans in flight, stateless and replay-idempotent") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val leak = (1 to 8).map(i => s"b$i").mkString(" ")
    val bench = Seq((900L, s"pre $leak post")).toDF("doc_id", "text")
    val mem = MemoryStream[(Long, String)]
    val out = Files.createTempDirectory("excout").toString
    val q = graft.streaming.StreamingCurate.exciseStream(
      mem.toDF().toDF("doc_id", "text"), bench, out,
      Files.createTempDirectory("excck").toString)
    mem.addData((1L, s"t1 t2 $leak t11"), (2L, "all clean words here"))
    q.processAllAvailable()
    mem.addData((3L, s"$leak")) // whole doc is the leak: fully excised
    q.processAllAvailable()
    assert(q.lastProgress.stateOperators.isEmpty,
      "excision leg must not grow a state store")
    q.stop()
    val r = spark.read.parquet(out).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        ((x.getAs[Long]("n_removed"), x.getAs[String]("clean_text")))).toMap
    assert(r(1L) == ((8L, "t1 t2 t11")))
    assert(r(2L) == ((0L, "all clean words here")))
    assert(r(3L) == ((8L, "")))
    // every arriving doc is accounted for, across batches
    assert(r.keySet == Set(1L, 2L, 3L))
  }

  test("JS2: to_json sink round-trips through from_json losslessly") {
    import spark.implicits._
    val events = Seq(
      ("M1", "create", 1.5, "Token1", "T1"),
      ("M2", "buy", 2.0, "Token2", "T2"),
      ("M3", "sell", 0.0, "", "T3"))
      .toDF("mint", "txType", "solAmount", "name", "symbol")
    val outDir = Files.createTempDirectory("js2").toString
    // encode: one JSON document per row (the reference's json.dumps
    // sites, my_websocket.py:40,85,121), written as a text sink
    events.select(to_json(struct(events.columns.map(col): _*)).as("value"))
      .write.mode("overwrite").text(outDir)
    val back = spark.read.schema(graft.sources.Schemas.rawEvent).json(outDir)
      .select("mint", "txType", "solAmount", "name", "symbol")
    assert(back.count() == 3)
    assert(back.exceptAll(events).isEmpty && events.exceptAll(back).isEmpty)
  }

  test("streaming curation: quality-gates, redacts PII, and drops near-dups in flight") {
    val work = Files.createTempDirectory("scur").toString
    val goodText = "spark plans broadcast joins across partitioned parquet scans contact admin@example.com"
    graft.sources.FeedRegistry.clear("wscur")
    graft.sources.FeedRegistry.post("wscur",
      s"""{"doc_id":1,"text":"$goodText","lang":"en","source":"s"}""",
      s"""{"doc_id":2,"text":"$goodText","lang":"en","source":"s"}""", // near-dup of 1
      """{"doc_id":3,"text":"the the the of of and and a a to to in","lang":"en","source":"s"}""", // low quality
      """{"doc_id":4,"text":"columnar executors fuse vectorized operators into pipelined stages","lang":"en","source":"s"}""")
    val out = graft.streaming.StreamingCurate.runFromFeed(
      spark, "wscur", work, minQuality = 50.0)
    val byId = out.collect().map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    // doc 2 fell to the dedup leg, doc 3 to the quality gate
    assert(byId.keySet == Set(1L, 4L))
    // the survivor's email is redacted; PII-free text is untouched
    assert(byId(1L).endsWith("contact <EMAIL>") && !byId(1L).contains("@"))
    assert(byId(4L).startsWith("columnar executors"))
    // quality scores ride along for downstream percentile audits
    assert(out.columns.contains("quality"))
  }

  test("composition: ALL streaming legs run concurrently over one feed in one session") {
    import spark.implicits._
    import graft.operators.{Similarity, TextAnalysis, TrainingData}
    // historical corpus seeds both stream-static indexes + centroids
    val histDoc = "alpha beta gamma delta epsilon zeta eta theta"
    val hist = Seq((1L, histDoc)).toDF("doc_id", "text")
    val histEmb = TextAnalysis.hashEmbedDense(hist)
    val centroids = Similarity.asCentroids(histEmb)
    Similarity.writeCellIndex(histEmb, centroids, "all_legs_cell_idx", 4)
    TrainingData.writeGramIndex(hist, "all_legs_gram_idx", 4)
    graft.operators.DomainCuration.writeUrlIndex(
      hist.select(col("doc_id"),
        graft.operators.DomainCuration.messyUrl(col("doc_id")).as("url")),
      "all_legs_url_idx", 4)
    val work = Files.createTempDirectory("allegs").toString
    val good = "spark plans broadcast joins across partitioned parquet scans"
    graft.sources.FeedRegistry.clear("wsall")
    graft.sources.FeedRegistry.post("wsall",
      s"""{"doc_id":10,"text":"$good","lang":"en","source":"sA"}""",
      s"""{"doc_id":11,"text":"$good","lang":"en","source":"sA"}""", // near-dup of 10
      s"""{"doc_id":12,"text":"$histDoc","lang":"en","source":"sB"}""", // semantic dup of seed 1
      """{"doc_id":13,"text":"the the the of of and and a a to to in","lang":"en","source":"sB"}""", // low quality
      """{nope""") // malformed: dead-letter only
    val rep = graft.streaming.StreamingCurate.runAllLegs(
      spark, "wsall", work, minQuality = 50.0,
      centroids, "all_legs_cell_idx", "all_legs_gram_idx",
      urlIndexTable = Some("all_legs_url_idx"))
    // curation + near-dup assembly: 11 fell to dedup, 13 to quality,
    // malformed never enters the doc legs
    val curated = spark.read.parquet(s"$work/curated")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(curated.contains(10L) && !curated.contains(11L) &&
      !curated.contains(13L), s"curated=$curated")
    // semantic leg: 12 verdicted against the seeded survivor 1
    val sem = spark.read.parquet(s"$work/sem_verdicts").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("dup_of")).toMap
    assert(sem.get(12L).contains(1L), s"sem=$sem")
    // dead-letter: exactly the malformed payload quarantined, the four
    // parseable ones delivered
    assert(rep.counts("quarantined") == 1L, rep.counts.toString)
    assert(rep.counts("delivered") == 4L, rep.counts.toString)
    // stats leg emitted nothing yet (windows still open — append mode);
    // the near-dup leg is the only one holding state
    assert(rep.dedupStateRows > 0L, "dedup leg must hold watermarked state")
    // decontam: doc splits are md5(doc_id)-derived; just assert the leg
    // ran and produced a readable (possibly empty) verdict set
    assert(rep.counts.contains("dc_verdicts"))
    // URL leg: one verdict row per parseable arrival (the messy-url
    // fixture derives spellings from doc_id, so dup hits depend on the
    // seeded ids — presence and volume are the wiring pin here; the
    // dedicated URL-leg test pins the verdict semantics)
    assert(rep.counts("url_verdicts") == 4L, rep.counts.toString)
    assert(rep.wallSec > 0)
  }

  test("failure injection: killed mid-feed, uncommitted batches replay and every leg reconciles exactly-once") {
    // The crash the batch_id-overwrite discipline exists for: the
    // foreachBatch sink WROTE its batch but the checkpoint commit never
    // landed. Simulated faithfully — run the soak, then delete the
    // LATEST commit file from the dead-letter and semantic legs'
    // checkpoints (data written, commit lost), post more feed traffic
    // while the session is "down", and resume into the same workDir.
    // The deleted-commit batches replay; reconciliation must show no
    // double-delivery anywhere.
    import spark.implicits._
    import graft.operators.{Similarity, TextAnalysis, TrainingData}
    val histDoc = "alpha beta gamma delta epsilon zeta eta theta"
    val hist = Seq((1L, histDoc)).toDF("doc_id", "text")
    val histEmb = TextAnalysis.hashEmbedDense(hist)
    val centroids = Similarity.asCentroids(histEmb)
    Similarity.writeCellIndex(histEmb, centroids, "restart_cell_idx", 4)
    TrainingData.writeGramIndex(hist, "restart_gram_idx", 4)
    val work = Files.createTempDirectory("restartsoak").toString
    val good = "spark plans broadcast joins across partitioned parquet scans"
    val good2 = "columnar executors fuse vectorized operators into pipelined stages"
    graft.sources.FeedRegistry.clear("wsrst")
    graft.sources.FeedRegistry.post("wsrst",
      s"""{"doc_id":10,"text":"$good","lang":"en","source":"sA"}""",
      s"""{"doc_id":12,"text":"$histDoc","lang":"en","source":"sB"}""", // semantic dup of seed 1
      """{nope""") // malformed: quarantine
    graft.streaming.StreamingCurate.runAllLegs(
      spark, "wsrst", work, minQuality = 50.0,
      centroids, "restart_cell_idx", "restart_gram_idx")
    // crash injection: batch written, commit lost — the at-least-once
    // window a real executor/driver death opens
    def uncommit(ck: String): Unit = {
      val dir = new java.io.File(s"$work/$ck/commits")
      val latest = Option(dir.listFiles()).get
        .filter(_.getName.forall(_.isDigit)).maxBy(_.getName.toLong)
      assert(latest.delete(), s"could not delete $latest")
      // the local FS keeps a checksum sibling; left behind, the commit
      // rewrite on recovery fails as a phantom concurrent writer
      val crc = new java.io.File(dir, s".${latest.getName}.crc")
      if (crc.exists()) { crc.delete(); () }
    }
    // the kill: wait out the stopped legs' async deregistration so the
    // "restarted session" does not race the dying one (stop() returns
    // before the checkpoint registry entry is released)
    val deadline = System.currentTimeMillis() + 30000
    while (spark.streams.active.nonEmpty && System.currentTimeMillis() < deadline)
      Thread.sleep(100)
    assert(spark.streams.active.isEmpty, "legs did not stop in 30s")
    uncommit("ckpt_dl")
    uncommit("ckpt_sem")
    // traffic that arrived while the session was down (64 is a
    // test-split doc — the md5 hash-split facts from the decontam leg
    // test — and it leaks the seeded train gram AND is a semantic twin
    // of seed 1, so it exercises the dc and sem legs post-restart)
    graft.sources.FeedRegistry.post("wsrst",
      s"""{"doc_id":20,"text":"$good2","lang":"en","source":"sA"}""",
      s"""{"doc_id":11,"text":"$good","lang":"en","source":"sA"}""", // near-dup of 10
      s"""{"doc_id":64,"text":"$histDoc","lang":"en","source":"sB"}""",
      """not json at all""") // malformed: quarantine
    val rep = graft.streaming.StreamingCurate.runAllLegs(
      spark, "wsrst", work, minQuality = 50.0,
      centroids, "restart_cell_idx", "restart_gram_idx")
    // dead-letter leg: the replayed batch overwrote its own batch_id
    // partition — every parseable payload delivered EXACTLY once,
    // every malformed payload quarantined exactly once
    val delivered = spark.read.parquet(s"$work/delivered")
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(delivered.sorted == Seq(10L, 11L, 12L, 20L, 64L),
      s"delivered must be exactly-once: $delivered")
    assert(rep.counts("quarantined") == 2L, rep.counts.toString)
    // semantic leg: replayed verdicts rewrote their partition, not
    // appended — one verdict row per verdicted doc, correct dup_of
    val sem = spark.read.parquet(s"$work/sem_verdicts").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("dup_of"))
    assert(sem.length == sem.distinct.length && sem.map(_._1).distinct.length == sem.length,
      s"semantic verdicts double-delivered: ${sem.toSeq}")
    val semMap = sem.toMap
    assert(semMap.get(12L).contains(1L), s"sem=$semMap")  // vs seeded survivor
    assert(semMap.get(11L).contains(10L), s"sem=$semMap") // vs batch-1 survivor
    assert(semMap.get(64L).contains(1L), s"sem=$semMap")  // post-restart arrival
    // the survivor index tolerates the replay by SEMANTICS, not by
    // uniqueness: the replayed batch may re-append identical survivor
    // rows (argmax consumers are duplicate-insensitive) but never a
    // new identity
    val idx = spark.table("restart_cell_idx").select("idx_id")
      .collect().map(_.getLong(0)).toSet
    assert(idx == Set(1L, 10L, 20L), s"index identities drifted: $idx")
    // exactly-once legs (streaming parquet sinks commit via their
    // manifest): near-dup verdicts and curated docs carry no dup rows
    val dup = spark.read.parquet(s"$work/verdicts").select("doc_id")
      .collect().map(_.getLong(0)).toSeq
    assert(dup.sorted == dup.distinct.sorted, s"dup verdicts duplicated: $dup")
    val curated = spark.read.parquet(s"$work/curated")
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(curated.length == curated.distinct.length, s"curated duplicated: $curated")
    assert(curated.contains(10L) && !curated.contains(11L), s"curated=$curated")
    // decontam leg: replay-safe by the same overwrite discipline, and
    // the post-restart test-split arrival is verdicted against the
    // seeded train gram exactly once
    val dc = spark.read.parquet(s"$work/dc_verdicts").select("doc_id")
      .collect().map(_.getLong(0)).toSeq
    assert(dc.sorted == dc.distinct.sorted, s"dc verdicts duplicated: $dc")
    assert(dc.contains(64L), s"dc=$dc")
  }

  test("streaming gate verdicts match the batch ensemble's row-local legs on a replayed corpus") {
    // drift check between the two production gates: StreamingCurate
    // applies the row-local quality kernel with an OFFLINE threshold,
    // the batch ensemble applies the same kernel inside its fused
    // multi-leg plan. Replaying the whole sf0.001 corpus through the
    // streaming path must keep EXACTLY the docs the ensemble's quality
    // leg keeps, with bit-identical scores — any divergence means the
    // fused plan and the streaming projection no longer share one
    // kernel. Threshold = the corpus median, so the gate genuinely
    // discriminates (~half each side).
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.Tables.documents(spark, TestSpark.sf0001)
      .select("doc_id", "text", "lang", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    val ensAll = graft.operators.TextAnalysis
      .qualityEnsemble(graft.Tables.documents(spark, TestSpark.sf0001),
        0.0, 1.0, 1.0, 0.0)
      .select("doc_id", "quality", "dup_frac").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Double]("quality"), r.getAs[Double]("dup_frac")))).toMap
    // thresholds at the corpus median quality and p75 dup_frac
    val theta = ensAll.values.map(_._1).toSeq.sorted.apply(ensAll.size / 2)
    val delta = ensAll.values.map(_._2).toSeq.sorted.apply(ensAll.size * 3 / 4)
    // ground truth: the ensemble's OWN keep verdict with only its two
    // row-local legs armed (corpus legs wide open)
    val batchKept = graft.operators.TextAnalysis
      .qualityEnsemble(graft.Tables.documents(spark, TestSpark.sf0001),
        theta, delta, 1.0, 0.0)
      .collect().filter(_.getAs[Boolean]("keep"))
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Double]("quality"), r.getAs[Double]("dup_frac")))).toMap
    val mem = MemoryStream[(Long, String, String, String, Long)]
    mem.addData(docs.toIndexedSeq: _*)
    val q = graft.streaming.StreamingCurate.curate(
        mem.toDF.toDF("doc_id", "text", "lang", "source", "n_chars"),
        theta, delta)
      .writeStream.format("memory").queryName("gate_drift").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("gate_drift").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Double]("quality"), r.getAs[Double]("dup_frac")))).toMap
    assert(streamed.keySet == batchKept.keySet,
      s"streaming gate kept ${streamed.size}, ensemble row-local legs ${batchKept.size}")
    batchKept.foreach { case (id, v) =>
      assert(streamed(id) == v, s"doc $id: streaming ${streamed(id)} vs batch $v")
    }
    assert(streamed.nonEmpty && streamed.size < docs.length,
      "median/p75 thresholds must discriminate")
  }

  test("offline threshold derivation gates the expected fractions, end to end") {
    // the other half of the offline-threshold contract: derive
    // (minQuality, maxDupFrac) from the batch sample in one scan, feed
    // them to the row-local gate, and the kept set must be exactly the
    // docs inside both thresholds — with the kept fraction in the
    // neighborhood the keep-fractions asked for (approx percentiles,
    // discrete score ties -> loose band, exact containment strict)
    val docs = graft.Tables.documents(spark, TestSpark.sf0001)
    val (minQ, maxDup) = graft.streaming.StreamingCurate
      .offlineGateThresholds(docs, keepQualityFrac = 0.5, keepDupFrac = 0.95)
    val kept = graft.streaming.StreamingCurate.curate(docs, minQ, maxDup)
      .select("doc_id", "quality", "dup_frac").collect()
    assert(kept.forall(r => r.getAs[Double]("quality") >= minQ &&
      r.getAs[Double]("dup_frac") <= maxDup))
    val total = docs.count().toDouble
    assert(kept.length / total > 0.3 && kept.length / total < 0.65,
      s"~half by quality x ~95% by dup expected, got ${kept.length}/$total")
    // keep-everything fractions must gate nothing out
    val (qAll, dAll) = graft.streaming.StreamingCurate
      .offlineGateThresholds(docs, keepQualityFrac = 1.0, keepDupFrac = 1.0)
    val all = graft.streaming.StreamingCurate.curate(docs, qAll, dAll).count()
    assert(all == total.toLong, s"keep-all thresholds must pass every doc, got $all")
  }

  test("q81 composes in-flight: unicode normalization runs inside the micro-batch before the gate") {
    // the integration the StreamingCurate scaladoc prescribes: map
    // normalizeText over the stream BEFORE the gate, so signals and
    // any downstream byte-level dedup see canonical bytes. Two
    // visually-identical arrivals (one decomposed + NBSP/ZWSP-ridden,
    // one clean) must leave the micro-batch byte-identical.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, String, String, Long)]
    val dirty = "\u00A0the data row\u200B cafe\u0301 value\u3000"
    val clean = "the data row caf\u00E9 value"
    mem.addData((1L, dirty, "en", "s", 24L), (2L, clean, "en", "s", 23L))
    val normalized = mem.toDF.toDF("doc_id", "text", "lang", "source", "n_chars")
      .withColumn("text", graft.operators.TextAnalysis.normalizeText(col("text")))
    val q = graft.streaming.StreamingCurate
      .curate(normalized, minQuality = -1e9, maxDupFrac = 1.0)
      .writeStream.format("memory").queryName("norm_inflight").start()
    q.processAllAvailable(); q.stop()
    val texts = spark.table("norm_inflight").select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(texts.size == 2, "wide-open gate must pass both docs")
    assert(texts(1L) == clean && texts(2L) == clean,
      "in-flight normalization must make the pair byte-identical")
  }

  test("normalization works on a streamed shape-2 drop dir") {
    val drop = Files.createTempDirectory("drop3").toString
    writeEventFile(drop, "h.json",
      """{"signature":"s1","slot":1,"blockTime":1742601600,"meta":{"fee":5},"transaction":{"message":{"accountKeys":["FP"]}},"tokenTransfers":[{"fromUserAccount":"A","toUserAccount":"B","tokenAmount":1.0,"mint":"M","tokenStandard":"F"}]}""",
      """{"signature":"s2","slot":2,"blockTime":1742601660,"meta":{"fee":5},"transaction":{"message":{"accountKeys":[]}},"tokenTransfers":[]}""")
    val q = StreamingIngest.normalizeShape2Stream(spark, drop)
      .writeStream.format("memory").queryName("norm_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val rows = spark.table("norm_out")
    assert(rows.count() == 2) // F1: empty transfers row preserved
    assert(rows.filter(col("signature") === "s2").count() == 1)
  }
}
