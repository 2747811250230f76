package graft

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
