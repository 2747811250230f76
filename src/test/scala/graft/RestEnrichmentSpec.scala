package graft

import graft.sources.RestEnrichment
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.util.concurrent.atomic.AtomicInteger

/** Serializable stub transport; counts calls in-JVM (local mode). */
object StubTransport {
  val calls = new AtomicInteger(0)
  def reset(): Unit = calls.set(0)
  val lookup: RestEnrichment.Lookup = { key =>
    calls.incrementAndGet()
    if (key.endsWith("404")) None else Some(s"name-of-$key")
  }
}

/** Staged lookup enrichment: dedup before fetch, throttling, fallback. */
class RestEnrichmentSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  import StubTransport.{lookup => stubLookup}
  private def Counter = StubTransport

  test("each distinct key is fetched exactly once; misses fall back") {
    Counter.reset()
    val df = Seq("m1", "m2", "m1", "m1", "m404", "m2")
      .toDF("mint").withColumn("amount", lit(1.0))
    val staged = RestEnrichment.stageLookups(df, "mint", stubLookup,
      maxRequestsPerSec = 1000)
    val out = RestEnrichment.enrich(df, "mint", staged, "token_name", "Unknown")
    val names = out.select("mint", "token_name").distinct().collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(names == Map(
      "m1" -> "name-of-m1", "m2" -> "name-of-m2", "m404" -> "Unknown"))
    assert(Counter.calls.get() == 3, "one lookup per distinct key")
    assert(out.count() == 6)
  }

  test("rate limiter spaces calls within a partition") {
    Counter.reset()
    val keys = (1 to 6).map(k => s"k$k").toDF("mint")
    val t0 = System.nanoTime()
    // 1 partition, 10 req/s → 6 calls need >= ~500ms
    RestEnrichment.stageLookups(keys, "mint", stubLookup,
      maxRequestsPerSec = 10, fetchPartitions = 1).count()
    val elapsedMs = (System.nanoTime() - t0) / 1000000L
    assert(Counter.calls.get() == 6)
    assert(elapsedMs >= 450, s"expected throttling, took ${elapsedMs}ms")
  }
}
