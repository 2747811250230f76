package graft

import graft.operators.DomainCuration
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DomainCurationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("domainProfile: blocklist drops whole domains; dup_frac and mean_quality are exact") {
    val docs = Seq(
      // a.com: 2 docs, one dup-involved, qualities 10 and 30
      (1L, "a.com", 10.0, 100L),
      (2L, "a.com", 30.0, 200L),
      // b.org: 1 doc, dup-involved
      (3L, "b.org", 50.0, 300L),
      // blocked.net: must vanish entirely
      (4L, "blocked.net", 99.0, 400L)
    ).toDF("doc_id", "domain", "quality", "n_chars")
    val clusters = Seq((1L, 1L), (3L, 1L)).toDF("doc_id", "cluster_id")
    val bl = Seq("blocked.net").toDF("domain")

    val out = DomainCuration.domainProfile(docs, clusters, bl)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Set("a.com", "b.org"))
    val a = out("a.com")
    assert(a.getString(1) == "com")
    assert(a.getLong(2) == 2L && a.getLong(3) == 1L)
    assert(a.getDouble(4) == 0.5)
    assert(a.getLong(5) == 300L)
    assert(a.getDouble(6) == 20.0)
    val b = out("b.org")
    assert(b.getLong(2) == 1L && b.getLong(3) == 1L && b.getDouble(4) == 1.0)
  }

  test("syntheticUrl/domainOf round-trip: host parses back out and www strips") {
    val row = spark.range(123, 124)
      .select(DomainCuration.domainOf(
        DomainCuration.syntheticUrl(col("id"))).as("dom"))
      .head()
    // 123 % 37 = 12, 123 % 5 = 3 -> tld index 4 = "io"
    assert(row.getString(0) == "site12.io")
  }

  test("the blocklist is deterministic and matches domains the corpus actually produces") {
    assert(DomainCuration.BlockedDomains.size == 25)
    assert(DomainCuration.BlockedDomains.contains("site3.com"))
    assert(DomainCuration.BlockedDomains.forall(_.matches("site\\d+\\.[a-z]+")))
  }
}
