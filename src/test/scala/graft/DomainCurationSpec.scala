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

  test("q114: canonicalization collapses spelling variants, keeps semantic params, never merges pages") {
    val urls = Seq(
      // five spellings of ONE page, all must collapse
      (1L, "http://www.Site1.com/p/9"),
      (2L, "https://site1.com/p/9/"),
      (3L, "https://SITE1.COM/p/9#sec2"),
      (4L, "http://site1.com/p/9?utm_source=s1"),
      (5L, "https://www.site1.com/p/9?utm_campaign=c2&ref=r"),
      // same page WITH a semantic param: a distinct canonical group,
      // tracking stripped but id= kept
      (6L, "https://site1.com/p/9?id=9&utm_source=s3"),
      (7L, "http://site1.com/p/9?id=9"),
      // a different page on the same host stays separate
      (8L, "https://site1.com/p/10")
    ).toDF("doc_id", "url")
    val out = DomainCuration.urlDedupGroups(urls).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out == Map(
      "https://site1.com/p/9" -> ((1L, 5L, 5L)),
      "https://site1.com/p/9?id=9" -> ((6L, 2L, 2L)),
      "https://site1.com/p/10" -> ((8L, 1L, 1L))))
  }

  test("q114 round 15: leading-tracking repair, multi-tracking, default ports, escape case, IDN hosts") {
    def canon(u: String): String =
      Seq(u).toDF("url")
        .select(DomainCuration.canonicalizeUrl(col("url")).as("c"))
        .head().getString(0)
    // a stripped LEADING tracking param must repair '&'→'?' (round-14
    // ADVICE: the page used to split into two canonical groups)
    assert(canon("https://h.com/p?utm_x=1&id=9") == "https://h.com/p?id=9")
    assert(canon("https://h.com/p?id=9&utm_x=1") == "https://h.com/p?id=9")
    // TWO tracking params both strip (the DuckDB twin needs 'g')
    assert(canon("https://h.com/p?utm_campaign=c2&ref=r") == "https://h.com/p")
    assert(canon("https://h.com/p?id=1&utm_source=s&ref=r") == "https://h.com/p?id=1")
    // default ports strip; a real port survives
    assert(canon("https://h.com:443/p") == "https://h.com/p")
    assert(canon("http://h.com:80/p") == "https://h.com/p")
    assert(canon("https://h.com:8443/p") == "https://h.com:8443/p")
    // percent-escape hex case normalizes; malformed escapes untouched
    assert(canon("https://h.com/a%2fb?x=%3d") == "https://h.com/a%2Fb?x=%3D")
    assert(canon("https://h.com/a%2Fb") == "https://h.com/a%2Fb")
    assert(canon("https://h.com/100%a") == "https://h.com/100%a")
    // IDN host folds to punycode (DuckDB can't express this — spec-
    // pinned here; ASCII hosts are untouched so q114 stays hash-green)
    assert(canon("https://bücher.example/x") == "https://xn--bcher-kva.example/x")
    assert(canon("http://www.BÜCHER.example/x/") == "https://xn--bcher-kva.example/x")
    // non-ASCII OUTSIDE the host folds nothing
    assert(canon("https://h.com/päth") == "https://h.com/päth")
    // all the axes at once
    assert(canon("http://www.H.com:80/a%2fb?utm_x=1&id=2&ref=r#frag") ==
      "https://h.com/a%2Fb?id=2")
  }

  test("q114: the messy-url fixture really exercises every variant axis") {
    // over one full period of the spelling moduli, the canonical
    // groups must absorb multiple raw spellings (n_raw > 1 somewhere
    // on every axis-rich page) and group counts must conserve docs
    val out = DomainCuration.urlDedupGroups(
        spark.range(0, 500).select(col("id").as("doc_id"),
          DomainCuration.messyUrl(col("id")).as("url")))
      .collect()
    assert(out.map(_.getLong(2)).sum == 500L)
    assert(out.exists(_.getLong(2) > 1), "no URL-level dup groups formed")
    assert(out.exists(r => r.getLong(3) > 1), "no spelling variance absorbed")
    // canonical forms carry no tracking params, fragments, http scheme,
    // www, default ports, uppercase (outside %XX escape hex, which is
    // canonically UPPER), or trailing slash
    out.map(_.getString(0)).foreach { c =>
      assert(c.startsWith("https://site"), c)
      assert(!c.contains("utm_") && !c.contains("#") && !c.contains("www."), c)
      assert(!c.contains(":80") && !c.contains(":443"), c)
      val noEsc = c.replaceAll("%[0-9A-F]{2}", "")
      assert(!c.endsWith("/") && noEsc == noEsc.toLowerCase, c)
      assert(!c.matches(".*%[0-9a-f]{2}.*"), s"lowercase escape hex survived: $c")
    }
    // the %8=4 leading-tracking shape repaired its separator: every
    // canonical query starts with '?', never a bare '&' after the path
    assert(!out.map(_.getString(0)).exists(_.matches("[^?]*&.*")),
      "a canonical URL kept '&' as its first query separator")
  }
}
