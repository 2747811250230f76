package graft

import graft.tools.ScaleUp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The fixture scale-up must preserve workload structure, not just row
  * counts: intra-replica joins match, replicas never cross-join, and
  * document replicas are near- (not byte-) identical.
  */
class ScaleUpSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("factor-2 scale-up doubles facts, keeps dims, preserves join integrity") {
    val dst = java.nio.file.Files.createTempDirectory("sf2x").toString
    ScaleUp.run(spark, TestSpark.sf0001, dst, factor = 2)
    def cnt(src: String, t: String): Long = spark.read.parquet(s"$src/$t.parquet").count()
    assert(cnt(dst, "lineitem") == 2 * cnt(TestSpark.sf0001, "lineitem"))
    assert(cnt(dst, "documents") == 2 * cnt(TestSpark.sf0001, "documents"))
    assert(cnt(dst, "region") == cnt(TestSpark.sf0001, "region")) // dims verbatim
    // every lineitem still matches exactly one order (no orphans, no
    // cross-replica fan-out)
    val li = spark.read.parquet(s"$dst/lineitem.parquet")
    val o = spark.read.parquet(s"$dst/orders.parquet")
    assert(li.join(o, li("l_orderkey") === o("o_orderkey")).count() == li.count())
    // replica documents are near-dups of their originals, not exact dups
    val docs = spark.read.parquet(s"$dst/documents.parquet")
    val base = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val d0 = base.filter(col("doc_id") === 0).select("text").collect().head.getString(0)
    val d0r = docs.filter(col("doc_id") === 100000000L).select("text")
      .collect().head.getString(0)
    assert(d0r == s"r1 $d0") // prefixed, so shingle sets overlap but differ
    // n_chars recomputed to match the perturbed text
    assert(docs.filter(col("doc_id") === 100000000L).select("n_chars")
      .collect().head.getLong(0) == d0r.length.toLong)
  }

  test("ScaleUp composes: scaling its own output keeps keys unique (the sf10 stride bug)") {
    // a FIXED 1e8 stride applied to ScaleUp's own output collided keys
    // ((r1 + r2)·stride + k): a real sf1×10 build carried 500k document
    // rows over 95k distinct doc_ids — a corpus violating the q89
    // unique-key contract, caught round 13 when q96's oracle comparison
    // hash-failed at exactly the 500k/95k ratio. The stride is now
    // computed above every source key, so composition must preserve
    // uniqueness at every level.
    val lvl1 = java.nio.file.Files.createTempDirectory("sfc1").toString
    val lvl2 = java.nio.file.Files.createTempDirectory("sfc2").toString
    ScaleUp.run(spark, TestSpark.sf0001, lvl1, factor = 3)
    ScaleUp.run(spark, lvl1, lvl2, factor = 3)
    def uniq(t: String, k: String): Unit = {
      val df = spark.read.parquet(s"$lvl2/$t.parquet")
      assert(df.count() == df.select(k).distinct().count(),
        s"composed scale-up collided $t.$k")
    }
    uniq("documents", "doc_id")
    uniq("embeddings", "vec_id")
    uniq("events", "event_id")
    uniq("customer", "c_custkey")
    // and the doc↔embedding key correspondence survives composition
    val d = spark.read.parquet(s"$lvl2/documents.parquet").select(col("doc_id"))
    val e = spark.read.parquet(s"$lvl2/embeddings.parquet")
      .select(col("vec_id").as("doc_id"))
    assert(d.join(e, Seq("doc_id"), "left_semi").count() == d.count())
  }
}
