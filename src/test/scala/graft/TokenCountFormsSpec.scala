package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Differential pins for the round-13 `*FromCounts` kernel pairs: each
  * staged-token entry point must be VALUE-IDENTICAL to its raw-text
  * twin on arbitrary frames, because the registry queries feed the
  * staged form while the DuckDB oracles replay the raw-text semantics —
  * any drift between the two forms is an oracle mismatch waiting for a
  * corpus shape the fixture lacks. The corpus here deliberately plants
  * the shapes the equivalence argument leans on: empty text (split
  * yields [""], so the doc still has a token row), single-word docs,
  * heavy in-doc repetition (cnt > 1 — the raw/pre-aggregate divergence
  * axis), a corpus-universal word, and a doc made only of rare words.
  */
class TokenCountFormsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def docs: DataFrame = {
    import spark.implicits._
    Seq(
      (1L, "the the the data row row", "en"),
      (2L, "", "en"), // empty: one "" token
      (3L, "data", "en"),
      (4L, "zzq xxv yyw unique rare words only here", "de"),
      (5L, "the data the data the data the data", "en"),
      (6L, "spark join window dup the", "fr"),
      (7L, "the quick brown fox jumps over the lazy dog again", "en")
    ).toDF("doc_id", "text", "lang")
      .withColumn("n_chars", length(col("text")).cast("long"))
  }

  private def counts(d: DataFrame): DataFrame =
    d.select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("cnt"))

  private def rowsOf(df: DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("oovRateFromCounts equals oovRate on planted shapes") {
    assert(rowsOf(TextAnalysis.oovRateFromCounts(counts(docs))) ==
      rowsOf(TextAnalysis.oovRate(docs)))
  }

  test("idfHashEmbedFromCounts equals idfHashEmbed (incl. n_docs from distinct doc_ids)") {
    val tc = counts(docs)
    val viaCounts = TextAnalysis.idfHashEmbedFromCounts(tc,
      tc.agg(countDistinct(col("doc_id")).as("n_docs")))
    assert(rowsOf(viaCounts) == rowsOf(TextAnalysis.idfHashEmbed(docs)))
  }

  test("lexicalTopKFromCounts equals lexicalTopK") {
    val terms = Seq("data", "spark", "dog")
    assert(rowsOf(TextAnalysis.lexicalTopKFromCounts(counts(docs), terms, 5)) ==
      rowsOf(TextAnalysis.lexicalTopK(docs, terms, 5)))
  }

  test("bpeApplyFromCounts equals bpeApply") {
    assert(rowsOf(TextAnalysis.bpeApplyFromCounts(counts(docs))) ==
      rowsOf(TextAnalysis.bpeApply(docs)))
  }

  test("qualityFromCountsOf equals withQuality bit-exactly (the q103 supply)") {
    val viaCounts = TextAnalysis.qualityFromCountsOf(
        docs.select(col("doc_id"), col("n_chars")), counts(docs))
      .select(col("doc_id"), col("quality"))
    assert(rowsOf(viaCounts) ==
      rowsOf(TextAnalysis.withQuality(docs).select(col("doc_id"), col("quality"))))
  }

  test("lmBucketsScored over the pre-aggregate equals lmBuckets") {
    val viaCounts = TextAnalysis.lmBucketsScored(docs,
      TextAnalysis.lmFromPerDoc(counts(docs).withColumnRenamed("cnt", "c")))
    assert(rowsOf(viaCounts) == rowsOf(TextAnalysis.lmBuckets(docs)))
  }

  test("staged token counts equal the inline pre-aggregate on the sf0.001 fixture") {
    val staged = TextAnalysis.stagedTokenCounts(spark, TestSpark.sf0001)
    val inline = counts(Tables.documents(spark, TestSpark.sf0001))
    assert(staged.count() == inline.count())
    assert(staged.exceptAll(inline).isEmpty && inline.exceptAll(staged).isEmpty)
  }
}
