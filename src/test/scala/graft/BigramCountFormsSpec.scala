package graft

import graft.operators.{TextAnalysis, TrainingData}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Differential pins for the round-14 bigram-artifact kernel pairs
  * (the TokenCountFormsSpec discipline applied to the `(doc_id, g, c)`
  * staged bigram pre-aggregate): the registry queries feed the staged
  * form while the DuckDB oracles replay the raw-text semantics, so the
  * two forms must be VALUE-IDENTICAL on arbitrary frames. The corpus
  * plants the shapes the equivalence arguments lean on: docs with
  * fewer than two words (NO bigram rows — the artifact's documented
  * absence contract), repeated bigrams inside one doc (c > 1 — where
  * per-occurrence and weighted-distinct hashing could diverge if the
  * weighting were wrong), a bigram shared across languages (exercises
  * q64's lang re-attachment on the pre-aggregate), and empty text.
  */
class BigramCountFormsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def docs: DataFrame = {
    import spark.implicits._
    Seq(
      (1L, "the data the data the data", "en"),
      (2L, "", "en"), // no bigrams
      (3L, "solo", "en"), // one word: no bigrams
      (4L, "the data pipeline joins the data", "de"),
      (5L, "spark window join window join window", "fr"),
      (6L, "a b a b a b a b a b", "en"),
      (7L, "unique rare bigrams only appear here once", "en")
    ).toDF("doc_id", "text", "lang")
  }

  private def bigrams(d: DataFrame): DataFrame =
    d.select(col("doc_id"),
      explode(graft.functions.WordGrams(col("text"), 2)).as("g"))
      .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))

  private def rowsOf(df: DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("bigramLmFromCounts equals bigramLm (incl. <2-word docs absent)") {
    val viaCounts = TextAnalysis.bigramLmFromCounts(bigrams(docs))
    assert(rowsOf(viaCounts) == rowsOf(TextAnalysis.bigramLm(docs)))
    // the absence contract: docs 2 and 3 have no bigram evidence
    assert(!viaCounts.collect().map(_.getLong(0)).toSet.exists(Set(2L, 3L)))
  }

  test("dsirWeightsFromCounts equals dsirWeights (weighted-distinct hashing + lang re-attach)") {
    assert(rowsOf(TrainingData.dsirWeightsFromCounts(docs, bigrams(docs))) ==
      rowsOf(TrainingData.dsirWeights(docs)))
  }

  test("token-artifact vocabulary equals occurrence-count vocabulary (the q83 supply)") {
    val fromCounts = docs
      .select(col("doc_id"), explode(split(coalesce(col("text"), lit("")), " ")).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("cnt"))
      .groupBy(col("w")).agg(sum(col("cnt")).as("freq"))
      .filter(length(col("w")) >= 2)
    val fromText = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .filter(length(col("w")) >= 2)
    assert(rowsOf(fromCounts) == rowsOf(fromText))
  }

  test("contaminatedTestDocsFromGrams equals contaminatedTestDocs (distinct-stream set semantics)") {
    import spark.implicits._
    // in-doc gram repetition exercises the distinct-vs-occurrence axis
    val shared = (1 to 8).map(i => s"g$i").mkString(" ")
    val corpus = Seq(
      (1L, s"$shared $shared repeated twice in one doc"),
      (2L, s"$shared leaked here"),
      (3L, "nothing shared in this document at all body"),
      (4L, s"also $shared present")
    ).toDF("doc_id", "text")
    val grams = corpus.select(col("doc_id"),
      explode(graft.functions.GramHashes(col("text"), 8, 16)).as("gh"))
      .dropDuplicates("doc_id", "gh")
    assert(rowsOf(TrainingData.contaminatedTestDocsFromGrams(grams)) ==
      rowsOf(TrainingData.contaminatedTestDocs(corpus)))
  }

  test("sharedSourcePairs off distinct grams equals the occurrence-stream form") {
    import spark.implicits._
    val shared = (1 to 8).map(i => s"h$i").mkString(" ")
    val corpus = Seq(
      (1L, s"$shared $shared twice", "srcA"),
      (2L, s"$shared once", "srcB"),
      (3L, s"$shared again", "srcC"),
      (4L, "fully distinct content words here body text", "srcA")
    ).toDF("doc_id", "text", "source")
    val raw = TrainingData.sharedSourcePairs(corpus.select(col("source"),
      explode(graft.functions.GramHashes(col("text"), 8, 16)).as("gh")))
    val staged = TrainingData.sharedSourcePairs(corpus
      .select(col("doc_id"),
        explode(graft.functions.GramHashes(col("text"), 8, 16)).as("gh"))
      .dropDuplicates("doc_id", "gh")
      .join(corpus.select(col("doc_id"), col("source")), "doc_id")
      .select(col("source"), col("gh")))
    assert(rowsOf(staged) == rowsOf(raw))
  }

  test("staged bigram counts equal the inline pre-aggregate on the sf0.001 fixture") {
    val staged = TextAnalysis.stagedBigramCounts(spark, TestSpark.sf0001)
    val inline = bigrams(Tables.documents(spark, TestSpark.sf0001))
    assert(staged.count() == inline.count())
    assert(staged.exceptAll(inline).isEmpty && inline.exceptAll(staged).isEmpty)
  }
}
