package graft

import graft.operators.{Dedup, Multimodal}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The session-stage caches (Dedup staged pairs/clusters, Multimodal
  * staged aHashes, TextAnalysis staged token/bigram counts) are
  * per-JVM and keyed by corpus path PLUS a listing
  * fingerprint (`Tables.fingerprint`) — round-12 ADVICE: a long-lived
  * JVM that regenerates a fixture dir in place, or two corpus dirs
  * sharing a basename (the aHash stage path is basename-derived so the
  * DuckDB oracle can address it), must re-stage instead of silently
  * serving another corpus's artifacts.
  */
class StageCacheSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // splitmix-style 64-bit scramble: distinct seeds give patterns with
  // pairwise hamming ~32, far above the banded-hamming pair threshold
  private def mix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  // the first 192 text bytes render as an 8×8 24bpp BMP (bmpMediaTable),
  // so encode a 64-bit pattern as 64 three-char pixel runs with a big
  // luminance gap ('~' = 126 vs '.' = 46): the aHash of the rendered
  // raster IS the pattern's threshold image — dup docs share it
  // exactly, unique docs land ~32 hamming apart, never an accident
  private def pixelBlock(pattern: Long): String =
    (0 until 64).map(j =>
      if (((pattern >> j) & 1L) == 1L) "~~~" else "...").mkString

  // a tiny documents corpus with ONE planted exact-dup family on the
  // given (even, so mediaTable types them "image") doc ids; texts open
  // with the pixel block, then carry 40 per-doc words so the 5-word
  // shingle pipeline sees the same dup structure; `pad` varies total
  // bytes so two corpora never share a listing fingerprint by accident
  private def writeCorpus(dir: String, ids: Seq[Long], dupA: Long,
      dupB: Long, pad: String): Unit = {
    import spark.implicits._
    val rows = ids.map { id =>
      val text =
        if (id == dupA || id == dupB)
          pixelBlock(mix64(777L)) + s" shared family text $pad " +
            (1 to 40).map(i => s"dup$i").mkString(" ")
        else
          pixelBlock(mix64(id)) + s" unique document $id $pad " +
            (1 to 40).map(i => s"w$id-$i").mkString(" ")
      (id, text, "en", s"src${id % 3}", text.length.toLong)
    }
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  private def pairsVia(f: => org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    f.select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("in-place corpus rewrite invalidates the staged candidate pairs and clusters") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stage-inval").toString
    writeCorpus(dir, 1L to 12L, dupA = 2L, dupB = 4L, pad = "alpha")
    assert(pairsVia(Dedup.stagedCandidatePairs(spark, dir)) == Set((2L, 4L)))
    assert(Dedup.stagedClusters(spark, dir).select("doc_id")
      .collect().map(_.getLong(0)).toSet == Set(2L, 4L))

    // regenerate the SAME path with a different dup family (and a
    // different byte total, so the fingerprint differs even when the
    // filesystem's mtime granularity swallows the rewrite)
    writeCorpus(dir, 1L to 12L, dupA = 6L, dupB = 8L, pad = "longer-beta-pad")
    assert(pairsVia(Dedup.stagedCandidatePairs(spark, dir)) == Set((6L, 8L)),
      "staged pairs must re-stage after an in-place corpus rewrite")
    assert(Dedup.stagedClusters(spark, dir).select("doc_id")
      .collect().map(_.getLong(0)).toSet == Set(6L, 8L),
      "staged clusters must re-stage after an in-place corpus rewrite")
    // and the staged frame equals a fresh computation, not merely "changed"
    assert(pairsVia(Dedup.stagedCandidatePairs(spark, dir)) ==
      pairsVia(Dedup.candidatePairs(spark, dir)))
  }

  test("in-place corpus rewrite invalidates the staged token and bigram artifacts") {
    import graft.operators.TextAnalysis
    val dir = java.nio.file.Files.createTempDirectory("graft-stage-tok").toString
    writeCorpus(dir, 1L to 6L, dupA = 2L, dupB = 4L, pad = "alpha")
    val tok1 = TextAnalysis.stagedTokenCounts(spark, dir).count()
    val big1 = TextAnalysis.stagedBigramCounts(spark, dir).count()

    // same path, different corpus (more ids AND different byte total)
    writeCorpus(dir, 1L to 9L, dupA = 6L, dupB = 8L, pad = "longer-beta-pad")
    val tok2 = TextAnalysis.stagedTokenCounts(spark, dir)
    val big2 = TextAnalysis.stagedBigramCounts(spark, dir)
    assert(tok2.select("doc_id").distinct().count() == 9,
      "staged token counts must re-stage after an in-place corpus rewrite")
    assert(big2.select("doc_id").distinct().count() == 9,
      "staged bigram counts must re-stage after an in-place corpus rewrite")
    assert(tok2.count() != tok1 || big2.count() != big1)
    assert(graft.operators.TrainingData.stagedGramHashes(spark, dir)
      .select("doc_id").distinct().count() == 9,
      "staged gram hashes must key on the same fingerprint discipline")
  }

  test("spark.graft.stageDir routes new stage writes to the configured shared root") {
    // cluster posture: a driver-local temp dir is invisible to remote
    // executors, so deployments point the stages at shared storage
    import graft.operators.TextAnalysis
    val root = java.nio.file.Files.createTempDirectory("graft-stage-root").toString
    spark.conf.set("spark.graft.stageDir", root)
    try {
      val dir = java.nio.file.Files.createTempDirectory("graft-stage-conf").toString
      writeCorpus(dir, 1L to 5L, dupA = 2L, dupB = 4L, pad = "conf-root")
      assert(TextAnalysis.stagedTokenCounts(spark, dir).count() > 0)
      assert(Option(new java.io.File(root).listFiles()).exists(
        _.exists(_.getName.startsWith("graft-tokens-"))),
        s"stage must land under the configured root: $root")
    } finally spark.conf.unset("spark.graft.stageDir")
  }

  test("aHash stage survives two corpus dirs sharing a basename (alias rewrite)") {
    // both dirs are named "corpus": their q60b stages alias onto ONE
    // basename-derived parquet path, so returning to the FIRST dir
    // after staging the second must rewrite the stage, not serve the
    // second corpus's hashes from the first's cache entry
    val root1 = java.nio.file.Files.createTempDirectory("graft-alias-1")
    val root2 = java.nio.file.Files.createTempDirectory("graft-alias-2")
    val d1 = root1.resolve("corpus").toString
    val d2 = root2.resolve("corpus").toString
    writeCorpus(d1, 1L to 10L, dupA = 2L, dupB = 4L, pad = "first")
    writeCorpus(d2, 1L to 10L, dupA = 6L, dupB = 8L, pad = "second-longer")

    val q60b = Registry.byName("q60b_image_pairs_sql")
    val r1 = pairsVia(q60b.run(spark, d1))
    val r2 = pairsVia(q60b.run(spark, d2))
    assert(r1 == Set((2L, 4L)) && r2 == Set((6L, 8L)))
    assert(pairsVia(q60b.run(spark, d1)) == r1,
      "returning to the first aliased corpus must re-stage its own hashes")

    // in-place rewrite of an already-staged media corpus re-stages too
    writeCorpus(d1, 1L to 10L, dupA = 4L, dupB = 10L, pad = "first-rewritten")
    assert(pairsVia(q60b.run(spark, d1)) == Set((4L, 10L)),
      "aHash stage must re-stage after an in-place corpus rewrite")
  }
}
