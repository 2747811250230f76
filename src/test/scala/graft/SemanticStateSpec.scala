package graft

import graft.operators.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The persistent semantic-dedup state (round 16): verdicts maintained
  * under entries/exits must equal — row for row — a from-scratch q55
  * run over the CURRENT survivor set under the state's frozen
  * centroids. Covers the invalidation contract round 15 documented as
  * missing: an exited dropper resurrects its victims, a new smaller
  * twin drops an old member, a cell crossing the cap flips wholesale,
  * and untouched cells never recompute.
  */
class SemanticStateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def emb(keep: org.apache.spark.sql.Column): DataFrame =
    Tables.embeddings(spark, TestSpark.sf0001)
      .select(col("vec_id"), col("embedding")).filter(keep)

  private def vmap(df: DataFrame): Map[Long, (Boolean, Option[Long])] =
    df.select("vec_id", "kept", "dup_of").collect()
      .map(r => r.getLong(0) ->
        ((r.getBoolean(1), Option(r.get(2)).map(_.asInstanceOf[Long]))))
      .toMap

  private def scratch(dir: String, e: DataFrame)
      : Map[Long, (Boolean, Option[Long])] =
    vmap(Similarity.semanticDedup(e,
      centroids = Some(spark.read.parquet(s"$dir/centroids"))))

  test("entries re-verdict only their cells and match a from-scratch " +
      "q55 under the frozen centroids, across chained syncs") {
    val dir = java.nio.file.Files.createTempDirectory("semstate1").toString
    Similarity.syncSemanticState(spark, dir, emb(col("vec_id") % 10 < 8))
    assert(vmap(Similarity.readSemVerdicts(spark, dir)) ==
      scratch(dir, emb(col("vec_id") % 10 < 8)), "init diverged")
    val latest1 = graft.StateFiles.readPointer(dir)._1
    Similarity.syncSemanticState(spark, dir, emb(col("vec_id") % 10 < 9))
    // the delta version just written holds rows ONLY for touched
    // cells: every non-tombstone cid in it is a cell some entry landed
    // in (read before the next sync — a later compaction's janitor
    // sweeps old deltas)
    val enteredCells = Similarity.readSemMembers(spark, dir)
      .join(emb(col("vec_id") % 10 === 8).select("vec_id"), Seq("vec_id"),
        "left_semi")
      .select("cid").distinct().collect().map(_.getLong(0)).toSet
    val deltaCells = spark.read
      .parquet(s"$dir/verdicts_v${latest1 + 1}")
      .filter(col("cid").isNotNull)
      .select("cid").distinct().collect().map(_.getLong(0)).toSet
    assert(deltaCells.subsetOf(enteredCells),
      s"delta recomputed untouched cells: ${deltaCells -- enteredCells}")
    val v2 = vmap(Similarity.syncSemanticState(spark, dir, emb(lit(true))))
    assert(v2 == scratch(dir, emb(lit(true))),
      "chained incremental verdicts diverged from from-scratch q55")
  }

  test("an exited dropper resurrects its victim; a new smaller twin " +
      "drops an old member; tombstones clear exits") {
    import spark.implicits._
    def vecs(ids: Seq[Long], shared: Seq[Long]): DataFrame = {
      // identical 8-dim vectors per family: same argmax cell by
      // construction, cosine 1 within the family
      val fam = Map(1L -> Array.fill(8)(1.0f),
        2L -> Array.tabulate(8)(i => if (i < 4) 1.0f else -1.0f))
      (ids.map(i => (i, fam(1L))) ++ shared.map(i => (i, fam(2L))))
        .toDF("vec_id", "embedding")
    }
    val dir = java.nio.file.Files.createTempDirectory("semstate2").toString
    // family A = {10, 11, 12}; family B = {20, 21}
    Similarity.syncSemanticState(spark, dir,
      vecs(Seq(10L, 11L, 12L), Seq(20L, 21L)))
    val s1 = vmap(Similarity.readSemVerdicts(spark, dir))
    assert(s1(10L) == ((true, None)) && s1(11L) == ((false, Some(10L))) &&
      s1(12L) == ((false, Some(10L))), s"init verdicts: $s1")
    // dropper 10 EXITS; a smaller twin 5 ENTERS family B
    val v2 = vmap(Similarity.syncSemanticState(spark, dir,
      vecs(Seq(11L, 12L), Seq(5L, 20L, 21L))))
    assert(!v2.contains(10L), "exited member must be tombstoned")
    assert(v2(11L) == ((true, None)),
      s"victim must resurrect when its only smaller twin exits: $v2")
    assert(v2(12L) == ((false, Some(11L))),
      s"remaining member re-verdicts against the resurrected twin: $v2")
    assert(v2(20L) == ((false, Some(5L))) && v2(21L) == ((false, Some(5L))),
      s"a new smaller twin must drop the old members: $v2")
    assert(v2 == scratch(dir, vecs(Seq(11L, 12L), Seq(5L, 20L, 21L))))
  }

  test("a cell crossing the cap flips to all-kept, and back") {
    import spark.implicits._
    def fam(n: Int): DataFrame =
      (1 to n).map(i => (i.toLong, Array.fill(8)(1.0f)))
        .toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("semstate3").toString
    val v1 = vmap(Similarity.syncSemanticState(spark, dir, fam(3),
      cellCap = 4))
    assert(v1.values.count(!_._1) == 2, s"under cap: 2 dropped, got $v1")
    // grow past the cap: the whole cell flips to kept
    val v2 = vmap(Similarity.syncSemanticState(spark, dir, fam(6),
      cellCap = 4))
    assert(v2.size == 6 && v2.values.forall(_._1),
      s"capped-out cell must keep all members: $v2")
    // no-op snapshot: pointer untouched
    val ptr = java.nio.file.Files.readString(
      java.nio.file.Paths.get(dir, "_LATEST"))
    Similarity.syncSemanticState(spark, dir, fam(6), cellCap = 4)
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(dir, "_LATEST")) == ptr)
  }

  test("a rolled-back (crash-replayed) sync is a fixpoint") {
    val dir = java.nio.file.Files.createTempDirectory("semstate4").toString
    Similarity.syncSemanticState(spark, dir, emb(col("vec_id") % 10 < 9))
    Similarity.syncSemanticState(spark, dir, emb(lit(true)))
    val before = vmap(Similarity.readSemVerdicts(spark, dir))
    graft.StateFiles.writePointer(dir, 1, 1) // lose the flip
    val after = vmap(Similarity.syncSemanticState(spark, dir, emb(lit(true))))
    assert(after == before, "crash-replayed sync changed the verdicts")
  }
}
