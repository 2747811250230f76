package graft

import graft.tools.Curate
import org.scalatest.funsuite.AnyFunSuite

/** Crash-tests the batch Curate pipeline's restartability claim (the
  * streaming legs got their failure-injection test in round 12; this
  * is the batch half): kill the run after stage N, resume, and assert
  * (a) the resumed run's final counts and artifact CONTENT equal a
  * never-crashed run's, and (b) the pre-crash stage artifacts are not
  * rewritten — no duplicated stage work. Content equality (sorted-row
  * digests) is the right contract, not file-byte equality: parquet
  * part-file NAMES carry task UUIDs, so two semantically identical
  * writes never share a byte-identical directory tree.
  */
class CurateRestartSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def contentDigest(path: String): (Long, Int) = {
    val df = spark.read.parquet(path)
    val rows = df.collect().map(_.toString).sorted
    (scala.util.hashing.MurmurHash3.orderedHash(rows).toLong, rows.length)
  }

  private def fileMtimes(dir: String): Map[String, Long] = {
    val d = new java.io.File(dir)
    d.listFiles().map(f => f.getName -> f.lastModified()).toMap
  }

  test("Curate killed after 'quality' resumes to identical artifacts without redoing finished stages") {
    val ref = java.nio.file.Files.createTempDirectory("curate-ref").toString
    val out = java.nio.file.Files.createTempDirectory("curate-crash").toString

    // the never-crashed reference run
    val refCounts = Curate.run(spark, TestSpark.sf0001, ref)

    // crash after the quality stage's write completes
    intercept[Curate.InjectedCrash] {
      Curate.run(spark, TestSpark.sf0001, out, failAfter = Some("quality"))
    }
    val preCrash = Seq("audit", "deduped", "sem_deduped", "quality")
    preCrash.foreach(s => assert(
      new java.io.File(s"$out/$s/_SUCCESS").exists,
      s"stage '$s' should have completed before the injected crash"))
    assert(!new java.io.File(s"$out/mixed").exists,
      "no stage after the crash point may exist")
    val mtimesBefore = preCrash.map(s => s -> fileMtimes(s"$out/$s")).toMap

    // resume: finished stages are read back, the rest recompute
    val resumedCounts = Curate.run(spark, TestSpark.sf0001, out, resume = true)
    assert(resumedCounts == refCounts,
      "resumed run must reproduce the never-crashed run's stage counts")

    // no duplicated stage work: pre-crash artifacts untouched on disk
    preCrash.foreach { s =>
      assert(fileMtimes(s"$out/$s") == mtimesBefore(s),
        s"stage '$s' was rewritten on resume — finished work was redone")
    }

    // artifact content equality, stage by stage, against the reference
    val stages = preCrash ++ Seq("mixed", "splits",
      "clean", "mixture_report", "train_packed", "shard_manifest")
    stages.foreach { s =>
      assert(contentDigest(s"$out/$s") == contentDigest(s"$ref/$s"),
        s"stage '$s' content differs between the resumed and reference runs")
    }
  }

  test("a stage with a foreign generation stamp is recomputed on resume, not trusted") {
    val out = java.nio.file.Files.createTempDirectory("curate-stamp").toString
    Curate.run(spark, TestSpark.sf0001, out)

    // resume against an untouched tree: every stage is reused as-is
    val before = fileMtimes(s"$out/deduped")
    Curate.run(spark, TestSpark.sf0001, out, resume = true)
    assert(fileMtimes(s"$out/deduped") == before,
      "an unchanged stage must be reused on resume")

    // tamper the 'mixed' stamp to simulate an artifact from another
    // generation (different corpus or upstream chain): resume must
    // recompute it and everything downstream, while stages BEFORE it
    // (whose stamps still match) stay untouched
    val stamp = java.nio.file.Paths.get(s"$out/mixed/_GRAFT_STAMP")
    java.nio.file.Files.write(stamp,
      "corpus:other-generation/mixed".getBytes("UTF-8"))
    val qualityBefore = fileMtimes(s"$out/quality")
    val mixedStampBefore = java.nio.file.Files.readAllBytes(stamp)
    Curate.run(spark, TestSpark.sf0001, out, resume = true)
    assert(!java.util.Arrays.equals(
        java.nio.file.Files.readAllBytes(stamp), mixedStampBefore),
      "the foreign-stamped stage must have been rewritten with this generation's stamp")
    assert(fileMtimes(s"$out/quality") == qualityBefore,
      "stages upstream of the tampered one must not be redone")
  }

  test("a torn stage (no _SUCCESS) is recomputed on resume, not trusted") {
    val out = java.nio.file.Files.createTempDirectory("curate-torn").toString
    intercept[Curate.InjectedCrash] {
      Curate.run(spark, TestSpark.sf0001, out, failAfter = Some("sem_deduped"))
    }
    // simulate a crash MID-write of the next stage: a directory with
    // data but no _SUCCESS marker must not short-circuit the resume
    val torn = new java.io.File(s"$out/quality")
    torn.mkdirs()
    val junk = new java.io.File(torn, "part-00000-torn.parquet")
    java.nio.file.Files.write(junk.toPath, Array[Byte](1, 2, 3))
    val counts = Curate.run(spark, TestSpark.sf0001, out, resume = true)
    assert(new java.io.File(s"$out/quality/_SUCCESS").exists,
      "the torn stage must have been rewritten to completion")
    assert(counts.trainPacks > 0)
  }
}
