package graft

import org.scalatest.funsuite.AnyFunSuite

/** Contract checks over the whole query registry on sf0.001: every query
  * runs, and every oracle-bearing query has stable column names (the
  * driver hashes by sorted column name — SURVEY.md §5).
  */
class RegistrySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // the four declared rows-only queries: q32's HLL sketch has no DuckDB
  // twin (accuracy CI-asserted in ExtensionsSpec, error-bounded at
  // sf0.01) and q60/q80/q98's media decodes (BMP / WAV / MJPEG) are not
  // expressible in SQL (recall brute-force-asserted in ExtensionsSpec;
  // their banded PAIRING halves ARE driver-checked via the
  // q60b/q80b/q98b staged-hash companions); everything else must carry
  // an oracle
  private val declaredRowsOnly =
    Set("q32_approx_distinct", "q60_image_near_dups",
      "q80_audio_near_dups", "q98_video_near_dups")

  test("registry names are unique; only declared rows-only ops lack oracles") {
    val names = Registry.all.map(_.name)
    assert(names.distinct.size == names.size)
    val noOracle = Registry.all.filter(_.oracle.isEmpty).map(_.name).toSet
    assert(noOracle == declaredRowsOnly)
    // Some(null) oracles pass every keySet check but crash the driver's
    // oracle dump — the Scala object-init-order trap: a `queries` val
    // declared above the oracle val it captures sees null (q33 regression)
    val nullSql = Registry.all.filter(_.oracle.exists(_ eq null)).map(_.name)
    assert(nullSql.isEmpty, s"null oracle SQL (object-init order): $nullSql")
  }

  Registry.all.foreach { q =>
    test(s"${q.name} runs on sf0.001 and returns rows") {
      val df = q.run(spark, TestSpark.sf0001)
      assert(df.columns.nonEmpty)
      assert(df.count() > 0, s"${q.name} returned no rows")
    }
  }

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle SQL covers every query except the declared rows-only ops") {
    assert(SparkEntry.oracleSql.keySet ==
      SparkEntry.queries.keySet -- declaredRowsOnly)
  }

  test("bench short ids (name before first underscore) stay unique") {
    // Bench's tail-survivable summary keys per-query times by the short
    // id; a collision would silently drop a query's time from the
    // archived artifact
    val shorts = Registry.all.map(_.name.takeWhile(_ != '_'))
    assert(shorts.distinct.size == shorts.size,
      s"colliding short ids: ${shorts.diff(shorts.distinct).distinct}")
  }
}
