package graft

import graft.sources.PartitionedLayout
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Date-partitioned writes must produce partition-pruned scans. */
class PartitionedLayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("date predicate prunes partitions at planning time") {
    val dir = Files.createTempDirectory("plp").toString
    val events = Tables.events(spark, TestSpark.sf0001)
    PartitionedLayout.writeDatePartitioned(events, "ts", dir)
    // layout: one directory per day
    val dayDirs = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("event_date="))
    assert(dayDirs.length > 1)

    val pruned = PartitionedLayout.read(spark, dir)
      .filter(col("event_date") === "2024-01-03")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("2024-01-03"),
      s"expected partition pruning in:\n$plan")
    // correctness: equals a full-scan day filter on the source table
    val expected = events
      .filter(to_date(col("ts")) === "2024-01-03").count()
    assert(pruned.count() == expected)
    assert(expected > 0)
  }
}
