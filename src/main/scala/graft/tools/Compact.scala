package graft.tools

import graft.sources.FileCatalog
import org.apache.spark.sql.SparkSession

/** Small-file compaction for staged parquet directories — the ops
  * complement of the engine's write-a-stage/read-it-back design
  * (Curate stages, streaming sinks). Streaming appends and
  * fine-grained micro-batches accrete many small files; at cluster
  * scale every downstream scan then pays a task per file and the
  * NameNode/listing layer pays per entry. Compaction rewrites a
  * directory to ceil(totalBytes / targetBytes) files.
  *
  * Semantics and safety:
  *   - content-preserving: the rewrite is a plain read→repartition→
  *     write of the same rows (verified by the spec via a full
  *     row-multiset comparison);
  *   - the rewrite goes to `<dir>.compact.tmp` first and swaps in only
  *     after a successful write + row-count check, so a crashed
  *     compaction never leaves a half-written directory in place of
  *     live data (the staged-parquet restartability contract);
  *   - `repartition(n)` (round-robin), not `coalesce(n)`: coalesce
  *     chains upstream partitioning into as-few-tasks-as-files and
  *     produces skewed files when input files are skewed — compaction
  *     is precisely the moment to pay one shuffle for even output.
  *
  * Returns (filesBefore, filesAfter, rows).
  */
object Compact {

  def run(spark: SparkSession, dir: String,
      targetBytes: Long = 128L * 1024 * 1024): (Int, Int, Long) = {
    val files = FileCatalog.list(spark, dir, suffix = ".parquet")
    require(files.nonEmpty, s"no parquet files under $dir")
    val totalBytes = files.map(_.bytes).sum
    val n = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val df = spark.read.parquet(dir)
    val rows = df.count()
    val tmp = dir.stripSuffix("/") + ".compact.tmp"
    df.repartition(n).write.mode("overwrite").parquet(tmp)
    val rewritten = spark.read.parquet(tmp).count()
    require(rewritten == rows,
      s"compaction row mismatch: $rows read, $rewritten rewritten — " +
        s"original left untouched at $dir, rewrite at $tmp")
    // swap: remove originals, move the rewrite into place
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(tmp), spark.sparkContext.hadoopConfiguration)
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val tmpPath = new org.apache.hadoop.fs.Path(tmp)
    fs.delete(dirPath, true)
    require(fs.rename(tmpPath, dirPath), s"rename $tmp -> $dir failed")
    val after = FileCatalog.list(spark, dir, suffix = ".parquet").size
    (files.size, after, rows)
  }

  /** Usage: Compact <dir> [targetMiB=128] */
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: Compact <dir> [targetMiB]")
    val spark = graft.GraftSession.local("graft-compact",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val target = if (args.length > 1) args(1).toLong * 1024 * 1024
      else 128L * 1024 * 1024
    val (before, after, rows) = run(spark, args(0), target)
    println(s"""{"dir":"${args(0)}","files_before":$before,"files_after":$after,"rows":$rows}""")
    spark.stop()
  }
}
