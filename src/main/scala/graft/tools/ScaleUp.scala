package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic fixture scale-up: replicates every table of a source
  * scale-factor directory `factor` times with consistently shifted keys,
  * so join fan-outs, group cardinalities and dedup families all grow
  * linearly and the bench can be re-run one order of magnitude up
  * (SCALE.md's "would the plan hold at 10×?" made measurable).
  *
  * Shift discipline: every key column in replica r moves by
  * `r * stride`, and referencing columns (o_custkey, l_orderkey, …)
  * move by the same stride, so intra-replica joins match exactly and
  * replicas never cross-join. The stride is COMPUTED from the source —
  * the smallest power of 10 above `factor` × every key column's max —
  * so ScaleUp COMPOSES: a fixed 1e8 stride applied to its own output
  * collided keys ((r1 + r2)·1e8 + k), and an sf1×10 build carried
  * 500k document rows over only 95k distinct doc_ids — a corpus that
  * violates the q89 unique-key contract and silently corrupts every
  * dedup/df statistic (found round 13 when q96's engine-vs-oracle
  * comparison, which implicitly crosses count(*) with
  * countDistinct(doc_id), hash-failed at exactly the 500k/95k ratio).
  * Documents get a `r<i>` prefix token in
  * replica i > 0 — near-identical (not byte-identical) text, so sf1
  * carries 10-way NEAR-dup families: the LSH/Jaccard pipelines face a
  * strictly heavier candidate load than at sf0.1, which is the honest
  * scale-up for dedup. Embeddings keep their vectors (vec_id stride is a
  * multiple of the query stride, so the query set also scales 10×).
  *
  * Plan shape: each table is ONE scan cross-joined with the broadcast
  * replica-index range — a union of per-replica frames would re-plan and
  * re-scan the source `factor` times (the branch-duplication trap this
  * repo's dedup plans are pinned against).
  *
  * Usage: ScaleUp <srcDir> <dstDir> [factor=10]
  * Writes <dstDir>/<table>.parquet for the same table set the driver
  * generates. Never touches the source directory.
  */
object ScaleUp {

  /** Key columns that shift, per table — also the uniqueness surface
    * the composition-safety stride is computed over.
    */
  private val KeyCols: Map[String, Seq[String]] = Map(
    "customer" -> Seq("c_custkey"),
    "supplier" -> Seq("s_suppkey"),
    "part" -> Seq("p_partkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "events" -> Seq("event_id", "user_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))

  def run(spark: SparkSession, src: String, dst: String, factor: Int): Unit = {
    // composition-safe stride: one GLOBAL power of 10 strictly above
    // every key column's max in the source (global, not per-table,
    // because doc_id↔vec_id and the TPC-H foreign keys must shift
    // identically across tables). stride > maxKey suffices for
    // non-overlap ONLY because keys are nonnegative (asserted below):
    // replica r occupies [r·stride, r·stride + maxKey].
    val keyBounds = KeyCols.flatMap { case (t, cols) =>
      val df = spark.read.parquet(s"$src/$t.parquet")
      cols.map { c =>
        val row = df.agg(
          max(col(c).cast("long")), min(col(c).cast("long"))).head()
        (Option(row.get(0)).fold(0L)(_.asInstanceOf[Long]),
          Option(row.get(1)).fold(0L)(_.asInstanceOf[Long]), s"$t.$c")
      }
    }
    keyBounds.foreach { case (_, mn, name) =>
      require(mn >= 0L,
        s"ScaleUp requires nonnegative keys; $name has min $mn — " +
          "negative keys would let replica ranges overlap under a " +
          "max-only stride")
    }
    val maxKey = keyBounds.map(_._1).max
    // uniqueness needs every source key BELOW the stride (replica
    // ranges [r·stride, r·stride + maxKey] must not overlap)
    var stride = 100_000_000L
    while (stride <= maxKey) stride *= 10L
    def shiftCols(df: DataFrame, r: Column, cols: String*): DataFrame =
      cols.foldLeft(df)((d, c) => d.withColumn(c, col(c) + r * lit(stride)))

    // each entry: (replicated frame with index column `r`) => shifted frame
    val tables: Map[String, (DataFrame, Column) => DataFrame] = Map(
      // dimension tables small enough to keep verbatim (broadcast sides)
      "region" -> ((df, r) => df.filter(r === 0)),
      "nation" -> ((df, r) => df.filter(r === 0)),
      "customer" -> ((df, r) => shiftCols(df, r, "c_custkey")),
      "supplier" -> ((df, r) => shiftCols(df, r, "s_suppkey")),
      "part" -> ((df, r) => shiftCols(df, r, "p_partkey")),
      "orders" -> ((df, r) => shiftCols(df, r, "o_orderkey", "o_custkey")),
      "lineitem" -> ((df, r) =>
        shiftCols(df, r, "l_orderkey", "l_partkey", "l_suppkey")),
      "events" -> ((df, r) => shiftCols(df, r, "event_id", "user_id")),
      "documents" -> ((df, r) =>
        shiftCols(df, r, "doc_id")
          .withColumn("text",
            when(r === 0, col("text"))
              .otherwise(concat(lit("r"), r.cast("string"), lit(" "), col("text"))))
          .withColumn("n_chars", length(col("text")).cast("long"))),
      "embeddings" -> ((df, r) => shiftCols(df, r, "vec_id")))

    val reps = broadcast(spark.range(factor).toDF("_r"))
    tables.foreach { case (t, shift) =>
      val base = spark.read.parquet(s"$src/$t.parquet")
      shift(base.crossJoin(reps), col("_r"))
        .drop("_r")
        .write.mode("overwrite").parquet(s"$dst/$t.parquet")
    }
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ScaleUp <srcDir> <dstDir> [factor]")
    val factor = if (args.length > 2) args(2).toInt else 10
    val spark = graft.GraftSession.local("graft-scaleup")
    run(spark, args(0), args(1), factor)
    println(s"scaled ${args(0)} x$factor -> ${args(1)}")
    spark.stop()
  }
}
