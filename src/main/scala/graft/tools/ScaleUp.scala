package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic fixture scale-up: replicates every table of a source
  * scale-factor directory `factor` times with consistently shifted keys,
  * so join fan-outs, group cardinalities and dedup families all grow
  * linearly and the bench can be re-run one order of magnitude up
  * (SCALE.md's "would the plan hold at 10×?" made measurable).
  *
  * Shift discipline: every key column in a replica moves by
  * `replica * KeyStride`, and referencing columns (o_custkey,
  * l_orderkey, …) move by the same stride, so intra-replica joins match
  * exactly and replicas never cross-join. Documents get a `r<i>` prefix
  * token in replica i > 0 — near-identical (not byte-identical) text, so
  * sf1 carries 10-way NEAR-dup families: the LSH/Jaccard pipelines face
  * a strictly heavier candidate load than at sf0.1, which is the honest
  * scale-up for dedup. Embeddings keep their vectors (vec_id stride is a
  * multiple of the query stride, so the query set also scales 10×).
  *
  * Usage: ScaleUp <srcDir> <dstDir> [factor=10]
  * Writes <dstDir>/<table>.parquet for the same table set the driver
  * generates. Never touches the source directory.
  */
object ScaleUp {

  private val KeyStride = 100_000_000L

  private def replicate(spark: SparkSession, src: String, table: String,
      factor: Int)(shift: (DataFrame, Int) => DataFrame): DataFrame = {
    val base = spark.read.parquet(s"$src/$table.parquet")
    (0 until factor).map(i => shift(base, i)).reduce(_.unionByName(_))
  }

  def run(spark: SparkSession, src: String, dst: String, factor: Int): Unit = {
    def off(i: Int): Long = i.toLong * KeyStride
    def shiftCols(df: DataFrame, i: Int, cols: String*): DataFrame =
      cols.foldLeft(df)((d, c) => d.withColumn(c, col(c) + lit(off(i))))

    val tables: Map[String, (DataFrame, Int) => DataFrame] = Map(
      // dimension tables small enough to keep verbatim (broadcast sides)
      "region" -> ((df, i) => if (i == 0) df else df.limit(0)),
      "nation" -> ((df, i) => if (i == 0) df else df.limit(0)),
      "customer" -> ((df, i) => shiftCols(df, i, "c_custkey")),
      "supplier" -> ((df, i) => shiftCols(df, i, "s_suppkey")),
      "part" -> ((df, i) => shiftCols(df, i, "p_partkey")),
      "orders" -> ((df, i) => shiftCols(df, i, "o_orderkey", "o_custkey")),
      "lineitem" -> ((df, i) =>
        shiftCols(df, i, "l_orderkey", "l_partkey", "l_suppkey")),
      "events" -> ((df, i) => shiftCols(df, i, "event_id", "user_id")),
      "documents" -> ((df, i) =>
        shiftCols(df, i, "doc_id")
          .withColumn("text",
            if (i == 0) col("text")
            else concat(lit(s"r$i "), col("text")))
          .withColumn("n_chars", length(col("text")).cast("long"))),
      "embeddings" -> ((df, i) => shiftCols(df, i, "vec_id")))

    tables.foreach { case (t, shift) =>
      replicate(spark, src, t, factor)(shift)
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
