package graft.tools

import graft.Tables
import graft.operators.Quantization
import org.apache.spark.sql.functions._

/** Stage-level cost breakdown of the q84 ADC scan on a fixture dir —
  * where does the time go: encode, pair-distance compute, or the
  * top-k window? Each stage min-over-3 after one warm pass.
  *
  * Usage: PqProbe <sfDir>
  */
object PqProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: PqProbe <sfDir>")
    val spark = graft.GraftSession.local("graft-pq-probe",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val emb = Tables.embeddings(spark, args(0))
    val pred = col("vec_id") % 100 === 0

    def t(body: => Long): (Double, Long) = {
      body
      var rows = 0L
      val secs = Seq.fill(3) {
        val t0 = System.nanoTime()
        rows = body
        (System.nanoTime() - t0) / 1e9
      }
      (secs.min, rows)
    }

    val cb = Quantization.demoCodebook(emb)
    println("scan_partitions=" + emb.rdd.getNumPartitions)
    val (encSec, encRows) = t(Quantization.pqEncode(emb, cb).count())
    val (joinSec, joinRows) = t(
      Quantization.adcPairs(emb, pred, None)
        .agg(sum(col("qid") + col("nid"))).collect().length.toLong)
    val (pairSec, pairRows) = t(
      Quantization.adcPairs(emb, pred, None)
        .agg(count(lit(1)), sum(col("adist"))).collect().head.getLong(0))
    val (fullSec, fullRows) = t(
      Quantization.adcTopK(emb, pred, 5).count())
    // the same pair volume through the brute-force kernel, for scale
    val (bfSec, bfRows) = t(
      graft.operators.Similarity.cosineTopK(emb, pred, 5).count())
    println(s"""{"sf":"${args(0)}","encode_sec":$encSec,"encode_rows":$encRows,""" +
      s""""join_only_sec":$joinSec,""" +
      s""""adc_pairs_sec":$pairSec,"adc_pairs":$pairRows,""" +
      s""""adc_topk_sec":$fullSec,"topk_rows":$fullRows,""" +
      s""""brute_topk_sec":$bfSec,"brute_rows":$bfRows}""")
    spark.stop()
  }
}

/** Prints the AQE-final executed plan of the ADC pair stage. */
object PqPlan {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local("graft-pq-plan", logLevel = "ERROR")
    val emb = graft.Tables.embeddings(spark, args.headOption.getOrElse("/root/testdata/sf0.01"))
    val pairs = graft.operators.Quantization.adcPairs(
      emb, org.apache.spark.sql.functions.col("vec_id") % 100 === 0, None)
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.col("adist")))
    pairs.collect()
    println(pairs.queryExecution.executedPlan.toString.take(8000))
    spark.stop()
  }
}

/** Microbenchmark: PqAdcDist vs ArrayDot on materialized columns, no
  * join in sight — isolates expression cost from join-context cost.
  */
object PqMicro {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local("graft-pq-micro", logLevel = "ERROR")
    import org.apache.spark.sql.functions._
    val n = 4000000
    val df = spark.range(n).toDF("id")
      .withColumn("codes", expr("transform(sequence(0, 7), j -> CAST((id + j) % 16 AS INT))"))
      .withColumn("lut", expr("transform(sequence(0, 127), i -> CAST(i AS DOUBLE) * 0.5)"))
      .withColumn("a", expr("transform(sequence(0, 63), i -> CAST(i + id % 7 AS DOUBLE))"))
      .withColumn("b", expr("transform(sequence(0, 63), i -> CAST(i * 2 AS DOUBLE))"))
      .localCheckpoint()
    def t(label: String)(body: => Any): Unit = {
      body
      val secs = Seq.fill(3) {
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      println(s"""{"bench":"$label","sec":${secs.min}}""")
    }
    t("baseline_sum_id")(df.agg(sum(col("id"))).collect())
    t("pq_adc_dist")(df.agg(sum(
      graft.functions.PqAdcDist(col("codes"), col("lut")))).collect())
    t("array_dot")(df.agg(sum(
      graft.functions.ArrayDot(col("a"), col("b")))).collect())
    spark.stop()
  }
}
