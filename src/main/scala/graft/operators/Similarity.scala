package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the embedding column.
  *
  * q26 is the exact brute-force cosine top-k baseline: the (small) query
  * set is broadcast against the corpus, so the corpus side streams with
  * no shuffle; ranking is a per-query window. At 100 TB the same plan
  * holds — broadcast queries, scan corpus once, TakeOrdered per query.
  * An LSH/IVF-bucketed variant rides on Dedup's band-join machinery.
  *
  * Float→double parity: both engines widen the float components to
  * double and fold products left-to-right, so dot products, norms and
  * cosines are bit-identical (IEEE ops on identical operand sequences).
  */
object Similarity {

  private val TopK = 5
  private val QueryStride = 100 // query set = vec_id % stride == 0

  private def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  private def sumFold(arr: Column): Column =
    aggregate(arr, lit(0.0), (acc, x) => acc + x)

  def dot(a: Column, b: Column): Column = sumFold(zip_with(a, b, (x, y) => x * y))

  def norm(v: Column): Column = sqrt(sumFold(transform(v, x => x * x)))

  /** Exact top-k cosine neighbors for each query vector. */
  def cosineTopK(embeddings: DataFrame, queryPred: Column, k: Int): DataFrame = {
    val base = embeddings
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("nrm", norm(col("v")))
    val q = base.filter(queryPred)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
    val c = base
      .select(col("vec_id").as("nid"), col("v").as("cv"), col("nrm").as("cn"))
    val sims = c.join(broadcast(q), col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        (dot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid").asc)
    sims.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }

  private def q26(s: SparkSession, d: String): DataFrame =
    cosineTopK(Tables.embeddings(s, d), col("vec_id") % QueryStride === 0, TopK)

  private val o26 =
    s"""WITH v AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |n AS (
       |  SELECT vec_id, v,
       |         sqrt(list_reduce(list_transform(v, x -> x * x), (a, b) -> a + b)) AS nrm
       |  FROM v),
       |p AS (
       |  SELECT q.vec_id AS qid, c.vec_id AS nid,
       |         list_reduce(list_transform(range(1, len(q.v) + 1), i -> q.v[i] * c.v[i]),
       |                     (a, b) -> a + b) / (q.nrm * c.nrm) AS sim
       |  FROM n q JOIN n c ON q.vec_id <> c.vec_id
       |  WHERE q.vec_id % $QueryStride = 0)
       |SELECT qid, nid, sim, rk FROM (
       |  SELECT qid, nid, sim,
       |         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid ASC) AS rk
       |  FROM p)
       |WHERE rk <= $TopK""".stripMargin

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("q26_cosine_topk", "brute-force cosine top-k (broadcast queries)", q26, Some(o26)))
}
