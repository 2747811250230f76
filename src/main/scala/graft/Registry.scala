package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named engine query with its DuckDB oracle.
  *
  * `run` is the Spark-first implementation over the fixture tables at
  * `dir`; `oracle` is ANSI SQL the driver executes in DuckDB over the
  * same parquet files (tables registered by name). Column names and
  * value semantics must match exactly — the driver sorts columns by
  * name and hash-compares values (see /root/repo/SURVEY.md §5).
  *
  * Determinism rules every query here follows:
  *   - output is a row SET (no order dependence); top-k selections
  *     carry explicit tiebreakers;
  *   - double aggregates go through DECIMAL(18,2) so both engines sum
  *     exactly, then cast back to DOUBLE;
  *   - timestamps are rendered as strings (never raw timestamp
  *     columns, which differ in physical precision between engines);
  *   - scalar double arithmetic keeps the exact same expression shape
  *     on both sides so IEEE evaluation is bit-identical.
  */
final case class GraftQuery(
    name: String,
    doc: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Registry {
  import graft.operators._

  /** All registered queries, in catalog order. */
  lazy val all: Seq[GraftQuery] =
    CoreRelational.queries ++
      RiskScoring.queries ++
      Windowed.queries ++
      Dedup.queries ++
      Similarity.queries ++
      Quantization.queries ++
      TextAnalysis.queries ++
      RiskExplain.queries ++
      ScaleVariants.queries ++
      Multimodal.queries ++
      TrainingData.queries ++
      Integrity.queries ++
      DomainCuration.queries

  lazy val byName: Map[String, GraftQuery] =
    all.map(q => q.name -> q).toMap
}
