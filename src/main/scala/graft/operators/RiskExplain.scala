package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Row-wise risk explanation text (streamlit 1.3.txt:115-151) as a pure
  * when/otherwise + concat expression tree — the reference's only
  * UDF-shaped scalar logic, kept codegen-friendly instead of a Scala UDF.
  *
  * Divergences from the reference, by documented intent (SURVEY.md §7
  * hard-part 7):
  *   - streamlit 1.3.txt:146 reads `risk_data["Rug Risk Score"]`, a key
  *     that does not exist (the row holds "Jeet Risk Score") — a latent
  *     KeyError whenever 50 < score <= 80. All three rug branches here
  *     read the same (existing) rug-risk value.
  *   - presentation strings are ASCII tags instead of emoji, same
  *     threshold semantics (80 / 50 / 100).
  */
object RiskExplain {

  private def band(c: Column, hi: String, mid: String, lo: String): Column =
    when(c > 80, hi).when(c > 50, mid).otherwise(lo)

  /** Explanation column over a risk table (q10 schema). */
  def explain(ownership: Column, liquidity: Column, concentration: Column,
      rug: Column): Column =
    concat(
      band(ownership,
        "[HIGH] ownership: few holders",
        "[MED] ownership: concentrated",
        "[OK] ownership: distributed"),
      lit(" | "),
      band(liquidity,
        "[HIGH] liquidity: thin",
        "[MED] liquidity: limited",
        "[OK] liquidity: healthy"),
      lit(" | "),
      when(concentration > 100, "[HIGH] activity: suspected wash trading")
        .otherwise("[OK] activity: normal"),
      lit(" | "),
      band(rug,
        "[RUG] overall: major red flags",
        "[MED] overall: moderate risk",
        "[OK] overall: no major flags"))

  private def q31(s: SparkSession, d: String): DataFrame =
    RiskScoring.riskTable(Tables.events(s, d))
      .select(col("user_id"), col("safety_score"),
        explain(col("ownership_risk"), col("liquidity_risk"),
          col("concentration"), col("rug_risk")).as("explanation"))

  private val o31 = {
    def band(c: String, hi: String, mid: String, lo: String) =
      s"CASE WHEN $c > 80 THEN '$hi' WHEN $c > 50 THEN '$mid' ELSE '$lo' END"
    s"""WITH risk AS (${RiskScoring.riskSql})
       |SELECT user_id, safety_score,
       |       ${band("ownership_risk", "[HIGH] ownership: few holders",
                  "[MED] ownership: concentrated", "[OK] ownership: distributed")}
       |       || ' | ' ||
       |       ${band("liquidity_risk", "[HIGH] liquidity: thin",
                  "[MED] liquidity: limited", "[OK] liquidity: healthy")}
       |       || ' | ' ||
       |       CASE WHEN concentration > 100 THEN '[HIGH] activity: suspected wash trading'
       |            ELSE '[OK] activity: normal' END
       |       || ' | ' ||
       |       ${band("rug_risk", "[RUG] overall: major red flags",
                  "[MED] overall: moderate risk", "[OK] overall: no major flags")}
       |       AS explanation
       |FROM risk""".stripMargin
  }

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("q31_risk_explain", "threshold-banded risk explanation text", q31, Some(o31)))
}
