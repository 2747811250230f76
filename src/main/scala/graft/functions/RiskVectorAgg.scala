package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed-UDAF path (SURVEY.md §2.10 optional): the per-key risk vector
  * as a single `Aggregator`, demonstrating custom aggregation where the
  * declarative `groupBy().agg()` form (RiskScoring.riskTable) is ever
  * insufficient.
  *
  * The buffer carries exact distinct-sets, so per-group memory is
  * O(distinct values) — fine for bounded domains (event types), wrong
  * for unbounded ones at 100 TB; there the declarative plan with
  * `approx_count_distinct` (q32) is the scale path. This class exists
  * to demonstrate the typed path, not to replace the hash aggregate.
  */
object RiskVectorAgg {

  final case class EventRow(user_id: Long, event_type: String,
      event_id: Long, value: Double)

  final case class RiskBuf(n: Long, total: Double,
      types: Set[String], purchases: Set[Long])

  final case class RiskVec(n_events: Long, n_types: Long,
      n_purchases: Long, total_value: Double, safety_score: Double)

  val agg: Aggregator[EventRow, RiskBuf, RiskVec] =
    new Aggregator[EventRow, RiskBuf, RiskVec] {
      def zero: RiskBuf = RiskBuf(0L, 0.0, Set.empty, Set.empty)

      def reduce(b: RiskBuf, e: EventRow): RiskBuf = RiskBuf(
        b.n + 1, b.total + e.value, b.types + e.event_type,
        if (e.event_type == "purchase") b.purchases + e.event_id else b.purchases)

      def merge(a: RiskBuf, b: RiskBuf): RiskBuf = RiskBuf(
        a.n + b.n, a.total + b.total, a.types ++ b.types,
        a.purchases ++ b.purchases)

      def finish(b: RiskBuf): RiskVec = {
        val ownership = 100.0 * (1.0 / (1 + b.types.size))
        val liquidity = 100.0 * (1.0 / (1 + b.purchases.size))
        val concentration = b.n / (1.0 + b.types.size)
        val rug = ownership * 0.4 + liquidity * 0.4 + concentration * 0.2
        RiskVec(b.n, b.types.size.toLong, b.purchases.size.toLong, b.total,
          math.max(0.0, 100.0 - rug))
      }

      def bufferEncoder: Encoder[RiskBuf] = Encoders.kryo[RiskBuf]
      def outputEncoder: Encoder[RiskVec] = Encoders.product[RiskVec]
    }
}
