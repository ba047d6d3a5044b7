package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-K as a typed [[Aggregator]] — the aggregation-side
  * alternative to `row_number over (...) <= k`: each partial aggregate
  * keeps at most k (measure, id) pairs, so only k rows per group per
  * mapper cross the shuffle (the same property WindowGroupLimit gives
  * the window formulation), and the result can sit next to other
  * measures in one `groupBy.agg` pass instead of a second window stage.
  *
  * Ordering: measure descending, id ascending on ties — matching the
  * engine's deterministic top-K convention (SURVEY.md §7.5).
  */
case class TopKAggregator(k: Int)
    extends Aggregator[(Long, Long), Seq[(Long, Long)], Seq[(Long, Long)]] {
  require(k > 0, "k must be positive")

  private def best(items: Seq[(Long, Long)]): Seq[(Long, Long)] =
    items.sortBy { case (measure, id) => (-measure, id) }.take(k)

  override def zero: Seq[(Long, Long)] = Seq.empty

  override def reduce(buf: Seq[(Long, Long)], in: (Long, Long)): Seq[(Long, Long)] =
    best(buf :+ in)

  override def merge(a: Seq[(Long, Long)], b: Seq[(Long, Long)]): Seq[(Long, Long)] =
    best(a ++ b)

  override def finish(buf: Seq[(Long, Long)]): Seq[(Long, Long)] = best(buf)

  override def bufferEncoder: Encoder[Seq[(Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(Long, Long)]] = bufferEncoder
}
