package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k accumulator: keeps the k largest (value, id) pairs,
  * ordered by value desc then id asc (the same deterministic tiebreak as
  * the window `row_number` form).
  *
  * Scale rationale: the window formulation (`row_number().over(
  * partitionBy(g).orderBy(v)) <= k`) shuffles EVERY row to its group's
  * reducer and fully sorts each group — O(n) shuffle, O(n log n) sort,
  * spill risk on giant groups. This Aggregator is a partial aggregate:
  * each map task keeps at most 2k pairs per group, so the shuffle moves
  * ≤ 2k·partitions rows per group and no sort ever sees more than a few
  * k elements. Same associative-merge contract as [[LongAvg]].
  *
  * Pruning is amortized: buffers grow to 2k before being cut back to k,
  * so reduce is O(1) amortized per row.
  */
class TopKAgg(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  private def top(s: Seq[(Double, Long)]): Seq[(Double, Long)] =
    s.sortBy(t => (-t._1, t._2)).take(k)

  override def zero: Seq[(Double, Long)] = Nil

  override def reduce(b: Seq[(Double, Long)],
      a: (Double, Long)): Seq[(Double, Long)] = {
    val grown = a +: b
    if (grown.length > 2 * k) top(grown) else grown
  }

  override def merge(x: Seq[(Double, Long)],
      y: Seq[(Double, Long)]): Seq[(Double, Long)] = top(x ++ y)

  override def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] = top(r)

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
}
