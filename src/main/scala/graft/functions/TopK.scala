package graft.functions

import scala.reflect.runtime.universe.TypeTag

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k accumulator: keeps the k largest (value, id) pairs,
  * ordered by value desc then id asc (the same deterministic tiebreak as
  * the window `row_number` form). Generic in the id type so numeric keys
  * (order ids) and string keys (document URIs) share one implementation.
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
class TopKAgg[I: TypeTag](k: Int)(implicit idOrd: Ordering[I])
    extends Aggregator[(Double, I), Seq[(Double, I)], Seq[(Double, I)]] {

  private val pairOrd: Ordering[(Double, I)] =
    Ordering.Tuple2(Ordering.Double.TotalOrdering.reverse, idOrd)

  private def top(s: Seq[(Double, I)]): Seq[(Double, I)] =
    s.sorted(pairOrd).take(k)

  override def zero: Seq[(Double, I)] = Nil

  override def reduce(b: Seq[(Double, I)],
      a: (Double, I)): Seq[(Double, I)] = {
    val grown = a +: b
    if (grown.length > 2 * k) top(grown) else grown
  }

  override def merge(x: Seq[(Double, I)],
      y: Seq[(Double, I)]): Seq[(Double, I)] = top(x ++ y)

  override def finish(r: Seq[(Double, I)]): Seq[(Double, I)] = top(r)

  override def bufferEncoder: Encoder[Seq[(Double, I)]] =
    ExpressionEncoder[Seq[(Double, I)]]()
  override def outputEncoder: Encoder[Seq[(Double, I)]] =
    ExpressionEncoder[Seq[(Double, I)]]()
}
