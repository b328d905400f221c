package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries frequent-items summary as a typed partial aggregate: the
  * mergeable-summaries form (Agarwal et al., ACM TODS 2013) whose buffer
  * holds at most `2k` (value, count) entries regardless of input size —
  * the 100-TB heavy-hitter shape, where a full `groupBy(value)` would
  * shuffle every distinct value and the distinct-value count is
  * billions.
  *
  * Guarantee: every value with true frequency > N/(k+1) survives in the
  * final summary (each compress subtracts the (k+1)-th largest count m
  * from all entries, destroying ≥ m·(k+1) of total mass, so the summed
  * under-count per value is ≤ N/(k+1)). The surviving SET depends on
  * partition order — callers needing a deterministic answer recount the
  * candidates exactly ([[graft.operators.Sketches.heavyHitters]]), which
  * the recall guarantee makes exhaustive.
  *
  * Buffer is (entries, n): n tracks total rows so the caller gets the
  * threshold base from the same single pass. Compression is amortized
  * like [[TopKAgg]]: grow to 2k, cut back to < k, O(1)/row amortized
  * with immutable-map updates in between.
  */
class FrequentItemsAgg(k: Int)
    extends Aggregator[String, (Map[String, Long], Long),
      (Seq[(String, Long)], Long)] {
  require(k >= 1, s"FrequentItemsAgg: k must be >= 1, got $k")

  private def compress(m: Map[String, Long]): Map[String, Long] =
    FrequentItemsAgg.compress(m, k)

  override def zero: (Map[String, Long], Long) = (Map.empty, 0L)

  override def reduce(b: (Map[String, Long], Long),
      v: String): (Map[String, Long], Long) = {
    val grown = b._1 + (v -> (b._1.getOrElse(v, 0L) + 1L))
    (if (grown.size > 2 * k) compress(grown) else grown, b._2 + 1L)
  }

  override def merge(x: (Map[String, Long], Long),
      y: (Map[String, Long], Long)): (Map[String, Long], Long) = {
    val combined = y._1.foldLeft(x._1) { case (acc, (v, c)) =>
      acc + (v -> (acc.getOrElse(v, 0L) + c))
    }
    (compress(combined), x._2 + y._2)
  }

  /** Entries WITH their residual counts (value-sorted for determinism
    * of the encoding — the counts themselves are partition-order
    * dependent; see the class doc): callers wanting only candidates
    * take `_1.map(_._1)`, callers merging summaries across batches
    * (the streaming heavy-hitter state) need the counts to keep the
    * merged under-count bounded.
    */
  override def finish(r: (Map[String, Long], Long)): (Seq[(String, Long)], Long) =
    (r._1.toSeq.sortBy(_._1), r._2)

  override def bufferEncoder: Encoder[(Map[String, Long], Long)] =
    ExpressionEncoder[(Map[String, Long], Long)]()
  override def outputEncoder: Encoder[(Seq[(String, Long)], Long)] =
    ExpressionEncoder[(Seq[(String, Long)], Long)]()
}

object FrequentItemsAgg {
  /** The Misra–Gries compress: subtract the (k+1)-th largest count from
    * every entry, keep the strictly positive — at most k survive, and
    * total destroyed mass is ≥ cut·(k+1), which is what bounds the
    * per-value under-count by N/(k+1). Shared by the per-partition
    * aggregate above and the cross-batch streaming merge
    * ([[graft.streaming.Streams.mergedHeavyHitters]]).
    */
  def compress(m: Map[String, Long], k: Int): Map[String, Long] =
    if (m.size <= k) m
    else {
      val cut = m.values.toSeq.sortBy(-_).apply(k)
      m.collect { case (v, c) if c > cut => v -> (c - cut) }
    }
}
