package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** U1/A4: typed `Aggregator` — the combiner-safe composite accumulator
  * the reference builds by hand as `MyValue(sum, count) implements
  * WritableComparable` for its average-with-combiner MapReduce job
  * (`201-mapreduce/src/main/java/exercise4complete/
  * Ex4AverageWordLengthWithCombiner.java:68-108`).
  *
  * The contract that made MyValue necessary — the merge must be
  * associative so partial (map-side) aggregates are correct — is exactly
  * `Aggregator.merge`. Sums stay in Long (exact, order-independent), the
  * division to Double happens once in `finish`, so results are identical
  * regardless of partitioning — the property the reference's
  * integer-division combiner version violates (SURVEY §7.4.3).
  */
object LongAvg extends Aggregator[Long, (Long, Long), Double] {
  override def zero: (Long, Long) = (0L, 0L)
  override def reduce(b: (Long, Long), a: Long): (Long, Long) =
    (b._1 + a, b._2 + 1)
  override def merge(x: (Long, Long), y: (Long, Long)): (Long, Long) =
    (x._1 + y._1, x._2 + y._2)
  override def finish(r: (Long, Long)): Double =
    if (r._2 == 0) 0.0
    else BigDecimal(r._1.toDouble / r._2)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
  override def bufferEncoder: Encoder[(Long, Long)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
