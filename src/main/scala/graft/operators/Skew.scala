package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation operators: explicit key salting for the cases AQE's
  * runtime skew-join splitting doesn't reach (a single pathological key
  * in an aggregation buffer, or a skewed shuffle join whose plan AQE
  * can't re-split, e.g. under bucketing or inside a stateful stage).
  *
  * Both patterns are pure plan rewrites — no sampling jobs, no driver
  * round-trips — so they compose with everything else in the library.
  */
object Skew {

  /** Deterministic per-row salt in [0, salts): hashes a stable row
    * expression rather than using rand() so re-runs and retried tasks
    * produce identical assignments (a lost-task retry with rand() salt
    * double-counts rows under speculative execution).
    */
  private def saltOf(c: Column, salts: Int): Column =
    pmod(xxhash64(c), lit(salts.toLong)).cast("int")

  /** Two-phase salted aggregation: groupBy(key, salt) partial-aggregates
    * a hot key into `salts` independent buffers spread across reducers,
    * then a tiny second aggregation (≤ salts rows per key) merges them.
    * Use for agg states that GROW with the group (collect_list/set,
    * large maps) where Spark's map-side partial aggregation can't bound
    * the hot key's single reducer buffer. sum/count states are constant-
    * size and don't need this.
    */
  def saltedSumCount(df: DataFrame, keyCol: String, valueCol: String,
      salts: Int = 16): DataFrame =
    df
      .withColumn("_salt", saltOf(col(valueCol), salts))
      .groupBy(col(keyCol), col("_salt"))
      .agg(sum(col(valueCol)).as("_psum"), count(lit(1)).as("_pcnt"))
      .groupBy(keyCol)
      .agg(sum("_psum").as("sum_value"), sum("_pcnt").as("cnt"))

  /** Salted shuffle join for a skewed LEFT side against a small-ish right
    * side: the left's hot keys spread over `salts` sub-keys, the right
    * side is replicated `salts`× (explode of a literal range — cheap for
    * dimension-sized tables), and the join key becomes (key, salt). The
    * hot key's rows now land on `salts` reducers instead of one.
    * Output columns = left columns ++ right columns (minus the right key).
    */
  def saltedJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, salts: Int = 16): DataFrame = {
    // row-position salt: any row of a hot key may land in any bucket;
    // monotonically_increasing_id is deterministic per (partition, offset)
    // so task retries re-derive the same assignment
    val saltedLeft = left.withColumn(
      "_salt", pmod(monotonically_increasing_id(), lit(salts.toLong)).cast("int"))
    val saltedRight = right.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLeft.join(saltedRight,
      saltedLeft(leftKey) === saltedRight(rightKey) &&
        saltedLeft("_salt") === saltedRight("_salt"))
      .drop("_salt").drop(rightKey)
  }
}
