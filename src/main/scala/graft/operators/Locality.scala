package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Space-filling-curve data-layout operators: cluster a table along a
  * Morton (Z-order) curve over two or more dimensions so that parquet
  * footer min/max statistics on EACH dimension become selective for
  * multi-dimensional box predicates.
  *
  * Why this matters at 100 TB: sorting on a single column makes that
  * column's row-group stats tight but leaves every other column's stats
  * spanning the full domain — a filter on a second dimension prunes
  * nothing. Interleaving the dimensions' bits means each contiguous
  * curve segment (= one output file / row group) covers a compact
  * hyper-rectangle, so min/max pruning works for *all* participating
  * dimensions at once. This is the same layout trick Delta's OPTIMIZE
  * ZORDER BY applies; here it is a pure plan-level rewrite — a
  * codegen'd expression plus `repartitionByRange` — with no engine
  * support needed.
  */
object Locality {

  /** Morton (Z-order) value of `cols`: bit `b` of dimension `i` lands at
    * interleaved position `b * n + i`. Inputs must already be
    * non-negative and `< 2^bits` (see [[quantizeLong]]); bits above
    * `bits` are ignored by construction.
    *
    * Built as a static fold of shift/mask/or over Spark's built-in
    * bitwise functions, so the whole thing stays inside whole-stage
    * codegen — no UDF, no boxing, `bits * n` long ops per row.
    */
  def zValue(cols: Seq[Column], bits: Int = 16): Column = {
    val n = cols.size
    require(n >= 2, "zValue interleaves at least two dimensions")
    require(bits >= 1 && n * bits <= 62,
      s"n*bits = ${n * bits} must stay within a positive long")
    val terms =
      for (b <- 0 until bits; (c, i) <- cols.zipWithIndex)
        yield shiftleft(shiftright(c.cast("long"), b).bitwiseAND(lit(1L)),
          b * n + i)
    terms.reduce(_ bitwiseOR _)
  }

  /** Clamp-quantize a long column into `[0, 2^bits)` buckets given
    * inclusive domain bounds. Integer arithmetic only (exact, portable):
    * bucket = (clamp(v) - lo) * 2^bits / span. On a real cluster `lo`/`hi`
    * come from table statistics or a cheap agg — they need only bound the
    * domain, not be tight.
    */
  def quantizeLong(c: Column, lo: Long, hi: Long, bits: Int): Column = {
    require(hi > lo, "quantizeLong needs a non-empty domain")
    val buckets = 1L << bits
    val span = hi - lo + 1
    require(span <= Long.MaxValue / buckets,
      "span * 2^bits must not overflow; quantize a coarser domain first")
    val clamped = least(greatest(c.cast("long"), lit(lo)), lit(hi))
    ((clamped - lit(lo)) * lit(buckets) / lit(span)).cast("long")
  }

  /** Re-layout `df` along the Z-curve of `z`: range-partition into
    * `files` output partitions by z-value (each file then owns one
    * contiguous curve segment = one compact box of the key space) and
    * sort within partitions (so row groups *inside* each file are tight
    * too). Write the result with any parquet sink; subsequent scans with
    * box predicates on the interleaved dimensions prune at both file and
    * row-group granularity.
    *
    * `repartitionByRange` samples z to pick balanced split points — one
    * extra pass over the curve values, no driver-side materialization —
    * exactly what you want at 100 TB where a static split table would
    * need maintenance.
    */
  def clusterByZ(df: DataFrame, z: Column, files: Int): DataFrame =
    df.repartitionByRange(files, z).sortWithinPartitions(z)
}
