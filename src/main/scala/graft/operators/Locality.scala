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
    // Spark's `/` divides in DOUBLE, so exactness requires the product to
    // stay within the 2^53 integer-exact double range — past it, boundary
    // values can round into the adjacent bucket. Domains wider than
    // 2^52/buckets should be right-shifted first (epoch-millis → seconds,
    // etc.); the require makes that a loud error instead of silent drift.
    require(span <= (1L << 52) / buckets,
      s"span * 2^bits = ${span}*$buckets exceeds the exact double range; " +
        "coarsen the domain (e.g. shift off low bits) first")
    val clamped = least(greatest(c.cast("long"), lit(lo)), lit(hi))
    ((clamped - lit(lo)) * lit(buckets) / lit(span)).cast("long")
  }

  /** Hilbert-curve index of `(x, y)` appended as column `out`: unlike the
    * Z-curve, the Hilbert curve has no "seams" (consecutive indexes are
    * always adjacent cells), so each contiguous index range covers an even
    * tighter box — it is the layout Delta/Databricks clustering moved to
    * after ZORDER for exactly this reason.
    *
    * The classic per-bit fold (Wikipedia's public-domain `xy2d`: quadrant
    * select, then reflect/rotate the frame) carries `(x, y, d)` state
    * across `bits` steps. Each step reads the previous step's outputs
    * SEVERAL times, so inlining it as one Column tree would duplicate the
    * subtree exponentially; instead each step materializes its state as
    * named projection columns (`withColumn` chain). Catalyst keeps the
    * chain as stacked projections inside ONE whole-stage-codegen stage —
    * each state var becomes a local in the generated code, evaluated once
    * per row, `O(bits)` ops total. No UDF, no custom expression needed.
    */
  def withHilbert(df: DataFrame, x: Column, y: Column, bits: Int = 16,
      out: String = "hval"): DataFrame = {
    require(bits >= 1 && 2 * bits <= 62,
      s"2*bits = ${2 * bits} must stay within a positive long")
    require(!df.columns.contains(out),
      s"input already has a '$out' column; pass a different `out`")
    require(!df.columns.exists(c => Seq("__hx_", "__hy_", "__hd_", "__hrx_",
      "__hry_").exists(c.startsWith)),
      "input uses withHilbert's reserved __h* state-column namespace")
    def xc(i: Int) = s"__hx_$i"
    def yc(i: Int) = s"__hy_$i"
    def dc(i: Int) = s"__hd_$i"
    var cur = df
      .withColumn(xc(bits), x.cast("long"))
      .withColumn(yc(bits), y.cast("long"))
      .withColumn(dc(bits), lit(0L))
    // steps walk s = 2^(bits-1) ... 1; step i consumes state i+1
    for (i <- (0 until bits).reverse) {
      val s = 1L << i
      val px = col(xc(i + 1)); val py = col(yc(i + 1)); val pd = col(dc(i + 1))
      val rx = when(px.bitwiseAND(lit(s)) > 0, lit(1L)).otherwise(lit(0L))
      val ry = when(py.bitwiseAND(lit(s)) > 0, lit(1L)).otherwise(lit(0L))
      cur = cur
        .withColumn(s"__hrx_$i", rx)
        .withColumn(s"__hry_$i", ry)
      val rxc = col(s"__hrx_$i"); val ryc = col(s"__hry_$i")
      // rotate/reflect the quadrant's frame (full-grid n-1 reflection, so
      // coordinates stay in [0, 2^bits)), then swap axes when ry == 0
      val m = (1L << bits) - 1
      val fx = when(ryc === 0 && rxc === 1, lit(m) - px).otherwise(px)
      val fy = when(ryc === 0 && rxc === 1, lit(m) - py).otherwise(py)
      cur = cur
        .withColumn(dc(i),
          pd + lit(s * s) * (lit(3L) * rxc).bitwiseXOR(ryc))
        .withColumn(xc(i), when(ryc === 0, fy).otherwise(px))
        .withColumn(yc(i), when(ryc === 0, fx).otherwise(py))
    }
    val keep = df.columns.map(col) :+ col(dc(0)).as(out)
    cur.select(keep.toIndexedSeq: _*)
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
