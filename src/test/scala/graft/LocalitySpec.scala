package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.operators.Locality

class LocalitySpec extends SparkSpec {
  import spark.implicits._

  /** Reference Morton interleave, written the pedestrian way. */
  private def zRef(coords: Seq[Long], bits: Int): Long = {
    var z = 0L
    val n = coords.size
    for (b <- 0 until bits; i <- 0 until n)
      z |= ((coords(i) >> b) & 1L) << (b * n + i)
    z
  }

  test("zValue matches the reference interleave on random coordinates") {
    val pts = (0 until 500).map { i =>
      // deterministic pseudo-random coords via splitmix-ish mixing
      val h = i * 0x9e3779b97f4a7c15L
      ((h >>> 13) & 1023L, (h >>> 29) & 1023L)
    }
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"),
        Locality.zValue(Seq(col("x"), col("y")), bits = 10).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) => z shouldBe zRef(Seq(x, y), 10) }
  }

  test("zValue interleaves three dimensions") {
    val got = Seq((5L, 3L, 6L)).toDF("a", "b", "c")
      .select(Locality.zValue(Seq(col("a"), col("b"), col("c")), bits = 4))
      .as[Long].head()
    got shouldBe zRef(Seq(5L, 3L, 6L), 4)
  }

  test("zValue rejects configurations wider than a long") {
    an[IllegalArgumentException] should be thrownBy
      Locality.zValue(Seq(col("a"), col("b")), bits = 32)
    an[IllegalArgumentException] should be thrownBy
      Locality.zValue(Seq(col("a")), bits = 8)
  }

  test("quantizeLong buckets exactly and clamps out-of-domain values") {
    val got = Seq(-50L, 0L, 999L, 1000L, 1999L, 5000L).toDF("v")
      .select(Locality.quantizeLong(col("v"), lo = 0L, hi = 1999L, bits = 4)
        .as("b"))
      .as[Long].collect()
    // span 2000 over 16 buckets = 125 per bucket; clamp below to 0, above
    // to the last in-domain value
    got shouldBe Array(0L, 0L, 7L, 8L, 15L, 15L)
  }

  /** Reference Hilbert xy2d (public-domain fold: quadrant select,
    * full-grid reflect, axis swap).
    */
  private def hRef(x0: Long, y0: Long, bits: Int): Long = {
    var (x, y, d) = (x0, y0, 0L)
    val m = (1L << bits) - 1
    for (i <- (0 until bits).reverse) {
      val s = 1L << i
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        val (fx, fy) = if (rx == 1) (m - x, m - y) else (x, y)
        x = fy; y = fx
      }
    }
    d
  }

  test("withHilbert matches the reference xy2d on random coordinates") {
    val pts = (0 until 500).map { i =>
      val h = i * 0x9e3779b97f4a7c15L
      ((h >>> 13) & 1023L, (h >>> 29) & 1023L)
    }
    val got = Locality.withHilbert(
      pts.toDF("x", "y"), col("x"), col("y"), bits = 10)
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, h) => h shouldBe hRef(x, y, 10) }
  }

  test("Hilbert index is a bijection and consecutive cells are adjacent") {
    // exhaustive 8x8 grid: indexes must cover [0, 64) exactly, and each
    // consecutive index pair must be Manhattan distance 1 apart — the
    // defining property that gives Hilbert its seam-free locality
    val grid = for (x <- 0L until 8L; y <- 0L until 8L) yield (x, y)
    val cells = Locality.withHilbert(
      grid.toDF("x", "y"), col("x"), col("y"), bits = 3)
      .as[(Long, Long, Long)].collect()
      .map { case (x, y, h) => h -> (x, y) }.toMap
    cells.keySet shouldBe (0L until 64L).toSet
    (0L until 63L).foreach { d =>
      val (x1, y1) = cells(d); val (x2, y2) = cells(d + 1)
      (math.abs(x1 - x2) + math.abs(y1 - y2)) shouldBe 1L
    }
  }

  test("zValue and withHilbert stay inside one whole-stage-codegen span") {
    val df = spark.range(100).select(
      pmod(col("id"), lit(32L)).as("x"), pmod(col("id"), lit(17L)).as("y"))
    val z = df.select(Locality.zValue(Seq(col("x"), col("y")), 10))
    val h = Locality.withHilbert(df, col("x"), col("y"), bits = 10)
    // a single *(1) span = the whole index computation is one generated
    // function over the scan; no UDF/exchange/sort breaks the pipeline
    plan(z) should include("*(1)")
    plan(z) should not include "*(2)"
    plan(h) should include("*(1)")
    plan(h) should not include "*(2)"
  }

  /** Rows the parquet scan actually emitted (post row-group/page pruning,
    * pre residual filter) for a collected DataFrame.
    */
  private def scanRows(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect()
    df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s.metrics("numOutputRows").value
    }.sum
  }

  test("parquet bloom filters prune point lookups where min/max cannot") {
    val dir = Files.createTempDirectory("graft-bloom").toString
    // random 64-bit keys: every file's min/max spans the whole domain and
    // no dictionary builds, so footer stats are useless for equality
    val df = spark.range(65536).select(
      col("id"), xxhash64(col("id")).as("key"))
    df.repartitionByRange(16, col("id"))
      .write.mode("overwrite").parquet(s"$dir/plain")
    graft.sources.Sinks.writeParquetWithBloom(
      df.repartitionByRange(16, col("id")),
      s"$dir/bloom", Map("key" -> 8192L))

    val needle = df.filter(col("id") === 12345L)
      .select("key").as[Long].head()
    def lookup(p: String) =
      spark.read.parquet(p).where(col("key") === needle)
    lookup(s"$dir/bloom").count() shouldBe lookup(s"$dir/plain").count()
    // plain layout: stats can't exclude anything, all 16 files read in
    // full; bloom layout: only files whose filter (maybe falsely)
    // matches are read — a small fraction
    scanRows(lookup(s"$dir/plain")) shouldBe 65536L
    scanRows(lookup(s"$dir/bloom")) should be < (65536L / 4)
  }

  test("Z-clustered layout prunes a 2-D box query; linear layout reads everything") {
    val dir = Files.createTempDirectory("graft-zorder").toString
    // 65k rows, two independent uniform dimensions in [0, 1024)
    val base = spark.range(65536).select(
      col("id"),
      pmod(xxhash64(col("id")), lit(1024L)).as("x"),
      pmod(xxhash64(col("id"), lit(1)), lit(1024L)).as("y"))

    // linear layout: written in id order — every file's (x, y) min/max
    // stats span the whole domain, so footer pruning is powerless
    base.repartitionByRange(64, col("id"))
      .write.mode("overwrite").parquet(s"$dir/linear")

    val z = Locality.zValue(Seq(col("x"), col("y")), bits = 10)
    Locality.clusterByZ(base, z, files = 64)
      .write.mode("overwrite").parquet(s"$dir/zorder")

    def boxQuery(path: String) = spark.read.parquet(path)
      .where(col("x").between(96, 159) && col("y").between(512, 575))

    // both layouts hold the same rows and answer the box identically
    rowSet(boxQuery(s"$dir/zorder")) shouldBe rowSet(boxQuery(s"$dir/linear"))

    Locality.clusterByZ(
      Locality.withHilbert(base, col("x"), col("y"), bits = 10),
      col("hval"), files = 64)
      .drop("hval")
      .write.mode("overwrite").parquet(s"$dir/hilbert")

    val linearRead = scanRows(boxQuery(s"$dir/linear"))
    val zRead = scanRows(boxQuery(s"$dir/zorder"))
    val hRead = scanRows(boxQuery(s"$dir/hilbert"))
    // 64 curve segments tile the 1024x1024 space into ~8x8 regions of
    // ~128x128; a 64x64 box intersects at most 4 of them, so the scan
    // should read a small fraction of what the linear layout reads
    linearRead shouldBe 65536L
    zRead should be < (linearRead / 4)
    hRead should be < (linearRead / 4)
  }

  test("z-clustered layout prunes 2-D range scans via min/max stats") {
    val dir = Files.createTempDirectory("graft-zclust").toString
    val n = 1 << 16
    // x/y decorrelated from row order: every plain row group spans the
    // whole domain, so min/max stats alone can prune NOTHING
    val df = spark.range(n).select(
      pmod(col("id") * 2654435761L, lit(1024L)).as("x"),
      pmod(col("id") * 40503L, lit(1024L)).as("y"))
    df.write.mode("overwrite").parquet(s"$dir/plain")
    Locality.clusterByZ(df,
      Locality.zValue(Seq(col("x"), col("y")), 10), files = 16)
      .write.mode("overwrite").parquet(s"$dir/clustered")
    def rect(p: String) = spark.read.parquet(p)
      .filter(col("x") < 64 && col("y") < 64)
    rect(s"$dir/plain").count() shouldBe rect(s"$dir/clustered").count()
    scanRows(rect(s"$dir/plain")) shouldBe n.toLong // nothing pruned
    // the z-curve makes both columns locally narrow per file, so the
    // same rectangle touches a handful of files/row groups
    scanRows(rect(s"$dir/clustered")) should be < (n.toLong / 4)
  }
}
