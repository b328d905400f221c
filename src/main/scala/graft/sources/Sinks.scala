package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Sink layer (SURVEY §2.1 K1–K5, K7): file and table writers.
  *
  * All writers default to `overwrite` — the corpus's output-dir
  * idempotency contract (K7): re-running a job replaces its output
  * instead of failing on the existing directory.
  */
object Sinks {

  /** K1: text sink — single string column, one line per row. */
  def writeText(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).text(path)

  /** K2: JSON-lines sink; `append = true` matches the reference's
    * accumulate-batches mode (`303-spark-sql/README.md:55-60`).
    */
  def writeJson(df: DataFrame, path: String, append: Boolean = false): Unit =
    df.write.mode(if (append) SaveMode.Append else SaveMode.Overwrite)
      .json(path)

  /** CSV sink with header — the file-interchange twin of Ingest.readCsv. */
  def writeCsv(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("header", header.toString).csv(path)

  /** K3: parquet sink — the engine's canonical persistent format. */
  def writeParquet(df: DataFrame, path: String,
      partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(path)
  }

  /** ORC sink — the columnar-interchange alternative to parquet (same
    * predicate-pushdown/column-pruning contract, different ecosystem).
    */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  /** XML sink — Spark 4's native xml data source: one `rowTag` element
    * per row, values XML-escaped (numeric types serialize via
    * Java toString, which round-trips doubles exactly).
    */
  def writeXml(df: DataFrame, path: String, rowTag: String = "row"): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("rowTag", rowTag).format("xml").save(path)

  /** Parquet sink with per-column bloom filters — the point-lookup
    * complement to min/max stats and Z-ordering: on a random
    * high-cardinality key every row group's min/max spans the domain and
    * dictionaries don't build, so footer stats prune NOTHING for
    * `key = x`; a bloom filter answers "definitely not here" per row
    * group and the reader skips it. `ndv` sizes each filter (expected
    * distinct values per column; over-sizing costs bytes, under-sizing
    * costs false positives — at 100 TB set it from table stats).
    */
  def writeParquetWithBloom(df: DataFrame, path: String,
      bloomCols: Map[String, Long]): Unit = {
    var w = df.write.mode(SaveMode.Overwrite)
    bloomCols.foreach { case (c, ndv) =>
      w = w.option(s"parquet.bloom.filter.enabled#$c", "true")
        .option(s"parquet.bloom.filter.expected.ndv#$c", ndv.toString)
    }
    w.parquet(path)
  }

  /** Small-file compaction: rewrite a parquet directory into
    * ceil(totalBytes / targetBytes) files of roughly uniform size —
    * the maintenance pass that keeps scan task counts sane after many
    * small incremental appends (a 100-TB table fed by per-crawl batches
    * otherwise accretes millions of kilobyte files and every scan pays
    * one task per file). The repartition is a round-robin exchange, so
    * skewed input files cannot become skewed output files. Writes to a
    * separate directory (never in place: the source is the input of the
    * very job writing the output), returns the file count.
    *
    * The size probe lists RECURSIVELY, so a Hive-partitioned source
    * (data files under key=value subdirectories) is sized correctly —
    * but note the OUTPUT is a flat directory: partition discovery folds
    * the partition values into ordinary data columns (no rows or values
    * lost), so re-partition the output explicitly if the layout must
    * survive compaction.
    */
  def compactParquet(spark: org.apache.spark.sql.SparkSession, src: String,
      dst: String, targetBytes: Long = 128L << 20): Int = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    require(new org.apache.hadoop.fs.Path(src) !=
      new org.apache.hadoop.fs.Path(dst),
      "compaction must write to a different directory than it reads")
    val fs = new org.apache.hadoop.fs.Path(src)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val root = fs.makeQualified(new org.apache.hadoop.fs.Path(src))
    // Spark's hidden-file convention: any path segment below the root
    // starting with '_' or '.' is invisible to the read (think a
    // leftover _temporary/ from a failed write attempt full of orphaned
    // .parquet files) — the size probe must skip exactly what the
    // spark.read.parquet scan will skip, or the file count inflates.
    def hidden(path: org.apache.hadoop.fs.Path): Boolean = {
      var q = path
      while (q != null && q != root) {
        val n = q.getName
        if (n.startsWith("_") || n.startsWith(".")) return true
        q = q.getParent
      }
      false
    }
    var total = 0L
    val it = fs.listFiles(root, true)
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet") && !hidden(f.getPath))
        total += f.getLen
    }
    val n = math.max(1L, (total + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(src).repartition(n)
      .write.mode(SaveMode.Overwrite).parquet(dst)
    n
  }

  /** Shard-partitioned training export: materialize
    * [[graft.operators.Relational.shuffleShard]]'s deterministic
    * assignment as one directory per shard. The pre-write repartition
    * hashes on the shard id, so every shard's rows land in exactly one
    * task and each shard directory holds exactly one file — the layout
    * a sequential training reader wants. File count = shard count by
    * construction; pick `nShards` so each file lands near your target
    * size (total bytes / ~512 MB at 100 TB).
    */
  def writeShards(df: DataFrame, keyCol: String, nShards: Int,
      path: String): Unit =
    graft.operators.Relational.shuffleShard(df, keyCol, nShards)
      .repartition(nShards, org.apache.spark.sql.functions.col("shard"))
      .write.mode(SaveMode.Overwrite).partitionBy("shard").parquet(path)

  /** K4: managed-table sink (`303-spark-sql/README.md:61-66`). */
  def saveTable(df: DataFrame, table: String): Unit = {
    df.write.mode(SaveMode.Overwrite).saveAsTable(table)
    graft.core.CrashHook.fire(s"saveTable:$table")
  }

  /** K5: partitioned and/or bucketed managed table
    * (`303-spark-sql/README.md:71-79`). Bucketing by join/agg key is the
    * J2 enabler: two tables bucketed the same way join with ZERO shuffle —
    * at 100 TB this converts the nightly big-join from a full network
    * shuffle into a local merge of co-located buckets.
    */
  def saveTablePartitioned(
      df: DataFrame,
      table: String,
      partitionBy: Seq[String] = Nil,
      bucketBy: Option[(Int, Seq[String])] = None,
      sortBy: Seq[String] = Nil): Unit =
    writeTable(df, table, SaveMode.Overwrite, partitionBy, bucketBy, sortBy)

  /** Shared writer assembly for the overwrite/append table sinks. */
  private def writeTable(df: DataFrame, table: String, mode: SaveMode,
      partitionBy: Seq[String], bucketBy: Option[(Int, Seq[String])],
      sortBy: Seq[String]): Unit = {
    var w = df.write.mode(mode).format("parquet")
    if (partitionBy.nonEmpty) w = w.partitionBy(partitionBy: _*)
    bucketBy.foreach { case (n, cols) =>
      w = w.bucketBy(n, cols.head, cols.tail: _*)
      if (sortBy.nonEmpty) w = w.sortBy(sortBy.head, sortBy.tail: _*)
    }
    w.saveAsTable(table)
    graft.core.CrashHook.fire(
      s"writeTable:${if (mode == SaveMode.Append) "append" else "overwrite"}:$table")
  }

  /** Append into an existing partitioned/bucketed managed table with the
    * same layout spec — the incremental-growth form of
    * [[saveTablePartitioned]]: new partitions appear, existing buckets
    * gain files, nothing is rewritten. Spark validates the bucket spec
    * against the catalog, so a mismatched append fails loudly instead of
    * silently corrupting the co-location contract.
    */
  def appendTablePartitioned(
      df: DataFrame,
      table: String,
      partitionBy: Seq[String] = Nil,
      bucketBy: Option[(Int, Seq[String])] = None,
      sortBy: Seq[String] = Nil): Unit =
    writeTable(df, table, SaveMode.Append, partitionBy, bucketBy, sortBy)

  /** O5: single sorted output file — an explicit, deliberate funnel to one
    * writer task (the reference's coalesce(1) pattern). Only sane for
    * small final results; the sort is global.
    */
  def writeSingleSorted(df: DataFrame, path: String,
      sortCols: Seq[String]): Unit =
    df.orderBy(sortCols.map(org.apache.spark.sql.functions.col): _*)
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(path)
}
