package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.LongType

/** Typed access to the driver's TPC-H-ish testdata directory
  * (`TESTDATA.md`): one parquet file per table.
  *
  * Parquet is the engine's canonical columnar source: scans get predicate
  * pushdown, column pruning, and vectorized decoding for free — at 100 TB the
  * difference between a pruned scan and a full scan is the whole job.
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame = t("region")
  def nation: DataFrame = t("nation")
  def customer: DataFrame = t("customer")
  def supplier: DataFrame = t("supplier")
  def part: DataFrame = t("part")
  def orders: DataFrame = t("orders")
  def lineitem: DataFrame = t("lineitem")

  /** The events table's `ts` has shipped in two parquet shapes:
    * nanosecond timestamps (no native Spark type — sessions set
    * `spark.sql.legacy.parquet.nanosAsLong=true` so the scan yields LONG
    * nanos, converted here to a µs timestamp, lossless for this
    * µs-grained data) and, in newer driver data, plain `timestamp[us]`
    * without a zone (read as TIMESTAMP_NTZ). Either way the accessor
    * lands on session-local TIMESTAMP: `unix_micros`, long casts and
    * streaming watermarks all reject NTZ, and under the repo's fixed UTC
    * session the NTZ→TIMESTAMP cast is value-identical (the wall clock
    * IS the UTC instant, matching DuckDB's naive read).
    */
  def events: DataFrame = {
    val df = t("events")
    val asTimestamp =
      if (df.schema("ts").dataType == LongType)
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      else df
    asTimestamp.withColumn("ts", col("ts").cast("timestamp"))
  }
  def documents: DataFrame = t("documents")
  def embeddings: DataFrame = t("embeddings")

  /** Register every table as a temp view so the SQL surface (`spark.sql`)
    * and the DataFrame surface answer the same catalog — reference teaches
    * they are one engine (303-spark-sql/README.md:83-93).
    */
  def registerAll(): Unit = {
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings")
      .foreach(n => t(n).createOrReplaceTempView(n))
    events.createOrReplaceTempView("events")
  }
}
