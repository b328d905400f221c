package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
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

  /** The events table carries a nanosecond parquet timestamp, which Spark
    * has no native type for. Sessions set
    * `spark.sql.legacy.parquet.nanosAsLong=true` so the scan succeeds (ts
    * arrives as LONG nanos) and the accessor converts to a microsecond
    * TIMESTAMP — lossless for this data (values are µs-grained) and
    * matching engines (DuckDB) that read TIMESTAMP_NS natively.
    */
  def events: DataFrame = {
    val df = t("events")
    if (df.schema("ts").dataType == LongType)
      df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else df
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
