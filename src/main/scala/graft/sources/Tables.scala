package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

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
  def events: DataFrame = t("events")
  def documents: DataFrame = t("documents")
  def embeddings: DataFrame = t("embeddings")

  /** Register every table as a temp view so the SQL surface (`spark.sql`)
    * and the DataFrame surface answer the same catalog — reference teaches
    * they are one engine (303-spark-sql/README.md:83-93).
    */
  def registerAll(): Unit =
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings")
      .foreach(n => t(n).createOrReplaceTempView(n))
}
