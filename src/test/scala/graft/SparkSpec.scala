package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.sources.Tables

/** Shared local session + sf0.001 tables for the whole suite. */
object SparkSpec {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir",
        s"/tmp/graft-warehouse-${System.nanoTime()}")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sfDir = "/root/testdata/sf0.001"
  lazy val tables: Tables = Tables(spark, sfDir)
}

trait SparkSpec extends AnyFunSuite with Matchers {
  // Stable val (not def) so `import spark.implicits._` compiles in specs.
  lazy val spark: SparkSession = SparkSpec.spark
  def tables: Tables = SparkSpec.tables

  /** Physical-plan string for plan-shape assertions. */
  def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString()

  /** Rows as a set of Seq[Any] — order-insensitive comparison. */
  def rowSet(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet
}
