package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Ingest layer (SURVEY §2.1 S1–S9): every file-shaped source the
  * reference corpus reads, re-expressed on the Spark DataFrame readers.
  *
  * Design stance: where the reference hand-rolls parsers over RDD[String]
  * (substring offsets for NOAA ISD in `302-spark-opt/src/main/scala/
  * WeatherData.scala:2-12`, quote-aware regex CSV in
  * `MovieLensParser.scala:15-58`), we keep the PARSE as declarative column
  * expressions over the built-in readers — the parse stays inside
  * whole-stage codegen, malformed-row policy is the reader's (tested)
  * DROPMALFORMED, and the scan keeps pushdown/pruning. Only genuinely
  * positional formats (fixed-width) need explicit substring exprs.
  */
object Ingest {

  /** S1/S2: text lines from a file or directory, one row per line
    * (`301-spark-basics/resources/301-solutions.scala:3-4`). Parallelism
    * of the scan is governed by `spark.sql.files.maxPartitionBytes`; a
    * `minPartitions` floor (the RDD API's knob) maps to an explicit
    * repartition only when the scan produced fewer splits.
    */
  def readText(spark: SparkSession, path: String,
      minPartitions: Int = 0): DataFrame = {
    val df = spark.read.text(path)
    if (minPartitions > 0 && df.rdd.getNumPartitions < minPartitions)
      df.repartition(minPartitions)
    else df
  }

  /** One field of a fixed-width record: name + [from, until) char offsets
    * (0-based, reference convention) + target type.
    */
  final case class FixedField(name: String, from: Int, until: Int,
      cast: String = "string")

  /** S3: fixed-width record parse as pure substring/cast column
    * expressions (NOAA ISD shape, `WeatherData.scala:2-12`). `trim`
    * handles right-padding; empty → null via cast.
    */
  def parseFixedWidth(lines: DataFrame, fields: Seq[FixedField],
      lineCol: String = "value"): DataFrame =
    lines.select(fields.map { f =>
      trim(substring(col(lineCol), f.from + 1, f.until - f.from))
        .cast(f.cast).as(f.name)
    }: _*)

  /** The reference's weather record (usaf/wban/date/temperature +
    * validity, `WeatherData.scala:2-23`): temperature arrives as signed
    * tenths of °C at [87,92) with sentinel 9999, quality flag at char 92.
    * Sentinels become null temperature + valid=false (P9 missing-value
    * predicates), not magic values.
    */
  def parseWeather(lines: DataFrame): DataFrame =
    parseFixedWidth(lines, Seq(
      FixedField("usaf", 4, 10),
      FixedField("wban", 10, 15),
      FixedField("year", 15, 19),
      FixedField("month", 19, 21),
      FixedField("day", 21, 23),
      FixedField("temp_raw", 87, 92, "int"),
      FixedField("quality", 92, 93)))
      .select(
        col("usaf"), col("wban"), col("year"), col("month"), col("day"),
        when(abs(col("temp_raw")) < lit(9999),
          col("temp_raw").cast("double") / 10.0).as("temperature"),
        (col("quality") === "1" && abs(col("temp_raw")) < lit(9999))
          .as("valid"))

  /** S4/S5/S7: CSV with header/delimiter/quote control and DROPMALFORMED
    * policy (`MovieLensParser.scala:6,15-58`, `303-spark-sql/README.md:34`).
    * An explicit schema keeps the scan single-pass (no inference job) —
    * at 100 TB schema inference would read the data twice.
    */
  def readCsv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true, delimiter: String = ",",
      dropMalformed: Boolean = true): DataFrame = {
    val r = spark.read
      .schema(schema)
      .option("header", header.toString)
      .option("sep", delimiter)
      .option("quote", "\"")
      .option("escape", "\"")
      .option("mode", if (dropMalformed) "DROPMALFORMED" else "PERMISSIVE")
    r.csv(path)
  }

  /** S6: delimiter-separated values without a header row, with positional
    * column names (`303-spark-sql/README.md:168-170` toDF convention).
    */
  def readDsv(spark: SparkSession, path: String, schema: StructType,
      delimiter: String = "|"): DataFrame =
    readCsv(spark, path, schema, header = false, delimiter = delimiter)

  /** S9: JSON lines (self-describing; `303-spark-sql/README.md:15-17`).
    * Schema optional — pass one to skip inference on large inputs.
    */
  def readJson(spark: SparkSession, path: String,
      schema: Option[StructType] = None): DataFrame = {
    val r = spark.read
    schema.fold(r)(s => r.schema(s)).json(path)
  }

  /** ORC scan — self-describing columnar; pushdown and pruning reach the
    * reader exactly as with parquet.
    */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** XML scan — Spark 4's NATIVE xml data source (no external package):
    * one row per `rowTag` element. Schema optional but recommended —
    * like JSON, inference costs a full extra pass and types everything
    * it can't prove; an explicit StructType casts each element's text
    * back to the written types in the single read.
    */
  def readXml(spark: SparkSession, path: String,
      rowTag: String = "row",
      schema: Option[StructType] = None): DataFrame = {
    val r = spark.read.option("rowTag", rowTag)
    schema.fold(r)(s => r.schema(s)).format("xml").load(path)
  }

  /** S8 helper: parse an in-flight string column as CSV against a schema
    * (from_csv) — the programmatic-StructType path without touching disk.
    */
  def parseCsvColumn(df: DataFrame, c: Column, schema: StructType,
      delimiter: String = ","): DataFrame =
    df.withColumn("parsed",
      from_csv(c, schema, Map("sep" -> delimiter)))
}
