package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.{Ingest, Sinks}

class IngestSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"graft-$tag").toString

  // deterministic synthetic fixed-width lines in the NOAA ISD layout the
  // parser targets: offsets [4,10) usaf, [10,15) wban, [15,23) date,
  // [87,92) signed tenths-of-degree temp, [92] quality
  private def weatherLine(usaf: String, wban: String, ymd: String,
      temp: String, q: String): String = {
    val pad87 = " " * (87 - 23)
    s"XXXX$usaf$wban$ymd$pad87$temp$q-tail"
  }

  private lazy val weatherLines = Seq(
    weatherLine("720110", "03036", "20200101", "+0123", "1"),
    weatherLine("720110", "03036", "20200102", "-0050", "1"),
    weatherLine("999999", "00001", "20200103", "+9999", "1"), // sentinel
    weatherLine("720120", "03037", "20200104", "+0200", "9")  // bad quality
  ).toDF("value")

  test("S3/P9: fixed-width weather parse with sentinel handling") {
    val w = Ingest.parseWeather(weatherLines).orderBy("usaf", "day").collect()
    w(0).getAs[String]("usaf") shouldBe "720110"
    w(0).getAs[String]("wban") shouldBe "03036"
    w(0).getAs[Double]("temperature") shouldBe 12.3
    w(0).getAs[Boolean]("valid") shouldBe true
    w(1).getAs[Double]("temperature") shouldBe -5.0
    // bad quality flag: temperature parsed but not valid
    w(2).getAs[Double]("temperature") shouldBe 20.0
    w(2).getAs[Boolean]("valid") shouldBe false
    // sentinel 9999: null temperature, not 999.9
    assert(w(3).isNullAt(w(3).fieldIndex("temperature")))
    w(3).getAs[Boolean]("valid") shouldBe false
  }

  test("S1/K1: text sink + source round-trip") {
    val dir = tmpDir("text")
    Sinks.writeText(Seq("line one", "line two").toDF("value"), dir)
    val back = Ingest.readText(spark, dir)
    back.as[String].collect().sorted.toSeq shouldBe Seq("line one", "line two")
  }

  test("S2: minPartitions floor is honored") {
    val dir = tmpDir("textp")
    Sinks.writeText(Seq.tabulate(100)(i => s"line $i").toDF("value"), dir)
    val df = Ingest.readText(spark, dir, minPartitions = 7)
    df.rdd.getNumPartitions should be >= 7
    df.count() shouldBe 100
  }

  private val csvSchema = StructType(Seq(
    StructField("movieId", LongType),
    StructField("title", StringType),
    StructField("genres", StringType)))

  test("S5/F7: quote-aware CSV parse drops malformed rows") {
    val dir = tmpDir("csv")
    Files.writeString(Paths.get(dir, "movies.csv"),
      """movieId,title,genres
        |1,"Movie, The (1999)",Comedy|Drama
        |2,Plain Title,Action
        |not-a-long,Broken Row,Drama
        |""".stripMargin)
    val df = Ingest.readCsv(spark, dir, csvSchema)
    val rows = df.orderBy("movieId").collect()
    rows.length shouldBe 2 // malformed row dropped
    rows(0).getAs[String]("title") shouldBe "Movie, The (1999)" // quotes stripped
    rows(0).getAs[String]("genres") shouldBe "Comedy|Drama"
  }

  test("S6: headerless pipe-DSV with positional schema") {
    val dir = tmpDir("dsv")
    Files.writeString(Paths.get(dir, "data.dsv"),
      "1|first thing|10\n2|second thing|20\n")
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("name", StringType),
      StructField("score", IntegerType)))
    val rows = Ingest.readDsv(spark, dir, schema, "|").orderBy("id").collect()
    rows.length shouldBe 2
    rows(1).getAs[String]("name") shouldBe "second thing"
    rows(1).getAs[Int]("score") shouldBe 20
  }

  test("S9/K2: JSON sink + source round-trip preserves values") {
    val dir = tmpDir("json")
    val out = tables.nation.limit(5)
    Sinks.writeJson(out, dir)
    val back = Ingest.readJson(spark, dir)
    rowSet(back.select("n_nationkey", "n_name", "n_regionkey")) shouldBe
      rowSet(out.select("n_nationkey", "n_name", "n_regionkey"))
  }

  test("S8: from_csv parses an in-flight string column") {
    val df = Seq("5,hello,3").toDF("raw")
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("word", StringType),
      StructField("n", IntegerType)))
    val parsed = Ingest.parseCsvColumn(df, col("raw"), schema)
      .select("parsed.id", "parsed.word", "parsed.n").collect()(0)
    parsed.getAs[Long]("id") shouldBe 5L
    parsed.getAs[String]("word") shouldBe "hello"
  }

  test("K3: partitioned parquet sink prunes partitions on read") {
    val dir = tmpDir("part")
    Sinks.writeParquet(tables.orders, dir, partitionBy = Seq("o_orderpriority"))
    val back = spark.read.parquet(dir)
      .filter(col("o_orderpriority") === "1-URGENT")
    back.count() shouldBe
      tables.orders.filter(col("o_orderpriority") === "1-URGENT").count()
    // partition pruning: only the 1-URGENT directory is scanned
    plan(back) should include("PartitionFilters")
  }

  test("K7: overwrite mode makes the sink idempotent") {
    val dir = tmpDir("idem")
    Sinks.writeParquet(tables.nation, dir)
    Sinks.writeParquet(tables.nation, dir) // second run must not fail
    spark.read.parquet(dir).count() shouldBe 25
  }

  test("P7/J1: weather joins stations on the multi-column (usaf, wban) key") {
    val stations = Seq(
      ("720110", "03036", "STATION A", "UK"),
      ("720120", "03037", "STATION B", "IT")
    ).toDF("usaf", "wban", "name", "country")
    // multi-column key as Seq(...) — NOT the reference's string-concat
    // composite key (SURVEY §7 pitfall): concat keys break pushdown and
    // statistics, and collide on ambiguous boundaries
    val joined = Ingest.parseWeather(weatherLines)
      .join(stations, Seq("usaf", "wban"))
    joined.count() shouldBe 3 // 999999/00001 has no station
    val uk = joined.filter(col("country") === "UK")
    uk.count() shouldBe 2
    uk.agg(max("temperature")).collect()(0).getDouble(0) shouldBe 12.3
  }

  test("O5: writeSingleSorted emits one sorted part file") {
    val dir = tmpDir("single")
    Sinks.writeSingleSorted(tables.nation, dir, Seq("n_name"))
    val parts = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    parts.length shouldBe 1
    val names = spark.read.parquet(dir).select("n_name").as[String].collect()
    names.toSeq shouldBe names.sorted.toSeq
  }

  test("K4/K5/J2: bucketed tables join with zero shuffle") {
    Sinks.saveTablePartitioned(tables.orders, "orders_b",
      bucketBy = Some((8, Seq("o_orderkey"))), sortBy = Seq("o_orderkey"))
    Sinks.saveTablePartitioned(
      tables.lineitem.groupBy("l_orderkey")
        .agg(count(lit(1)).as("n_items")),
      "lineitem_agg_b",
      bucketBy = Some((8, Seq("l_orderkey"))), sortBy = Seq("l_orderkey"))
    // disable auto-broadcast so the plan must pick the co-bucketed
    // sort-merge join (the shape that matters at scale)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("orders_b")
        .join(spark.table("lineitem_agg_b"),
          col("o_orderkey") === col("l_orderkey"))
      // co-bucketed on the join key: no Exchange on either side
      val p = plan(joined)
      p should not include "Exchange"
      // inner join keeps only orders that have lineitems
      val expected = tables.orders.join(
        tables.lineitem.select("l_orderkey").distinct(),
        col("o_orderkey") === col("l_orderkey")).count()
      joined.count() shouldBe expected
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("append into a bucketed table: spec validated, co-location preserved") {
    val nat = tables.nation
    Sinks.saveTablePartitioned(nat.filter(col("n_nationkey") < 10),
      "nation_grow", bucketBy = Some((4, Seq("n_nationkey"))))
    Sinks.appendTablePartitioned(nat.filter(col("n_nationkey") >= 10),
      "nation_grow", bucketBy = Some((4, Seq("n_nationkey"))))
    spark.table("nation_grow").count() shouldBe nat.count()
    // the loud-failure contract: a mismatched bucket count must throw,
    // not silently break the co-location layout
    an[Exception] should be thrownBy
      Sinks.appendTablePartitioned(nat, "nation_grow",
        bucketBy = Some((8, Seq("n_nationkey"))))
  }

  test("ORC roundtrip preserves schema and rows exactly") {
    val src = tables.orders
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    val dir = tmpDir("orc")
    Sinks.writeOrc(src, dir)
    val back = Ingest.readOrc(spark, dir)
    back.schema shouldBe src.schema
    rowSet(back) shouldBe rowSet(src)
  }

  test("compactParquet bin-packs small files to the byte target") {
    val src = tmpDir("compact-src")
    val dst = tmpDir("compact-dst")
    // 64 deliberately-tiny files
    tables.documents.repartition(64).write
      .mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(src)
    val fs = new org.apache.hadoop.fs.Path(src)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def parquetFiles(d: String) =
      fs.listStatus(new org.apache.hadoop.fs.Path(d))
        .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    val total = parquetFiles(src).map(_.getLen).sum
    val n = Sinks.compactParquet(spark, src, dst,
      targetBytes = (total + 3) / 4)
    n shouldBe 4
    parquetFiles(dst).length shouldBe 4
    // content survives the rewrite exactly
    spark.read.parquet(dst).except(tables.documents).count() shouldBe 0
    tables.documents.except(spark.read.parquet(dst)).count() shouldBe 0
    // a same-directory compaction must be refused
    an[IllegalArgumentException] should be thrownBy
      Sinks.compactParquet(spark, src, src)
  }

  test("compactParquet sizes a Hive-partitioned source recursively") {
    val src = tmpDir("compact-part-src")
    val dst = tmpDir("compact-part-dst")
    tables.documents.write
      .mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy("lang").parquet(src)
    // recursive sizing sees the data files under lang=*/ subdirs: a
    // byte target of 1/4 the real total must yield >1 output file (the
    // flat listing bug sized this at 0 bytes -> always 1 file)
    var total = 0L
    val fs = new org.apache.hadoop.fs.Path(src)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(new org.apache.hadoop.fs.Path(src), true)
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) total += f.getLen
    }
    total should be > 0L
    val n = Sinks.compactParquet(spark, src, dst,
      targetBytes = (total + 3) / 4)
    n shouldBe 4
    // partition values fold back into data columns: nothing lost
    val back = spark.read.parquet(dst)
    rowSet(back.select("doc_id", "lang")) shouldBe
      rowSet(tables.documents.select("doc_id", "lang"))
  }

  test("writeShards: one file per shard directory, lossless roundtrip") {
    val dir = tmpDir("shards")
    Sinks.writeShards(tables.documents.select("doc_id", "source"),
      "doc_id", nShards = 4, dir)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val shardDirs = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .filter(_.isDirectory).map(_.getPath.getName).sorted
    shardDirs.toSeq shouldBe Seq("shard=0", "shard=1", "shard=2", "shard=3")
    // the shard-hash repartition funnels each shard into ONE task
    shardDirs.foreach { d =>
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/$d"))
        .count(_.getPath.getName.endsWith(".parquet")) shouldBe 1
    }
    val back = spark.read.parquet(dir)
    back.count() shouldBe tables.documents.count()
    back.select("doc_id").except(tables.documents.select("doc_id"))
      .count() shouldBe 0
  }
}
