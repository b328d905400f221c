package graft

import org.apache.spark.sql.{Encoders, Row}
import org.apache.spark.sql.functions._
import graft.functions.LongAvg
import graft.operators.Relational

class FunctionsSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  test("U1: typed LongAvg equals built-in average regardless of partitioning") {
    val base = tables.lineitem.select(
      col("l_returnflag"), col("l_partkey"))
    // 7 partitions forces real partial-aggregate merges (the combiner path
    // the reference's MyValue exists for)
    val viaUdaf = base.repartition(7)
      .groupBy("l_returnflag")
      .agg(udaf(LongAvg, Encoders.scalaLong)(col("l_partkey")).as("avg_len"))
    val viaBuiltin = base
      .groupBy("l_returnflag")
      .agg(round(sum("l_partkey").cast("double") / count(lit(1)), 4)
        .as("avg_len"))
    rowSet(viaUdaf) shouldBe rowSet(viaBuiltin)
  }

  test("U1: LongAvg zero-count group yields 0.0, not NaN") {
    val out = Seq.empty[Long].toDS()
      .agg(udaf(LongAvg, Encoders.scalaLong)(col("value")))
      .collect()(0).getDouble(0)
    out shouldBe 0.0
  }

  test("P11: withRowIndex assigns a contiguous 0-based index in frame order") {
    val df = Relational.withRowIndex(
      tables.orders.select("o_orderkey").orderBy("o_orderkey"))
    val rows = df.collect()
    rows.length shouldBe 1500
    // contiguous 0..n-1
    rows.map(_.getAs[Long]("row_idx")).sorted.toSeq shouldBe
      (0L until 1500L).toSeq
    // index follows the sorted key order
    val byIdx = rows.sortBy(_.getAs[Long]("row_idx"))
      .map(_.getAs[Long]("o_orderkey"))
    byIdx.toSeq shouldBe byIdx.sorted.toSeq
  }

  test("events.props JSON field parses and aggregates per type") {
    val r = Relational.eventPropStats(tables.events)
      .collect().map(x => x.getAs[String]("event_type") ->
        x.getAs[Long]("sum_k")).toMap
    // DuckDB goldens at sf0.001
    r("click") shouldBe 9707L
    r("error") shouldBe 10442L
    r("purchase") shouldBe 9664L
  }

  test("variant path null-skips malformed and non-integer props rows") {
    // the lenient contract the q168 scaladoc documents: a malformed
    // JSON row (try_parse_json → null variant) or a missing $.k must
    // drop out of the aggregate, never kill the job. 87 + "42"-as-text
    // survive (variant string→long cast parses numeric strings — the
    // same rows DuckDB's json_extract_string + TRY_CAST keeps, so the
    // oracle twin stays aligned on lenient data)
    val events = Seq(
      ("click", """{"k": 87}"""),
      ("click", """{"k": "42"}"""),
      ("click", """{broken"""),
      ("click", """{"other": 1}""")
    ).toDF("event_type", "props")
    val out = Relational.eventPropStatsVariant(events).collect()
    out.length shouldBe 1
    val row = out(0)
    row.getAs[Long]("n") shouldBe 2L
    row.getAs[Long]("sum_k") shouldBe 129L
    row.getAs[Long]("min_k") shouldBe 42L
    row.getAs[Long]("max_k") shouldBe 87L
  }
}
