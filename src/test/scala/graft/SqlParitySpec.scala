package graft

import org.apache.spark.sql.functions._
import graft.operators.{Relational, TextOps}

/** J5/S11: the DataFrame surface and the `spark.sql` surface answer the
  * same catalog — every operator has a SQL twin over `registerAll()`
  * views (reference teaches both as one engine, 303-spark-sql/README.md).
  */
class SqlParitySpec extends SparkSpec {

  private lazy val registered: Unit = tables.registerAll()

  test("SQL twin: filter + projection") {
    registered
    val df = Relational.scanFilterProject(tables.lineitem)
    val sql = spark.sql(
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
         WHERE l_quantity > 45.0""")
    rowSet(df) shouldBe rowSet(sql)
  }

  test("SQL twin: implicit multi-way join with aggregation") {
    registered
    val df = Relational.revenueByNation(tables.lineitem, tables.orders,
      tables.customer, tables.nation, tables.region)
    val sql = spark.sql(
      """WITH rev AS (
           SELECT l_orderkey,
             sum(CAST(l_extendedprice AS DECIMAL(12,2))
               * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))
               AS order_rev,
             count(1) AS n_items
           FROM lineitem GROUP BY l_orderkey)
         SELECT n_name, r_name,
           CAST(sum(order_rev) AS DOUBLE) AS revenue,
           sum(n_items) AS n_items, count(1) AS n_orders
         FROM orders, rev, customer, nation, region
         WHERE o_orderkey = l_orderkey AND o_custkey = c_custkey
           AND c_nationkey = n_nationkey AND n_regionkey = r_regionkey
         GROUP BY n_name, r_name""")
    rowSet(df) shouldBe rowSet(sql)
  }

  test("SQL twin: grouped aggregation with window ranking") {
    registered
    val df = Relational.topOrdersPerPriority(tables.orders, n = 3)
    val sql = spark.sql(
      """SELECT o_orderpriority, o_orderkey, o_totalprice, rn FROM (
           SELECT o_orderpriority, o_orderkey, o_totalprice,
             CAST(row_number() OVER (PARTITION BY o_orderpriority
               ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
           FROM orders) WHERE rn <= 3""")
    rowSet(df) shouldBe rowSet(sql)
  }

  test("SQL twin: word count via LATERAL VIEW explode") {
    registered
    val df = TextOps.wordCount(tables.documents)
    val sql = spark.sql(
      """SELECT word, count(1) AS cnt FROM (
           SELECT explode(filter(split(text, '\\s+'), t -> t != '')) AS word
           FROM documents)
         GROUP BY word""")
    rowSet(df) shouldBe rowSet(sql)
  }

  test("SQL twin: set operation") {
    registered
    val df = Relational.nationsIntersect(tables.customer, tables.supplier)
    val sql = spark.sql(
      """SELECT DISTINCT c_nationkey AS nationkey FROM customer
         INTERSECT
         SELECT DISTINCT s_nationkey FROM supplier""")
    rowSet(df) shouldBe rowSet(sql)
  }

  test("SQL twin: TPC-H Q1-shaped multi-aggregate") {
    registered
    val df = Relational.pricingSummary(tables.lineitem)
    val sql = spark.sql(
      """SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
             * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
             AS sum_disc_price,
           round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(1), 4) AS avg_qty,
           round(CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(1), 4) AS avg_disc,
           count(1) AS count_order
         FROM lineitem GROUP BY l_returnflag, l_linestatus""")
    rowSet(df) shouldBe rowSet(sql)
  }

  test("SQL twin: scalar function surface") {
    registered
    val df = Relational.orderScalarFeatures(tables.orders)
    val sql = spark.sql(
      """SELECT o_orderkey,
           CAST(year(o_orderdate) AS BIGINT) AS order_year,
           CAST(month(o_orderdate) AS BIGINT) AS order_month,
           round(o_totalprice * 1.2, 2) AS price_usd,
           lower(o_orderpriority) AS priority_lower,
           CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS priority_rank,
           concat(o_orderstatus, '-', o_orderpriority) AS status_priority,
           floor(o_totalprice) AS price_floor
         FROM orders""")
    rowSet(df) shouldBe rowSet(sql)
  }

  test("SQL twin: exact dedup via window over fingerprint") {
    registered
    val df = graft.operators.Dedup.exactDedup(tables.documents)
    val sql = spark.sql(
      """SELECT doc_id, lang, source, n_chars FROM (
           SELECT doc_id, lang, source, n_chars,
             row_number() OVER (
               PARTITION BY md5(regexp_replace(lower(trim(text)), '\\s+', ' '))
               ORDER BY doc_id) AS rn
           FROM documents) WHERE rn = 1""")
    rowSet(df) shouldBe rowSet(sql)
  }

  test("SQL twin: running window frame over events") {
    registered
    val df = Relational.userRunningValue(tables.events)
    val sql = spark.sql(
      """SELECT user_id, event_id,
           CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_value,
           CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS BIGINT) AS event_seq
         FROM events""")
    rowSet(df) shouldBe rowSet(sql)
  }

  test("SQL twin: sketch surface via approx_count_distinct") {
    registered
    val df = graft.operators.Sketches.distinctCounts(tables.lineitem)
    val sql = spark.sql(
      """SELECT count(DISTINCT l_partkey) AS exact_distinct,
           approx_count_distinct(l_partkey, 0.05) AS approx_rsd05,
           approx_count_distinct(l_partkey, 0.1) AS approx_rsd10,
           approx_count_distinct(l_partkey, 0.01) AS approx_rsd01
         FROM lineitem""")
    rowSet(df) shouldBe rowSet(sql)
  }
}
