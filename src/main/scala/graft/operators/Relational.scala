package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch relational operator library — the SURVEY.md §2.2–2.6 inventory
  * re-expressed on the driver testdata star schema.
  *
  * Every operator is a declarative DataFrame pipeline: Catalyst gets the
  * whole plan, so predicate pushdown, column pruning, partial aggregation
  * and join-strategy selection are automatic. Scale notes are on each op.
  */
object Relational {

  /** S10 + P3/P4: scan → filter → project. The filter and the projection
    * both reach the parquet reader (PushedFilters + ReadSchema) — at 100 TB
    * this is the difference between reading 3 columns and reading 11.
    * Covers SURVEY §2.2 P1/P3/P4 (`301-solutions.scala:9,44`,
    * `303-spark-sql/README.md:105`).
    */
  def scanFilterProject(lineitem: DataFrame): DataFrame =
    lineitem
      .filter(col("l_quantity") > 45.0)
      .select("l_orderkey", "l_linenumber", "l_quantity")

  /** A1/A3/A8/A9: the TPC-H Q1 shape — multi-aggregate per group with
    * expressions inside aggregates (reference analogue: avg(price*1.2),
    * `303-solutions.scala:4`). One shuffle on the (tiny-cardinality) group
    * key; HashAggregateExec does partial (map-side) aggregation so the
    * shuffle payload is #groups × #partitions rows, independent of input
    * size — the MR-combiner pattern (`Ex4AverageWordLengthWithCombiner
    * .java:39-51`) for free.
    * Doubles are rounded so results are stable across summation orders.
    */
  def pricingSummary(lineitem: DataFrame): DataFrame =
    lineitem
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("sum_disc_price"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        round(avg("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))

  /** A2: max/min by key (`ExerciseComplete.scala:83,151`,
    * `MaxTemperatureReducer.java:15-22`). Exact extrema need no rounding.
    */
  def extremaByKey(lineitem: DataFrame): DataFrame =
    lineitem
      .groupBy("l_returnflag")
      .agg(
        max("l_extendedprice").as("max_price"),
        min("l_extendedprice").as("min_price"),
        count(lit(1)).as("cnt"))

  /** A3: average by key — the aggregateByKey (sum,count) accumulator
    * (`301-solutions.scala:48-52`) is Spark's built-in partial avg.
    */
  def avgBalanceByNation(customer: DataFrame): DataFrame =
    customer
      .groupBy("c_nationkey")
      .agg(round(avg("c_acctbal"), 4).as("avg_bal"),
        count(lit(1)).as("cnt"))

  /** J3/J4: broadcast (map-side) join. `part` is a dimension table — at any
    * scale factor it is orders of magnitude smaller than `lineitem`, so we
    * broadcast it and the fact table is never shuffled
    * (`ExerciseComplete.scala:240-248`, `303-spark-sql/README.md:141-143`).
    */
  def revenueByBrand(lineitem: DataFrame, part: DataFrame): DataFrame =
    lineitem
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"),
        round(sum("l_quantity"), 2).as("sum_qty"),
        count(lit(1)).as("cnt"))

  /** J6: multi-way join (reference: movies ⋈ tags ⋈ ratings,
    * `Exercise.scala:316-321`). Dimension chain nation→region broadcasts;
    * orders⋈lineitem is the only real shuffle pair. We pre-aggregate
    * lineitem per orderkey BEFORE joining up the chain — the
    * aggregate-pushdown-below-join rewrite Catalyst does not do itself and
    * the reference calls out as the key manual optimization
    * (`303-solutions.scala:45-48`, `ExerciseComplete.scala:281-294`): the
    * join then moves #orders rows instead of #lineitems.
    */
  def revenueByNation(
      lineitem: DataFrame,
      orders: DataFrame,
      customer: DataFrame,
      nation: DataFrame,
      region: DataFrame): DataFrame = {
    val revPerOrder = lineitem
      .groupBy("l_orderkey")
      .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("order_rev"),
        count(lit(1)).as("n_items"))
    orders
      .join(revPerOrder, col("o_orderkey") === col("l_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name", "r_name")
      .agg(round(sum("order_rev"), 2).as("revenue"),
        sum("n_items").as("n_items"),
        count(lit(1)).as("n_orders"))
  }

  /** W1: top-N per group — the corpus's only window-shaped op
    * (`Exercise.scala:338-343`): per-group sort + row_number ≤ N. The window
    * shuffles once on the partition key; no driver-side collect.
    */
  def topOrdersPerPriority(orders: DataFrame, n: Int = 3): DataFrame = {
    val w = Window
      .partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    orders
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= n)
      .select("o_orderpriority", "o_orderkey", "o_totalprice", "rn")
  }

  /** J7: self-join of two aggregates (the gender-pay-gap query,
    * `303-solutions.scala:11-30`) on customer segments. Both sides are
    * #nations-sized after aggregation, so the join is a broadcast of two
    * tiny frames regardless of input scale.
    */
  def segmentBalanceGap(customer: DataFrame): DataFrame = {
    def side(seg: String, alias: String): DataFrame =
      customer
        .filter(col("c_mktsegment") === seg)
        .groupBy("c_nationkey")
        .agg(avg("c_acctbal").as(alias))
    side("BUILDING", "building_avg")
      .join(side("AUTOMOBILE", "automobile_avg"), Seq("c_nationkey"))
      .select(
        col("c_nationkey"),
        round(col("building_avg"), 4).as("building_avg"),
        round(col("automobile_avg"), 4).as("automobile_avg"),
        round(col("building_avg") - col("automobile_avg"), 4).as("gap"))
  }

  /** J7 variant: the idiomatic pivot form of the same query — one shuffle
    * instead of two + join. Kept alongside the self-join; tests assert both
    * agree (SURVEY §2.3 J7).
    */
  def segmentBalancePivot(customer: DataFrame): DataFrame =
    customer
      .filter(col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
      .groupBy("c_nationkey")
      .pivot("c_mktsegment", Seq("BUILDING", "AUTOMOBILE"))
      .agg(avg("c_acctbal"))
      .select(
        col("c_nationkey"),
        round(col("BUILDING"), 4).as("building_avg"),
        round(col("AUTOMOBILE"), 4).as("automobile_avg"),
        round(col("BUILDING") - col("AUTOMOBILE"), 4).as("gap"))

  /** O1–O4: global sort + limit. Spark executes order-by-limit as a TakeOrdered
    * (per-partition top-k + driver merge) — no global sort materializes, so
    * it scales to any input size. Tiebreak on the unique key for determinism.
    */
  def topOrdersByPrice(orders: DataFrame, n: Int = 10): DataFrame =
    orders
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .limit(n)

  /** A10/A14: exact distinct count (`304-streaming/spark/README.md:187`).
    * Expands to a two-phase partial-distinct aggregate — no single-node
    * bottleneck.
    */
  def distinctPartCount(lineitem: DataFrame): DataFrame =
    lineitem.agg(
      countDistinct(col("l_partkey")).as("distinct_parts"),
      count(lit(1)).as("total_rows"))

  /** §2.6 set ops (absent in corpus, engine-complete): nations that have
    * both customers and suppliers / customers but no suppliers.
    */
  def nationsIntersect(customer: DataFrame, supplier: DataFrame): DataFrame =
    customer.select(col("c_nationkey").as("nationkey")).distinct()
      .intersect(supplier.select(col("s_nationkey").as("nationkey")).distinct())

  def nationsExcept(customer: DataFrame, supplier: DataFrame): DataFrame =
    customer.select(col("c_nationkey").as("nationkey")).distinct()
      .except(supplier.select(col("s_nationkey").as("nationkey")).distinct())

  def nationsUnion(customer: DataFrame, supplier: DataFrame): DataFrame =
    customer.select(col("c_nationkey").as("nationkey"))
      .union(supplier.select(col("s_nationkey").as("nationkey")))
      .distinct()

  /** F9–F12 scalar function surface on orders: arithmetic, round, year
    * extraction, casts, string ops (SURVEY §2.7). All codegen'd built-ins —
    * no UDFs in the hot path.
    */
  def orderScalarFeatures(orders: DataFrame): DataFrame =
    orders.select(
      col("o_orderkey"),
      year(col("o_orderdate")).cast("int").as("order_year"),
      month(col("o_orderdate")).cast("int").as("order_month"),
      round(col("o_totalprice") * 1.2, 2).as("price_usd"),
      lower(col("o_orderpriority")).as("priority_lower"),
      substring(col("o_orderpriority"), 1, 1).cast("int").as("priority_rank"),
      concat(col("o_orderstatus"), lit("-"), col("o_orderpriority"))
        .as("status_priority"),
      col("o_totalprice").cast("long").as("price_long"))

  /** T7 batch analogue: tumbling-window aggregation over event time.
    * date_trunc is a pure column expression → stays in whole-stage codegen;
    * grouping key cardinality = hours × event types.
    */
  def eventsHourly(events: DataFrame): DataFrame =
    events
      .groupBy(
        date_trunc("hour", col("ts")).cast("string").as("hour"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("sum_value"),
        countDistinct("user_id").as("n_users"))

  /** Running/cumulative aggregate per user over event time (window frame) —
    * ranking + frame windows beyond W1's row_number.
    */
  def userRunningValue(events: DataFrame): DataFrame = {
    val w = Window
      .partitionBy("user_id")
      .orderBy(col("ts").asc, col("event_id").asc)
    events.select(
      col("user_id"),
      col("event_id"),
      round(sum("value").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2)
        .as("running_value"),
      row_number().over(w).cast("long").as("event_seq"))
  }

  /** P10: sampling — deterministic with a fixed seed (per-partition
    * Bernoulli; distributed, no collect).
    */
  def sampleLineitem(lineitem: DataFrame, fraction: Double = 0.1): DataFrame =
    lineitem.sample(withReplacement = false, fraction, seed = 42L)
      .select("l_orderkey", "l_linenumber")
}
