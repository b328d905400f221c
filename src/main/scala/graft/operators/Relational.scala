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

  /** Discounted price as exact DECIMAL arithmetic. Money sums over many
    * rows must be DECIMAL, not DOUBLE: a double sum's value depends on
    * partition/merge order (different every run and every engine), and at
    * 60k+ rows the wobble exceeds a cent — decimal sums are
    * order-independent and bit-stable, which is what the cross-engine
    * correctness hash needs and what a real revenue pipeline wants anyway.
    */
  private def discPrice: Column =
    col("l_extendedprice").cast("decimal(12,2)") *
      (lit(1).cast("decimal(4,2)") - col("l_discount").cast("decimal(4,2)"))

  /** Deterministic average: exact DECIMAL sum ÷ count, in double, rounded.
    * A plain `avg(double)` is summation-order-dependent (different per run
    * / engine); the decimal sum is exact and order-independent, and the
    * single double division + round is IEEE-deterministic — so the value
    * hashes identically here and in the DuckDB oracle.
    */
  private[operators] def davg(c: Column, scale: Int = 4): Column =
    round(sum(c.cast("decimal(18,2)")).cast("double") / count(lit(1)), scale)

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
    * Money sums run in DECIMAL (order-independent, exact); averages stay
    * DOUBLE and are rounded.
    */
  def pricingSummary(lineitem: DataFrame): DataFrame =
    lineitem
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity").cast("decimal(12,2)")).cast("double")
          .as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(12,2)")).cast("double")
          .as("sum_base_price"),
        sum(discPrice).cast("double").as("sum_disc_price"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_discount")).as("avg_disc"),
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
      .agg(davg(col("c_acctbal")).as("avg_bal"),
        count(lit(1)).as("cnt"))

  /** J3/J4: map-side join against a dimension table
    * (`ExerciseComplete.scala:240-248`, `303-spark-sql/README.md:141-143`).
    * No forced `broadcast(part)` hint: `part` grows linearly with scale
    * factor (TPC-H: 200k rows/sf), so a hard-coded broadcast OOMs executors
    * at 100-TB scale. `autoBroadcastJoinThreshold` + AQE pick broadcast
    * while the dim fits and degrade to shuffle join when it doesn't —
    * the only column pulled from `part` is pruned to (p_partkey, p_brand),
    * which keeps the broadcast small far longer.
    */
  def revenueByBrand(lineitem: DataFrame, part: DataFrame): DataFrame =
    lineitem
      .join(part.select("p_partkey", "p_brand"),
        col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(
        sum(discPrice).cast("double").as("revenue"),
        sum(col("l_quantity").cast("decimal(12,2)")).cast("double")
          .as("sum_qty"),
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
      .agg(sum(discPrice).as("order_rev"),
        count(lit(1)).as("n_items"))
    orders
      .join(revPerOrder, col("o_orderkey") === col("l_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name", "r_name")
      .agg(sum("order_rev").cast("double").as("revenue"),
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

  /** W1 scale variant: same result as [[topOrdersPerPriority]] via a
    * bounded-heap typed Aggregator instead of a window — each map task
    * keeps ≤2n rows per group, so the shuffle moves O(n·partitions) rows
    * per group instead of every row, and nothing is ever fully sorted.
    * This is the grouped-top-k rewrite Catalyst doesn't do itself; at
    * 100 TB it converts the window's all-rows shuffle + per-group sort
    * into a combiner-style partial aggregate.
    */
  def topOrdersPerPriorityHeap(orders: DataFrame, n: Int = 3): DataFrame = {
    val spark = orders.sparkSession
    import spark.implicits._
    heapTopK[Long](
      orders.select(col("o_orderpriority"), col("o_totalprice"),
        col("o_orderkey")),
      n)
      .toDF("o_orderpriority", "o_totalprice", "o_orderkey", "rn")
      .select("o_orderpriority", "o_orderkey", "o_totalprice", "rn")
  }

  /** Shared bounded-heap grouped-top-k pipeline: input frame must be
    * (group: string, value: double, id) columns; output is
    * (group, value, id, rn) with rn 1..k in value-desc, id-asc order.
    * One place owns the groupByKey → TopKAgg → flatMap plumbing so the
    * heap's callers (grouped top-k, reservoir sampling) cannot drift.
    */
  private[operators] def heapTopK[I: scala.reflect.runtime.universe.TypeTag](
      df: DataFrame, k: Int)(implicit idOrd: Ordering[I],
      eIn: org.apache.spark.sql.Encoder[(String, Double, I)],
      ePair: org.apache.spark.sql.Encoder[(Double, I)],
      eOut: org.apache.spark.sql.Encoder[(String, Double, I, Long)])
      : org.apache.spark.sql.Dataset[(String, Double, I, Long)] =
    df.as[(String, Double, I)]
      .groupByKey(_._1)(org.apache.spark.sql.Encoders.STRING)
      .mapValues(t => (t._2, t._3))
      .agg(new graft.functions.TopKAgg[I](k).toColumn.name("top"))
      .flatMap { case (g, tops) =>
        tops.zipWithIndex.map { case ((v, id), i) => (g, v, id, (i + 1).toLong) }
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
        .agg(davg(col("c_acctbal")).as(alias))
    side("BUILDING", "building_avg")
      .join(side("AUTOMOBILE", "automobile_avg"), Seq("c_nationkey"))
      .select(
        col("c_nationkey"),
        col("building_avg"),
        col("automobile_avg"),
        round(col("building_avg") - col("automobile_avg"), 4).as("gap"))
  }

  /** J7 variant: the idiomatic pivot form of the same query — one shuffle
    * instead of two + join. Nations present in only one of the two segments
    * are dropped (matching the inner-join semantics of segmentBalanceGap);
    * tests assert both forms agree (SURVEY §2.3 J7).
    */
  def segmentBalancePivot(customer: DataFrame): DataFrame =
    customer
      .filter(col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
      .groupBy("c_nationkey")
      .pivot("c_mktsegment", Seq("BUILDING", "AUTOMOBILE"))
      .agg(davg(col("c_acctbal")))
      .na.drop(Seq("BUILDING", "AUTOMOBILE"))
      .select(
        col("c_nationkey"),
        col("BUILDING").as("building_avg"),
        col("AUTOMOBILE").as("automobile_avg"),
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
      year(col("o_orderdate")).cast("long").as("order_year"),
      month(col("o_orderdate")).cast("long").as("order_month"),
      round(col("o_totalprice") * 1.2, 2).as("price_usd"),
      lower(col("o_orderpriority")).as("priority_lower"),
      substring(col("o_orderpriority"), 1, 1).cast("long").as("priority_rank"),
      concat(col("o_orderstatus"), lit("-"), col("o_orderpriority"))
        .as("status_priority"),
      floor(col("o_totalprice")).as("price_floor"))

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
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"),
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
      sum(col("value").cast("decimal(18,2)")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("double").as("running_value"),
      row_number().over(w).cast("long").as("event_seq"))
  }

  /** Per-event window analytics beyond W1/q17: lag, delta-vs-previous,
    * rank within group, and a 5-row moving average — the standard
    * event-feature block of an OLAP/feature-engineering surface. All four
    * window expressions share the (user_id) partitioning, so the whole
    * select is ONE shuffle; Catalyst merges the identical-frame window
    * specs into a minimal set of Window physical nodes. The moving
    * average is an exact DECIMAL sum over the frame divided in double
    * (see [[davg]] rationale) for a cross-engine-stable value.
    */
  def userEventWindows(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    val frame5 = w.rowsBetween(-4, Window.currentRow)
    val byValue = Window.partitionBy("user_id").orderBy(col("value").desc)
    events.select(
      col("user_id"),
      col("event_id"),
      row_number().over(w).cast("long").as("event_seq"),
      lag(col("value"), 1).over(w).as("prev_value"),
      (col("value") - lag(col("value"), 1).over(w)).as("delta"),
      rank().over(byValue).cast("long").as("val_rank"),
      round(
        sum(col("value").cast("decimal(18,2)")).over(frame5).cast("double") /
          count(lit(1)).over(frame5),
        4).as("mov_avg5"))
  }

  /** Deterministic per-group reservoir sample: k rows per group, chosen
    * by smallest md5-derived priority — uniform (md5 is uniform over the
    * id space), reproducible (same seed → same sample, on any cluster
    * layout or partitioning), and cross-engine checkable (md5 is md5
    * everywhere, unlike engine-native rand/xxhash). Built on the bounded-
    * heap [[graft.functions.TopKAgg]], so each map task carries ≤2k rows
    * per group into the shuffle — no per-group sort of the full table,
    * which is what makes "sample 10k docs per source from 100 TB" a
    * one-pass cheap job instead of a global sort. Priority = first 13
    * md5 hex chars (52 bits: exact in double, collision odds ~2⁻⁵² per
    * pair — and a collision only perturbs sample membership, not
    * validity).
    */
  def reservoirSamplePerGroup(df: DataFrame, groupCol: String,
      idCol: String, k: Int = 10, seed: String = "graft"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val prio = conv(
      substring(md5(concat(col(idCol).cast("string"), lit(seed))), 1, 13),
      16, 10).cast("double")
    // ids ride through as strings: any id type works (URIs included),
    // and null ids — which can't be hashed or returned meaningfully —
    // are excluded up front instead of crashing the typed encoder
    heapTopK[String](
      df.filter(col(idCol).isNotNull)
        .select(col(groupCol).cast("string"), (-prio).as("_negp"),
          col(idCol).cast("string")),
      k)
      .map { case (g, _, id, rn) => (g, id, rn) }
      .toDF(groupCol, idCol, "rn")
  }

  /** Deterministic per-group WEIGHTED sample without replacement
    * (Efraimidis–Spirakis A-ES): each row draws priority u^(1/w) for a
    * hash-derived uniform u, and the k largest priorities per group are
    * the sample — inclusion probability proportional to weight, exactly
    * the "sample high-quality documents more often" knob a training-mix
    * pipeline needs. Computed in log space (ln(u)/w, same ordering) and
    * rounded to 6 decimals so the rank order is reproducible across
    * engines; ties (created only by the rounding) break on id. Same
    * md5 uniform and bounded-heap shape as [[reservoirSamplePerGroup]]:
    * one scan, ≤2k rows per group per map task into the shuffle, no RNG
    * state — rerunning on any partitioning draws the identical sample.
    * Rows with null ids or non-positive weights are excluded (a weight
    * of 0 can never be sampled; negative weights are undefined).
    */
  def weightedSamplePerGroup(df: DataFrame, groupCol: String, idCol: String,
      weightCol: String, k: Int = 10, seed: String = "graft"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val h = conv(
      substring(md5(concat(col(idCol).cast("string"), lit(seed))), 1, 13),
      16, 10).cast("double")
    // u in (0, 1]: 52 md5 bits shifted off zero so ln is finite
    val u = (h + 1) / lit(4503599627370496.0) // 2^52
    val key = round(log(u) / col(weightCol), 6)
    heapTopK[String](
      df.filter(col(idCol).isNotNull && col(weightCol) > 0)
        .select(col(groupCol).cast("string"), key.as("_key"),
          col(idCol).cast("string")),
      k)
      .map { case (g, _, id, rn) => (g, id, rn) }
      .toDF(groupCol, idCol, "rn")
  }

  /** Per-group z-score standardization — the feature-scaling pass of an
    * ML data pipeline: z = (v − μ_g)/σ_g per group g. Computed as
    * grouped stats + a BROADCAST join back, not a per-group window: with
    * few groups a window would funnel the whole table through #groups
    * partitions (the skew trap), while the stats frame is #groups rows
    * and broadcasts for free. μ and σ derive from exact decimal sums of
    * v and v² (order-independent), then a fixed double expression —
    * deterministic across engines and partitionings. σ = 0 groups
    * (constant value) get z = 0.
    */
  def standardizeByGroup(df: DataFrame, groupCol: String = "event_type",
      valueCol: String = "value"): DataFrame = {
    val d = col(valueCol).cast("decimal(18,2)")
    val stats = df
      .groupBy(groupCol)
      .agg(
        sum(d).cast("double").as("_s1"),
        sum(d * d).cast("double").as("_s2"),
        // count the VALUES, not the rows: null values are skipped by the
        // sums, and counting them would silently deflate μ and inflate σ
        count(col(valueCol)).as("_n"))
      .select(
        col(groupCol),
        (col("_s1") / col("_n")).as("_mu"),
        sqrt(greatest(
          col("_s2") / col("_n") -
            (col("_s1") / col("_n")) * (col("_s1") / col("_n")),
          lit(0.0))).as("_sigma"))
    df.join(broadcast(stats), groupCol)
      .withColumn("z",
        // null value → null z (the null must not borrow the σ=0 branch)
        when(col(valueCol).isNotNull && col("_sigma") === 0.0, lit(0.0))
          .otherwise(round((col(valueCol) - col("_mu")) / col("_sigma"), 4)))
      .drop("_mu", "_sigma")
  }

  /** P10: sampling — deterministic with a fixed seed (per-partition
    * Bernoulli; distributed, no collect).
    */
  def sampleLineitem(lineitem: DataFrame, fraction: Double = 0.1): DataFrame =
    lineitem.sample(withReplacement = false, fraction, seed = 42L)
      .select("l_orderkey", "l_linenumber")

  /** P10's content-addressed twin: a deterministic Bernoulli sample that
    * keeps a row iff md5(salt ‖ key) mod 10⁶ falls under ⌊fraction·10⁶⌋.
    * This is the sampler a 100-TB pipeline actually wants — membership is
    * a pure function of the row KEY, so the sample is reproducible across
    * runs, engines, cluster sizes, and input layouts (RNG `.sample` is
    * per-partition-seeded: repartition the input and the sample changes,
    * which is why q18 is rows-only), and it is STABLE under reprocessing:
    * a re-crawled document keeps its in/out decision, so downstream
    * incremental state never churns. Same-salt samples nest (fraction
    * 0.01 ⊂ fraction 0.1 — shrink a training mix without resampling);
    * distinct salts give independent samples. Pure codegen'd builtins
    * (md5 → conv → mod), filter evaluated at the scan: no shuffle at all.
    */
  /** The micro-unit modulus shared by the whole sampler family. */
  private val SampleModulus = 1000000L

  /** The content-addressed membership bucket in [0, 10⁶): the ONE
    * hash expression behind [[hashSample]], [[mixtureSample]],
    * [[tokenBudgetMix]], and [[temperatureMix]]. Shared on purpose —
    * the cross-sampler nesting guarantee (same salt ⇒ lower threshold
    * selects a subset) holds only while every sampler buckets rows
    * identically, and each oracle replays this exact chain: changing
    * it means changing all four oracles together.
    */
  private def memberBucket(keyCol: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt), keyCol.cast("string"))), 1, 15),
      16, 10).cast("long") % SampleModulus

  def hashSample(df: DataFrame, keyCol: Column, fraction: Double,
      salt: String = "smp_"): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0,
      s"hashSample: fraction must be in [0, 1], got $fraction")
    val thresh = math.floor(fraction * SampleModulus).toLong
    df.filter(memberBucket(keyCol, salt) < thresh)
  }

  /** The training-MIX builder on top of [[hashSample]]: per-group
    * sampling fractions (e.g. per language or per source), one scan,
    * zero shuffle. Membership for a row in group g is the SAME
    * content-addressed predicate as hashSample at fraction(g), so every
    * hashSample property holds per group: reproducible across
    * runs/engines/layouts, stable under re-crawls, and same-salt mixes
    * NEST group-wise — re-weighting a mix (en 0.5 → 0.3) only ever
    * drops rows, never resamples, which keeps downstream incremental
    * state (dedup indexes, token counts) valid across mix revisions.
    * Groups absent from `fractions` are dropped (fraction 0) — the
    * explicit-allowlist semantics a curated mix wants.
    */
  def mixtureSample(df: DataFrame, keyCol: Column, groupCol: Column,
      fractions: Map[String, Double], salt: String = "smp_"): DataFrame = {
    require(fractions.nonEmpty, "mixtureSample: fractions must be non-empty")
    fractions.foreach { case (g, f) => require(f >= 0.0 && f <= 1.0,
      s"mixtureSample: fraction for '$g' must be in [0, 1], got $f") }
    val thresh = typedLit(fractions.map { case (g, f) =>
      g -> math.floor(f * SampleModulus).toLong })
    df.filter(memberBucket(keyCol, salt) <
      coalesce(element_at(thresh, groupCol.cast("string")), lit(0L)))
  }

  /** Token-BUDGET mixture: per-group token TARGETS instead of per-group
    * fractions. For each group g with total weight mass T_g the kept
    * fraction is f_g = min(1, budget_g / T_g), and membership is the
    * content-addressed [[hashSample]] predicate at f_g — each budget is
    * met IN EXPECTATION by an unbiased sample of its group. Contrast
    * [[budgetSelect]]: exact to the token under a global budget but
    * prefix-biased toward high scores; a pre-training mix usually wants
    * this unbiased per-group form. Two passes: one map-side-combined
    * aggregate for the T_g totals (broadcast back), then a shuffle-free
    * filtered scan. Groups without a budget drop (allowlist, like
    * [[mixtureSample]]); a zero-mass group trivially fits any budget
    * (f=1 — explicit branch, no NaN semantics relied on). The derived
    * thresholds are plain double arithmetic on exact longs, identical
    * in every engine, so the oracle replays the exact row set.
    */
  def tokenBudgetMix(df: DataFrame, keyCol: Column, groupCol: Column,
      weightCol: Column, budgets: Map[String, Long],
      salt: String = "smp_"): DataFrame = {
    require(budgets.nonEmpty, "tokenBudgetMix: budgets must be non-empty")
    budgets.foreach { case (g, b) => require(b >= 0L,
      s"tokenBudgetMix: budget for '$g' must be >= 0, got $b") }
    val m = SampleModulus
    val bLit = typedLit(budgets)
    val frac = least(lit(1.0),
      when(col("__t") > 0,
        coalesce(element_at(bLit, col("__g")), lit(0L)).cast("double") /
          col("__t"))
        .otherwise(lit(1.0)))
    val totals = df
      .groupBy(groupCol.cast("string").as("__g"))
      .agg(sum(weightCol.cast("long")).as("__t"))
      .withColumn("__thresh", floor(frac * m).cast("long"))
      .select("__g", "__thresh")
    df.withColumn("__g", groupCol.cast("string"))
      .join(broadcast(totals), Seq("__g"), "left")
      .filter(memberBucket(keyCol, salt) <
        coalesce(col("__thresh"), lit(0L)))
      .drop("__g", "__thresh")
  }

  /** Temperature-scaled mixture (α = 0.5): the multilingual-LM sampling
    * scheme (XLM-R / mT5 style) that up-weights low-resource groups.
    * Each group's share of `totalBudget` is √T_g / Σ_h √T_h (so kept
    * fractions scale as 1/√T — smaller groups keep proportionally
    * more), membership is the content-addressed [[hashSample]]
    * predicate at f_g = min(1, share·budget / T_g). α is FIXED at 0.5:
    * `sqrt` is the one fractional power IEEE 754 requires correctly
    * rounded, so the derived thresholds are bit-identical in every
    * engine and the oracle replays the exact row set — a configurable
    * `pow(x, α)` is only faithfully rounded and would not replay.
    * Unlike [[mixtureSample]]/[[tokenBudgetMix]] (allowlists), every
    * group present in the data participates. Σ√T is a ONE-ROW driver
    * collect of the map-side-combined aggregate (the k-means-centroid
    * collect pattern: bounded by construction — the per-group threshold
    * relation is broadcast in the membership join anyway, so group
    * cardinality is already assumed broadcast-size; a literal-key
    * equi-join or constant-partition window for the same scalar
    * constant-folds into exactly the cartesian / unpartitioned-window
    * shapes PlanGateSpec rejects). √T is pinned to integer micro-units
    * before the exact Σ, so the tiny-group share never depends on
    * double summation order.
    */
  def temperatureMix(df: DataFrame, keyCol: Column, groupCol: Column,
      weightCol: Column, totalBudget: Long,
      salt: String = "smp_"): DataFrame =
    mixtureApplyThresholds(df, keyCol, groupCol,
      temperatureThresholds(df, groupCol, weightCol, totalBudget), salt)

  /** [[temperatureMix]]'s per-group threshold derivation, exposed so a
    * pipeline can PERSIST the thresholds and replay the exact selection
    * against later data (the incremental corpus build's frozen-mix
    * contract): membership is content-addressed — a pure function of
    * (key hash, group threshold) — so a doc's selection decision never
    * depends on what else is in the batch once the thresholds are
    * fixed. Output: (grp STRING, thresh LONG in [0, 1e6] micro-units).
    */
  def temperatureThresholds(df: DataFrame, groupCol: Column,
      weightCol: Column, totalBudget: Long): DataFrame = {
    require(totalBudget >= 0L,
      s"temperatureThresholds: totalBudget must be >= 0, got $totalBudget")
    val m = SampleModulus
    val totals = df
      .groupBy(groupCol.cast("string").as("grp"))
      .agg(sum(weightCol.cast("long")).as("__t"))
      .withColumn("__s",
        round(sqrt(col("__t").cast("double")) * m).cast("long"))
    // Σ√T accumulates in exact DECIMAL(38,0): micro-unit √T is ≤ ~3·10¹⁵
    // per group, so a long Σ would overflow past ~3000 groups (domains,
    // not langs, at corpus scale); the double cast happens once at the
    // division, exactly as the oracle's HUGEINT→DOUBLE cast does
    val ss = totals
      .agg(sum(col("__s").cast("decimal(38,0)")).as("__ss")).head()
      .getDecimal(0)
    val frac = least(lit(1.0),
      when(col("__t") > 0 && lit(ss).isNotNull,
        lit(totalBudget).cast("double") * col("__s") /
          lit(ss).cast("double") / col("__t"))
        .otherwise(lit(1.0)))
    totals
      .withColumn("thresh", floor(frac * m).cast("long"))
      .select("grp", "thresh")
  }

  /** Apply a (grp, thresh) threshold relation — [[temperatureThresholds]]'
    * output, fresh or loaded from a persisted table — as the
    * content-addressed membership filter: keep a row iff
    * md5(salt ∥ key) mod 1e6 < thresh(group). Groups absent from
    * `thresholds` select NOTHING (coalesce to 0) — callers replaying
    * frozen thresholds against new data should check group coverage
    * first if silent exclusion of an unseen group is not acceptable.
    */
  def mixtureApplyThresholds(df: DataFrame, keyCol: Column,
      groupCol: Column, thresholds: DataFrame,
      salt: String = "smp_"): DataFrame =
    df.withColumn("__g", groupCol.cast("string"))
      .join(broadcast(thresholds.select(col("grp").as("__g"),
        col("thresh").as("__thresh"))), Seq("__g"), "left")
      .filter(memberBucket(keyCol, salt) <
        coalesce(col("__thresh"), lit(0L)))
      .drop("__g", "__thresh")

  /** P11: contiguous 0-based positional index (the RDD `zipWithIndex`
    * semantic, `301-solutions.scala:56`). zipWithIndex is the
    * scale-correct contiguous index: one extra lightweight job counts
    * partition sizes, then each partition numbers its rows from its
    * offset — fully distributed, unlike a global `row_number()` window
    * which funnels every row through ONE partition. The index follows
    * the frame's current row order, so sort first for a deterministic
    * assignment.
    */
  def withRowIndex(df: DataFrame, idxCol: String = "row_idx"): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType(
      df.schema.fields :+ org.apache.spark.sql.types.StructField(
        idxCol, org.apache.spark.sql.types.LongType, nullable = false))
    df.sparkSession.createDataFrame(
      df.rdd.zipWithIndex().map { case (r, i) =>
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i)
      },
      schema)
  }

  /** Training-export sharding: a deterministic global shuffle (order by
    * md5 of the key — uniform, content-addressed, reproducible across
    * runs, engines, and input layouts) followed by round-robin shard
    * assignment, so every shard receives a uniformly-mixed slice of the
    * corpus and shard sizes differ by at most one row. This is the step
    * that turns a curated corpus into training shards: downstream readers
    * stream shard files sequentially and still see i.i.d.-looking data.
    *
    * Scale shape: the md5 sort is a range-partitioned exchange (Spark
    * samples split points — no single reducer), and the rank is the
    * distributed two-pass [[withRowIndex]], not a global window. The key
    * must be unique (it breaks md5 ties, making the order total).
    */
  def shuffleShard(df: DataFrame, keyCol: String, nShards: Int): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    withRowIndex(
      df.withColumn("_skey", md5(col(keyCol).cast("string")))
        .orderBy("_skey", keyCol),
      "shuffle_rank")
      .withColumn("shard", pmod(col("shuffle_rank"), lit(nShards.toLong)))
      .drop("_skey")
  }

  /** MERGE/upsert: apply a changeset to a base table and return the new
    * snapshot. `changes` carries the base's schema plus `opCol` with
    * `'upsert'` (insert new key or replace existing row's payload) or
    * `'delete'` (payload columns ignored); any other op value raises at
    * runtime rather than silently passing rows through. This is the
    * incremental-maintenance half of the snapshot lifecycle — a crawl
    * delta folds into the 100-TB corpus as ONE co-partitioned full-outer
    * join on the key (both sides hash-partition once; the changeset side
    * is delta-sized), instead of rewriting the corpus from scratch.
    * Writing the result partitioned the same way keeps the next merge's
    * base side shuffle-free.
    */
  def mergeChangeset(
      base: DataFrame,
      changes: DataFrame,
      keyCol: String,
      opCol: String = "op"): DataFrame = {
    val payload = base.columns.filterNot(_ == keyCol).toSeq
    val renamed = payload.foldLeft(changes.withColumnRenamed(opCol, "_op"))(
      (d, p) => d.withColumnRenamed(p, s"_c_$p"))
    base.join(renamed, Seq(keyCol), "full_outer")
      .withColumn("_op",
        when(col("_op").isNull || col("_op").isin("upsert", "delete"),
          col("_op"))
          .otherwise(raise_error(concat(
            lit(s"mergeChangeset: unknown op in '$opCol': "), col("_op")))))
      .filter(col("_op").isNull || col("_op") === "upsert")
      .select(col(keyCol) +: payload.map(p =>
        when(col("_op") === "upsert", col(s"_c_$p"))
          .otherwise(col(p)).as(p)): _*)
  }

  /** Sessionization: split each user's event stream into sessions at
    * inactivity gaps > `gapMinutes`, then aggregate per session. The
    * classic two-window pipeline — lag() marks session starts, a running
    * sum numbers them — uses ONE shuffle on user_id for both windows plus
    * the final aggregation (same partitioning reused across all three
    * steps). Timestamps compare as integral microseconds, so the gap
    * test is exact.
    */
  def sessionize(events: DataFrame, gapMinutes: Long = 30): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    val gapMicros = gapMinutes * 60L * 1000000L
    val us = unix_micros(col("ts"))
    val newSession = when(
      lag(us, 1).over(w).isNull ||
        us - lag(us, 1).over(w) > gapMicros, 1L).otherwise(0L)
    events
      .withColumn("session_id",
        sum(newSession).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(
        count(lit(1)).as("n_events"),
        round((max(unix_micros(col("ts"))) - min(unix_micros(col("ts"))))
          .cast("double") / 1e6, 3).as("duration_sec"),
        sum(col("value").cast("decimal(18,2)")).cast("double")
          .as("session_value"))
  }

  /** Sequence packing for training-data assembly: assign documents (in
    * doc_id order) to fixed token-budget bins — bin = how many full
    * budgets precede the document's start in the global token stream.
    * The semantics are a global running token sum, but the implementation
    * is the DISTRIBUTED two-pass prefix sum (the zipWithIndex pattern):
    * range-partition by doc_id, pass 1 collects one token total per
    * partition (#partitions rows, bounded), pass 2 numbers each
    * partition's rows from its offset. No global-window single-reducer
    * funnel — a `sum() over (order by doc_id)` window would pull the
    * whole corpus through ONE partition.
    *
    * The two passes rescan the input; persist the sized projection first
    * when the upstream is expensive.
    */
  def packSequences(documents: DataFrame, budgetTokens: Long = 2048,
      partitions: Int = 0): DataFrame =
    packSized(
      documents.select(col("doc_id"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens")),
      budgetTokens, partitions)

  /** [[packSequences]] over a caller-sized (doc_id, n_tokens) frame —
    * the injection point for REAL tokenizer accounting (the BPE counts
    * of [[Bpe.docTokenCounts]]) instead of whitespace counts. Same
    * distributed two-pass prefix sum.
    */
  def packSized(sizedDocs: DataFrame, budgetTokens: Long = 2048,
      partitions: Int = 0): DataFrame = {
    val spark = sizedDocs.sparkSession
    val nParts =
      if (partitions > 0) partitions
      else spark.sparkContext.defaultParallelism
    val sized = sizedDocs
      .select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"))
      .repartitionByRange(nParts, col("doc_id").asc)
      .sortWithinPartitions("doc_id")
      .rdd.map(r => (r.getLong(0), r.getLong(1)))
    val partTotals = sized
      .mapPartitionsWithIndex { case (i, it) =>
        Iterator.single(i -> it.map(_._2).sum)
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = partTotals.scanLeft(0L)(_ + _)
    val packed = sized.mapPartitionsWithIndex { case (i, it) =>
      var cum = offsets(i)
      it.map { case (id, n) =>
        val bin = cum / budgetTokens // the doc STARTS at offset cum
        cum += n
        (id, n, bin)
      }
    }
    spark.createDataFrame(packed).toDF("doc_id", "n_tokens", "bin_id")
  }

  /** Mergeable per-group statistics over a LONG-valued column — the
    * building block of INCREMENTAL corpus analytics: every statistic
    * carried (count, exact DECIMAL sum, min, max) is a commutative
    * monoid, so stats(corpus + crawl) = [[mergeStats]](stats(corpus),
    * stats(crawl)) without ever rescanning the corpus. Derived metrics
    * (avg) are computed at read time from the carried sums. One
    * groupBy with map-side partials; output is group-count-sized.
    */
  def groupStats(df: DataFrame, keys: Seq[String],
      valueCol: String): DataFrame =
    df.groupBy(keys.map(col): _*).agg(
      count(col(valueCol)).as("n"),
      sum(col(valueCol).cast("decimal(28,6)")).as("sum_v"),
      min(col(valueCol).cast("long")).as("min_v"),
      max(col(valueCol).cast("long")).as("max_v"))

  /** Merge two [[groupStats]] frames: union + monoid re-aggregation.
    * Associative and commutative, so any merge tree over any batch
    * split yields identical statistics (EdgeCase/RelationalSpec assert
    * this against a direct single-scan computation).
    */
  def mergeStats(a: DataFrame, b: DataFrame,
      keys: Seq[String]): DataFrame =
    a.unionByName(b).groupBy(keys.map(col): _*).agg(
      sum(col("n")).as("n"),
      sum(col("sum_v")).as("sum_v"),
      min(col("min_v")).as("min_v"),
      max(col("max_v")).as("max_v"))

  /** Budgeted greedy selection: keep the highest-`scoreCol` documents
    * until the global `weightCol` budget is spent — the corpus-assembly
    * gate that turns "score every doc" into "the N-token training set".
    * A document is kept iff the running weight total INCLUDING it stays
    * within budget (ties broken by doc_id, so the cut is deterministic).
    *
    * Same scale shape as [[packSequences]]: range-partition by
    * (score desc, doc_id), one bounded pass for per-partition totals,
    * one numbering pass — never a `sum() over (order by ...)` global
    * window. Two extra savings at scale: partitions whose starting
    * offset already exceeds the budget emit NOTHING without being
    * scanned, and the in-partition walk short-circuits at the budget
    * boundary (the running sum is monotone, so `takeWhile` is exact).
    */
  def budgetSelect(df: DataFrame, scoreCol: String, weightCol: String,
      budget: Long, partitions: Int = 0): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    val spark = df.sparkSession
    val nParts =
      if (partitions > 0) partitions
      else spark.sparkContext.defaultParallelism
    val sized = df
      .select(col("doc_id"), col(scoreCol).cast("long").as("score"),
        col(weightCol).cast("long").as("w"))
      .repartitionByRange(nParts, col("score").desc, col("doc_id").asc)
      .sortWithinPartitions(col("score").desc, col("doc_id").asc)
      .rdd.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val partTotals = sized
      .mapPartitionsWithIndex { case (i, it) =>
        Iterator.single(i -> it.map(_._3).sum)
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = partTotals.scanLeft(0L)(_ + _)
    val kept = sized.mapPartitionsWithIndex { case (i, it) =>
      // strict: at offset == budget a zero-weight doc still fits
      if (offsets(i) > budget) Iterator.empty
      else {
        var cum = offsets(i)
        it.map { case (id, sc, w) =>
          cum += w
          (id, sc, w, cum)
        }.takeWhile(_._4 <= budget)
      }
    }
    spark.createDataFrame(kept)
      .toDF("doc_id", "score", "n_tokens", "cum_tokens")
  }

  /** Ordered funnel analysis over the events table: how many users
    * reached step k — where reaching step k means a step-k event STRICTLY
    * AFTER that user's first step-(k-1) arrival. Each stage is one
    * filtered scan + equi-join on user_id + min-aggregate: k bounded
    * passes with partial aggregation, never a per-user full-history sort
    * or window — at 100 TB the event log is scanned k times pruned to one
    * event type each (a pushed-down filter), not materialized per user.
    */
  def funnel(events: DataFrame, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val first = events.filter(col("event_type") === steps.head)
      .groupBy("user_id").agg(min("ts").as("t1"))
    val stages = steps.zipWithIndex.drop(1)
      .scanLeft(first) { case (prev, (step, i)) =>
        events.filter(col("event_type") === step)
          .join(prev.select("user_id", s"t$i"), "user_id")
          .filter(col("ts") > col(s"t$i"))
          .groupBy("user_id").agg(min("ts").as(s"t${i + 1}"))
      }
    stages.zipWithIndex.map { case (df, i) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(
          lit(i + 1).cast("long").as("step"),
          lit(steps(i)).as("event_type"),
          col("n_users"))
    }.reduce(_ unionAll _)
  }

  /** Cohort retention: users grouped by the DAY of their first event;
    * for each (cohort day, day offset) the distinct users active that
    * many days later. Two aggregations — first-day per user, then the
    * cohort×offset distinct count — with the per-user cohort table
    * (bounded by user count, far smaller than the event log) joined back
    * broadcast-style. No per-user event-history window.
    */
  def cohortRetention(events: DataFrame): DataFrame = {
    val firstDay = events.groupBy("user_id")
      .agg(to_date(min(col("ts"))).as("cohort_day"))
    events.select(col("user_id"), to_date(col("ts")).as("event_day"))
      .join(firstDay, "user_id")
      .groupBy(
        col("cohort_day").cast("string").as("cohort_day"),
        datediff(col("event_day"), col("cohort_day")).cast("long")
          .as("day_offset"))
      .agg(countDistinct("user_id").as("n_users"))
  }

  /** Deterministic stratified sampling — the source-mixing op that turns
    * "80% web, 15% books, 5% code" target weights into a reproducible
    * keep/drop decision per row: bucket = md5(id) mod 10000 compared to
    * the stratum's rate. Pure per-row projection + filter (no sampler
    * state, no RNG): re-running the pipeline, or running it on a
    * different partitioning, selects the SAME rows — which is what makes
    * the mix auditable and the job retry-safe at scale.
    */
  def stratifiedSampleDeterministic(df: DataFrame, stratumCol: String,
      rates: Map[String, Double], idCol: String,
      defaultRate: Double = 1.0): DataFrame = {
    // bucket = first 16 md5 bits, compared against rate * 2^16: the
    // denominator matches the bucket range EXACTLY, so P(keep) is
    // rate to within 1/65536. (A mod-10000 bucket would over-sample
    // buckets 0..5535 by 7/6 — a systematic ~7% relative bias that the
    // oracle could never catch because it would share the formula.)
    val bucket =
      conv(substring(md5(col(idCol).cast("string")), 1, 4), 16, 10)
        .cast("long")
    val threshold = rates.toSeq.sortBy(_._1).foldLeft(
      lit(math.round(defaultRate * 65536))) { case (acc, (k, v)) =>
      when(col(stratumCol) === k, lit(math.round(v * 65536))).otherwise(acc)
    }
    df.filter(bucket < threshold)
  }

  /** Temperature-scaled source mixing weights — the standard multi-
    * corpus reweighting (weight ∝ n^alpha): alpha = 1 keeps natural
    * proportions, alpha = 0 samples sources uniformly, values between
    * up-weight small high-quality sources without drowning in the big
    * crawl. Output: one row per stratum with its raw count, normalized
    * weight and the expected document count at `budget` — the table you
    * feed [[stratifiedSampleDeterministic]] (rates = expected/n) or
    * [[weightedSamplePerGroup]]. One aggregation, then the normalizer is
    * a one-row total cross-joined back as a broadcast (the [[Graph.hits]]
    * idiom) — never an unpartitioned window, which would funnel the rows
    * through a single partition and trip every plan audit even though
    * the input here is a bounded catalog. Weights are rounded to 6
    * decimals so the table is engine-reproducible.
    */
  def mixingWeights(df: DataFrame, stratumCol: String, alpha: Double,
      budget: Long): DataFrame = {
    require(alpha >= 0 && alpha <= 1, "temperature alpha must be in [0, 1]")
    val raw = df.groupBy(stratumCol)
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("__raw", pow(col("n_docs").cast("double"), lit(alpha)))
    // DECIMAL sum for the normalizer: order-independent, so the weight
    // is identical on any engine/partitioning (the repo-wide
    // determinism convention for fractional aggregates)
    val tot = raw.agg(sum(col("__raw").cast("decimal(30,15)")).as("__tot"))
    raw.crossJoin(broadcast(tot))
      .withColumn("weight",
        round(col("__raw") / col("__tot").cast("double"), 6))
      .withColumn("expected_docs",
        floor(col("weight") * lit(budget.toDouble)).cast("long"))
      .drop("__raw", "__tot")
  }

  /** Parse the events table's JSON `props` column and aggregate the
    * extracted field per event type — the map/semi-structured column
    * surface (events.props carries e.g. {"k": 87}). get_json_object is a
    * codegen'd per-row expression; no UDF, no shuffle beyond the agg.
    */
  def eventPropStats(events: DataFrame): DataFrame =
    events
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(
        sum("k").as("sum_k"),
        max("k").as("max_k"),
        count(col("k")).as("n_with_k"))

  /** [[eventPropStats]] on Spark 4's VARIANT path: the JSON text is
    * parsed ONCE into the binary variant encoding (`parse_json`) and
    * fields are then extracted with `variant_get` — the
    * parse-once/extract-many split that matters at scale, where
    * `get_json_object` re-tokenizes the JSON text for EVERY extracted
    * field and a variant column persisted to parquet makes ingestion a
    * pay-once cost. Same per-type aggregate gate, different engine path
    * (q47 keeps the string-function form under its own oracle).
    */
  def eventPropStatsVariant(events: DataFrame): DataFrame =
    events
      .select(col("event_type"),
        // try_parse_json, not parse_json: the lenient contract of the
        // get_json_object sibling — one malformed props row must
        // null-skip, not kill the whole aggregate
        variant_get(try_parse_json(col("props")), "$.k", "long").as("k"))
      .groupBy("event_type")
      .agg(
        count(col("k")).as("n"),
        sum("k").as("sum_k"),
        min("k").as("min_k"),
        max("k").as("max_k"))
}
