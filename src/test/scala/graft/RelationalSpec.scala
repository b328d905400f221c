package graft

import org.apache.spark.sql.functions._
import graft.operators.Relational

/** Golden + plan-shape tests for the relational operator family. Golden
  * values were computed independently with DuckDB over the same parquet.
  */
class RelationalSpec extends SparkSpec {

  test("scanFilterProject filters and projects; filter reaches the scan") {
    val df = Relational.scanFilterProject(tables.lineitem)
    df.columns.toSeq shouldBe Seq("l_orderkey", "l_linenumber", "l_quantity")
    df.filter(col("l_quantity") <= 45.0).count() shouldBe 0
    // predicate pushdown + column pruning visible in the physical plan
    val p = plan(df)
    p should include("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,45.0)]")
    p should include("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_quantity:double>")
  }

  test("pricingSummary matches the DuckDB golden for the A/F group") {
    val r = Relational.pricingSummary(tables.lineitem)
      .filter(col("l_returnflag") === "A" && col("l_linestatus") === "F")
      .collect()(0)
    r.getAs[Double]("sum_qty") shouldBe 24851.0
    r.getAs[Double]("avg_disc") shouldBe 0.0502
    r.getAs[Long]("count_order") shouldBe 977L
  }

  test("pricingSummary groups partition the table exactly") {
    val total = Relational.pricingSummary(tables.lineitem)
      .agg(sum("count_order")).collect()(0).getLong(0)
    total shouldBe tables.lineitem.count()
  }

  test("extremaByKey max >= min for every key") {
    val bad = Relational.extremaByKey(tables.lineitem)
      .filter(col("max_price") < col("min_price")).count()
    bad shouldBe 0
  }

  test("avgBalanceByNation covers all 25 nations") {
    Relational.avgBalanceByNation(tables.customer).count() shouldBe 25
  }

  test("revenueByNation matches the DuckDB golden for NATION_0/AFRICA") {
    val r = Relational.revenueByNation(tables.lineitem, tables.orders,
      tables.customer, tables.nation, tables.region)
      .filter(col("n_name") === "NATION_0").collect()(0)
    r.getAs[String]("r_name") shouldBe "AFRICA"
    r.getAs[Double]("revenue") shouldBe 7249844.1343
    r.getAs[Long]("n_items") shouldBe 142L
    r.getAs[Long]("n_orders") shouldBe 34L
  }

  test("revenueByNation broadcasts the dimension chain") {
    val p = plan(Relational.revenueByNation(tables.lineitem, tables.orders,
      tables.customer, tables.nation, tables.region))
    p should include("BroadcastHashJoin")
  }

  test("topOrdersByPrice compiles to TakeOrderedAndProject (no global sort)") {
    val df = Relational.topOrdersByPrice(tables.orders)
    plan(df) should include("TakeOrderedAndProject")
    val rows = df.collect()
    rows.length shouldBe 10
    rows.head.getAs[Long]("o_orderkey") shouldBe 988L
    rows.head.getAs[Double]("o_totalprice") shouldBe 499705.05
    // descending by price
    rows.map(_.getAs[Double]("o_totalprice")).toSeq shouldBe
      rows.map(_.getAs[Double]("o_totalprice")).sorted(Ordering[Double].reverse).toSeq
  }

  test("topOrdersPerPriority returns exactly N per group, ranked") {
    val df = Relational.topOrdersPerPriority(tables.orders, n = 3)
    val counts = df.groupBy("o_orderpriority").count().collect()
    counts.length shouldBe 5
    all(counts.map(_.getAs[Long]("count"))) shouldBe 3L
  }

  test("bounded-heap top-k per group equals the window form") {
    val heap = rowSet(Relational.topOrdersPerPriorityHeap(tables.orders)
      .select("o_orderpriority", "o_orderkey", "o_totalprice", "rn"))
    val window = rowSet(Relational.topOrdersPerPriority(tables.orders)
      .select("o_orderpriority", "o_orderkey", "o_totalprice", "rn"))
    heap shouldBe window
  }

  test("segmentBalanceGap and segmentBalancePivot agree") {
    val gap = rowSet(Relational.segmentBalanceGap(tables.customer))
    val piv = rowSet(Relational.segmentBalancePivot(tables.customer))
    gap shouldBe piv
  }

  test("distinctPartCount matches golden") {
    val r = Relational.distinctPartCount(tables.lineitem).collect()(0)
    r.getAs[Long]("distinct_parts") shouldBe 200L
    r.getAs[Long]("total_rows") shouldBe 6000L
  }

  test("set operations partition consistently") {
    val inter = Relational.nationsIntersect(tables.customer, tables.supplier)
    val exc = Relational.nationsExcept(tables.customer, tables.supplier)
    val uni = Relational.nationsUnion(tables.customer, tables.supplier)
    // customer nations = intersect ∪ except, disjointly
    val custN = tables.customer.select(col("c_nationkey")).distinct().count()
    inter.count() + exc.count() shouldBe custN
    uni.count() should be >= custN
  }

  test("userRunningValue is cumulative and ends at the per-user total") {
    val df = Relational.userRunningValue(tables.events)
    val perUserMax = df.groupBy("user_id")
      .agg(max("running_value").as("final_run"),
        max("event_seq").as("n"))
    val expected = tables.events.groupBy("user_id")
      .agg(sum(col("value").cast("decimal(18,2)")).cast("double")
        .as("total"), count(lit(1)).as("cnt"))
    val joined = perUserMax.join(expected, "user_id")
      .filter(abs(col("final_run") - col("total")) > 1e-9 ||
        col("n") =!= col("cnt"))
    joined.count() shouldBe 0
  }

  test("eventsHourly bucket counts sum to the table size") {
    Relational.eventsHourly(tables.events)
      .agg(sum("n_events")).collect()(0).getLong(0) shouldBe
      tables.events.count()
  }

  test("sessionize splits at inactivity gaps and aggregates per session") {
    import SparkSpec.spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 10:00:00")
    def at(min: Int) = new java.sql.Timestamp(t0.getTime + min * 60000L)
    val ev = Seq(
      (1L, at(0), 7L, "click", 1.0, "{}"),
      (2L, at(10), 7L, "click", 2.0, "{}"),   // same session (10 min gap)
      (3L, at(45), 7L, "click", 4.0, "{}"),   // new session (35 min gap)
      (4L, at(0), 8L, "view", 8.0, "{}")      // other user
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val sessions = Relational.sessionize(ev).orderBy("user_id", "session_id")
      .collect()
    sessions.length shouldBe 3
    val u7 = sessions.filter(_.getAs[Long]("user_id") == 7L)
    u7.map(_.getAs[Long]("n_events")).toSeq shouldBe Seq(2L, 1L)
    u7(0).getAs[Double]("duration_sec") shouldBe 600.0
    u7(0).getAs[Double]("session_value") shouldBe 3.0
    u7(1).getAs[Double]("session_value") shouldBe 4.0
  }

  test("sampleLineitem is deterministic under a fixed seed") {
    val a = Relational.sampleLineitem(tables.lineitem).count()
    val b = Relational.sampleLineitem(tables.lineitem).count()
    a shouldBe b
    a should be > 0L
  }

  test("hashSample: layout-invariant, nested, near the target fraction") {
    import org.apache.spark.sql.functions.{col, concat_ws}
    val key = concat_ws("_", col("l_orderkey"), col("l_linenumber"))
    def ids(df: org.apache.spark.sql.DataFrame, f: Double) =
      Relational.hashSample(df, key, f)
        .select("l_orderkey", "l_linenumber").collect()
        .map(r => (r.get(0), r.get(1))).toSet
    val li = tables.lineitem
    val s10 = ids(li, 0.1)
    // the property RNG .sample lacks: membership is a function of the
    // KEY, so any repartition/reorder of the input yields the SAME rows
    ids(li.repartition(13, col("l_partkey")), 0.1) shouldBe s10
    // same-salt samples nest: shrinking the fraction subsets, never
    // resamples
    val s2 = ids(li, 0.02)
    s2.subsetOf(s10) shouldBe true
    // Bernoulli concentration over DISTINCT keys (membership is per-key,
    // and the synthetic lineitem has duplicate (orderkey, linenumber)
    // pairs): ~N(nf, nf(1-f)), 5 sigma
    val n = li.select(key.as("k")).distinct().count().toDouble
    math.abs(s10.size - 0.1 * n) should be <
      (5 * math.sqrt(n * 0.1 * 0.9))
    math.abs(s2.size - 0.02 * n) should be <
      (5 * math.sqrt(n * 0.02 * 0.98))
    // boundary fractions keep row multiplicity intact
    Relational.hashSample(li, key, 0.0).count() shouldBe 0L
    Relational.hashSample(li, key, 1.0).count() shouldBe li.count()
  }

  test("mixtureSample: per-group fractions, allowlist drop, group-wise nesting") {
    import org.apache.spark.sql.functions.col
    val docs = tables.documents
    val mix = Map("en" -> 0.5, "fr" -> 0.25, "de" -> 0.75, "zh" -> 0.1)
    val out = Relational.mixtureSample(docs, col("doc_id"), col("lang"), mix)
    // absent group = fraction 0 (the allowlist semantics)
    out.filter(col("lang") === "es").count() shouldBe 0L
    // per-group counts concentrate at fraction * group size (5 sigma)
    val sizes = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    out.groupBy("lang").count().collect().foreach { r =>
      val (g, got) = (r.getString(0), r.getLong(1))
      val (n, f) = (sizes(g).toDouble, mix(g))
      math.abs(got - f * n) should be < (5 * math.sqrt(n * f * (1 - f)) + 1)
    }
    // group-wise nesting: shrinking en 0.5 -> 0.2 SUBSETS the mix
    val smaller = Relational.mixtureSample(docs, col("doc_id"),
      col("lang"), mix.updated("en", 0.2))
    smaller.exceptAll(out).count() shouldBe 0L
    // and a per-group predicate equals hashSample run on that group alone
    rowSet(out.filter(col("lang") === "fr")) shouldBe
      rowSet(Relational.hashSample(docs.filter(col("lang") === "fr"),
        col("doc_id"), 0.25))
  }

  test("tokenBudgetMix: budgets met in expectation; f=1 branch; allowlist") {
    import org.apache.spark.sql.functions.{col, size => asize}
    val docs = tables.documents
    val w = asize(graft.operators.TextAnalysis.tokens(col("text")))
    val budgets = Map("en" -> 3000L, "de" -> 2000L, "zh" -> 400L,
      "fr" -> 10000000L)
    val out = Relational.tokenBudgetMix(docs, col("doc_id"), col("lang"),
      w, budgets)
    out.filter(col("lang") === "es").count() shouldBe 0L // allowlist
    // fr's budget exceeds its total mass -> the f = 1 branch keeps ALL
    out.filter(col("lang") === "fr").count() shouldBe
      docs.filter(col("lang") === "fr").count()
    // kept token mass per budgeted lang concentrates at the budget:
    // Bernoulli over docs with weights; allow a generous 50% band (the
    // oracle locks exactness — this asserts the SEMANTICS of the knob)
    val kept = out.withColumn("w", w.cast("long"))
      .groupBy("lang").agg(org.apache.spark.sql.functions.sum("w").as("kw"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    Seq("en", "de", "zh").foreach { g =>
      val b = budgets(g).toDouble
      withClue(s"$g kept ${kept(g)} vs budget $b: ") {
        math.abs(kept(g) - b) should be < (0.5 * b)
      }
    }
  }

  test("temperatureMix: √-flattening; nesting; clamp; no allowlist") {
    import org.apache.spark.sql.functions.{col, size => asize, sum => asum}
    val docs = tables.documents
    val w = asize(graft.operators.TextAnalysis.tokens(col("text")))
    val out = Relational.temperatureMix(docs, col("doc_id"), col("lang"),
      w, 20000L)
    // budget >= total mass -> the f = 1 clamp keeps EVERY row
    Relational.temperatureMix(docs, col("doc_id"), col("lang"), w,
      100000000L).count() shouldBe docs.count()
    // zero budget over nonzero-mass groups keeps nothing
    Relational.temperatureMix(docs, col("doc_id"), col("lang"), w, 0L)
      .count() shouldBe 0L
    // same-salt budgets NEST (thresholds monotone in the budget):
    // shrinking the budget only drops rows, never resamples
    val small = Relational.temperatureMix(docs, col("doc_id"),
      col("lang"), w, 8000L)
    small.join(out, Seq("doc_id"), "left_anti").count() shouldBe 0L
    // √-share flattening: the smallest-mass lang keeps a LARGER
    // fraction of its mass than the largest-mass lang (f ∝ 1/√T)
    val mass = docs.withColumn("w", w.cast("long")).groupBy("lang")
      .agg(asum("w").as("t")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = out.withColumn("w", w.cast("long")).groupBy("lang")
      .agg(asum("w").as("kw")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val largest = mass.maxBy(_._2)._1
    val smallest = mass.minBy(_._2)._1
    val fLarge = kept.getOrElse(largest, 0L).toDouble / mass(largest)
    val fSmall = kept.getOrElse(smallest, 0L).toDouble / mass(smallest)
    withClue(s"f($smallest)=$fSmall vs f($largest)=$fLarge: ") {
      fSmall should be > fLarge
    }
    // repartition-invariant (content-addressed membership)
    rowSet(out) shouldBe rowSet(Relational.temperatureMix(
      docs.repartition(7), col("doc_id"), col("lang"), w, 20000L))
  }

  test("packSequences equals the sequential prefix-sum reference") {
    val packed = Relational.packSequences(tables.documents,
      budgetTokens = 512)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // sequential reference: running token sum in doc_id order
    var cum = 0L
    packed.foreach { case (_, n, bin) =>
      bin shouldBe cum / 512
      cum += n
    }
    // multiple bins actually produced, ids non-decreasing
    packed.map(_._3).distinct.length should be > 1
    packed.map(_._3).toSeq shouldBe packed.map(_._3).toSeq.sorted
  }

  test("packSequences plan has no single-partition global window") {
    // the distributed prefix sum must NOT plan a Window over an empty
    // partition spec (which funnels every row through one reducer)
    val p = Relational.packSequences(tables.documents, 512)
      .queryExecution.executedPlan.toString
    p should not include "Window"
  }

  test("funnel pushes the event-type filter into each stage's scan") {
    val p = Relational.funnel(tables.events, Seq("view", "click"))
      .queryExecution.executedPlan.toString
    p should include("PushedFilters")
    p should include("event_type")
  }

  test("funnel: counts users per ordered step, order constraint enforced") {
    import SparkSpec.spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val events = Seq(
      // u1 completes the funnel in order
      (1L, ts("2026-01-01 10:00:00"), "view"),
      (1L, ts("2026-01-01 10:01:00"), "click"),
      (1L, ts("2026-01-01 10:02:00"), "purchase"),
      // u2 views then clicks, never purchases
      (2L, ts("2026-01-01 11:00:00"), "view"),
      (2L, ts("2026-01-01 11:05:00"), "click"),
      // u3 purchases BEFORE viewing - must not count past step 1
      (3L, ts("2026-01-01 09:00:00"), "purchase"),
      (3L, ts("2026-01-01 09:30:00"), "view"),
      // u4 never views - counts nowhere
      (4L, ts("2026-01-01 12:00:00"), "click")
    ).toDF("user_id", "ts", "event_type")
    val out = Relational.funnel(events, Seq("view", "click", "purchase"))
      .orderBy("step").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    out.toSeq shouldBe Seq(
      (1L, "view", 3L), (2L, "click", 2L), (3L, "purchase", 1L))
  }

  test("stratifiedSampleDeterministic: reproducible, honest rates") {
    def run() = Relational.stratifiedSampleDeterministic(
      tables.documents.select("doc_id", "lang"),
      "lang", Map("en" -> 0.5, "zh" -> 0.25), "doc_id")
    val a = run().collect().map(_.getLong(0)).toSet
    a shouldBe run().collect().map(_.getLong(0)).toSet // same rows again
    val total = tables.documents.filter(col("lang") === "en").count()
    val kept = run().filter(col("lang") === "en").count()
    // md5 buckets are uniform-ish; 500-doc strata land near the target
    kept.toDouble / total shouldBe 0.5 +- 0.15
    // unlisted strata keep everything (default rate 1.0)
    val frTotal = tables.documents.filter(col("lang") === "fr").count()
    run().filter(col("lang") === "fr").count() shouldBe frTotal
  }

  test("standardizeByGroup: hand-computed z-scores, constant group -> 0") {
    import SparkSpec.spark.implicits._
    val df = Seq(("x", 1.0), ("x", 2.0), ("x", 3.0), ("c", 5.0), ("c", 5.0))
      .toDF("event_type", "value")
    val out = Relational.standardizeByGroup(df)
      .orderBy("event_type", "value").collect()
    // group c: sigma 0 -> z 0 for both rows
    out(0).getDouble(2) shouldBe 0.0
    out(1).getDouble(2) shouldBe 0.0
    // group x: mu 2, sigma sqrt(2/3); z(1) = -1/sigma rounded to 4
    val sigma = math.sqrt(2.0 / 3.0)
    out(2).getDouble(2) shouldBe BigDecimal(-1.0 / sigma)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    out(3).getDouble(2) shouldBe 0.0
    out(4).getDouble(2) shouldBe BigDecimal(1.0 / sigma)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  test("standardizeByGroup: broadcast stats join, no per-group window") {
    val p = plan(Relational.standardizeByGroup(tables.events))
    p should include("BroadcastHashJoin")
    p should not include "Window"
  }

  test("reservoirSamplePerGroup: k per group, layout-independent, uniform-ish") {
    val base = Relational.reservoirSamplePerGroup(
      tables.events, "event_type", "event_id", k = 7).collect()
    base.groupBy(_.getString(0)).foreach { case (_, rows) =>
      rows.length shouldBe 7
      rows.map(_.getLong(2)).sorted.toSeq shouldBe (1L to 7L)
    }
    // the defining property: the SAME sample on a different partitioning
    val reshuffled = Relational.reservoirSamplePerGroup(
      tables.events.repartition(13), "event_type", "event_id", k = 7)
      .collect()
    reshuffled.map(_.toSeq).toSet shouldBe base.map(_.toSeq).toSet
    // a different seed draws a different sample
    val reseeded = Relational.reservoirSamplePerGroup(
      tables.events, "event_type", "event_id", k = 7, seed = "other")
      .collect()
    reseeded.map(_.toSeq).toSet should not be base.map(_.toSeq).toSet
  }

  test("weightedSamplePerGroup: weight-proportional, deterministic, bounded") {
    import SparkSpec.spark.implicits._
    // one heavyweight item among 200 lightweights: with weight 10000x it
    // must out-draw them (P(excluded from top-10) is astronomically small)
    val df = ((1 to 200).map(i => ("g", s"id_$i", 1.0)) :+
      (("g", "heavy", 10000.0))).toDF("grp", "id", "w")
    val out = Relational.weightedSamplePerGroup(df, "grp", "id", "w", k = 10)
      .collect()
    out.length shouldBe 10
    out.map(_.getString(1)) should contain("heavy")
    // layout-independence: identical sample on a different partitioning
    val reshuffled = Relational.weightedSamplePerGroup(
      df.repartition(7), "grp", "id", "w", k = 10).collect()
    reshuffled.map(_.toSeq).toSet shouldBe out.map(_.toSeq).toSet
    // zero/negative weights and null ids are excluded, not crashed on
    val edge = Seq(("g", Some("a"), 1.0), ("g", Some("b"), 0.0),
      ("g", Some("c"), -5.0), ("g", None, 2.0))
      .toDF("grp", "id", "w")
    val kept = Relational.weightedSamplePerGroup(edge, "grp", "id", "w", k = 5)
      .collect()
    kept.map(_.getString(1)).toSeq shouldBe Seq("a")
  }

  test("mixingWeights: alpha endpoints give natural vs uniform mixes") {
    import SparkSpec.spark.implicits._
    val df = (Seq.fill(900)("big") ++ Seq.fill(100)("small")).toDF("src")
    // alpha = 1: natural proportions
    val nat = Relational.mixingWeights(df, "src", alpha = 1.0, budget = 1000)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    nat("big") shouldBe 0.9
    nat("small") shouldBe 0.1
    // alpha = 0: uniform regardless of size
    val uni = Relational.mixingWeights(df, "src", alpha = 0.0, budget = 1000)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    uni("big") shouldBe 0.5
    uni("small") shouldBe 0.5
    // 0 < alpha < 1 up-weights the small source relative to natural
    val mid = Relational.mixingWeights(df, "src", alpha = 0.5, budget = 1000)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    mid("small") should be > 0.1
    mid("small") should be < 0.5
    // expected_docs sums to <= budget (floor never overshoots)
    val exp = Relational.mixingWeights(df, "src", alpha = 0.5, budget = 1000)
      .collect().map(_.getLong(3)).sum
    exp should be <= 1000L
  }

  test("standardizeByGroup: null values neither count nor deflate the mean") {
    import SparkSpec.spark.implicits._
    val df = Seq(("x", Some(10.0)), ("x", Some(10.0)), ("x", None))
      .toDF("event_type", "value")
    val out = Relational.standardizeByGroup(df)
      .orderBy(col("value").asc_nulls_last).collect()
    // the two real rows: constant value -> sigma 0 -> z 0 (not 0.7071,
    // which is what counting the null row into n would produce)
    out(0).getDouble(2) shouldBe 0.0
    out(1).getDouble(2) shouldBe 0.0
    out(2).isNullAt(2) shouldBe true // null value -> null z
  }

  test("reservoirSamplePerGroup: string ids and null ids are handled") {
    import SparkSpec.spark.implicits._
    val docs = Seq(("a", Some("s3://x/1")), ("a", Some("s3://x/2")),
      ("a", Some("s3://x/3")), ("a", None), ("b", Some("s3://y/1")))
      .toDF("source", "doc_uri")
    val out = Relational.reservoirSamplePerGroup(docs, "source", "doc_uri",
      k = 2).collect()
    out.count(_.getString(0) == "a") shouldBe 2
    out.count(_.getString(0) == "b") shouldBe 1
    out.foreach(r => r.getString(1) should startWith("s3://"))
  }

  test("shuffleShard: permutation rank, balanced shards, layout-independent") {
    import SparkSpec.spark.implicits._
    val docs = tables.documents.select("doc_id", "source")
    val n = docs.count()
    val a = Relational.shuffleShard(docs, "doc_id", 8)
    a.agg(min("shuffle_rank"), max("shuffle_rank"),
      countDistinct("shuffle_rank")).as[(Long, Long, Long)]
      .head() shouldBe ((0L, n - 1, n))
    val sizes = a.groupBy("shard").count()
      .select("count").as[Long].collect()
    sizes.length shouldBe 8
    (sizes.max - sizes.min) should be <= 1L
    // same assignment regardless of the input's physical layout
    val b = Relational.shuffleShard(docs.repartition(13), "doc_id", 8)
    a.except(b).count() shouldBe 0
  }

  test("budgetSelect keeps the exact score-ranked prefix within budget") {
    import SparkSpec.spark.implicits._
    val docs = Seq(
      (1L, 10L, 30L), // ties doc 4 on score; lower id ranks first
      (2L, 30L, 50L), // best -> cum 50
      (3L, 20L, 40L), // second -> cum 90
      (4L, 10L, 40L), // cum 160 > 125: the cut
      (5L, 5L, 10L)   // would fit (10 tokens) but is past the cut
    ).toDF("doc_id", "n_chars", "n_tokens")
    val out = Relational.budgetSelect(docs, "n_chars", "n_tokens",
      budget = 125L, partitions = 3)
      .select("doc_id", "cum_tokens").as[(Long, Long)]
      .collect().sortBy(_._1).toSeq
    // rank order: 2 (50), 3 (90), 1 (120), 4 (160 > 125 cut), 5 never
    out shouldBe Seq((1L, 120L), (2L, 50L), (3L, 90L))
  }

  test("budgetSelect cut is independent of partitioning") {
    val docs = tables.documents.select(col("doc_id"), col("n_chars"),
      org.apache.spark.sql.functions.length(col("text")).cast("long")
        .as("n_tokens"))
    val a = Relational.budgetSelect(docs, "n_chars", "n_tokens",
      budget = 50000L, partitions = 2).collect().sortBy(_.getLong(0)).toSeq
    val b = Relational.budgetSelect(docs.repartition(17), "n_chars",
      "n_tokens", budget = 50000L, partitions = 11)
      .collect().sortBy(_.getLong(0)).toSeq
    a shouldBe b
    a.nonEmpty shouldBe true
  }

  test("groupStats/mergeStats: any merge tree equals the direct scan") {
    val docs = tables.documents
    val direct = Relational.groupStats(docs, Seq("source"), "n_chars")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDecimal(2), r.getLong(3), r.getLong(4))).toMap
    // three-way split, merged left-deep AND right-deep
    val parts = (0 to 2).map(i =>
      Relational.groupStats(docs.filter(col("doc_id") % 3 === i),
        Seq("source"), "n_chars"))
    def toMapOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDecimal(2), r.getLong(3), r.getLong(4))).toMap
    val leftDeep = toMapOf(Relational.mergeStats(
      Relational.mergeStats(parts(0), parts(1), Seq("source")),
      parts(2), Seq("source")))
    val rightDeep = toMapOf(Relational.mergeStats(parts(0),
      Relational.mergeStats(parts(1), parts(2), Seq("source")),
      Seq("source")))
    leftDeep shouldBe direct
    rightDeep shouldBe direct
  }

  test("mergeChangeset applies upserts and deletes, passes the rest") {
    import SparkSpec.spark.implicits._
    val base = Seq((1L, "one", 10L), (2L, "two", 20L), (3L, "three", 30L))
      .toDF("id", "name", "v")
    val changes = Seq(
      (2L, Some("TWO"), Some(22L), "upsert"),  // replace existing
      (3L, None, None, "delete"),              // remove
      (4L, Some("four"), Some(40L), "upsert")  // insert new key
    ).toDF("id", "name", "v", "op")
    val out = Relational.mergeChangeset(base, changes, "id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    out shouldBe Set((1L, "one", 10L), (2L, "TWO", 22L), (4L, "four", 40L))
  }

  test("mergeChangeset raises loudly on an unknown op") {
    import SparkSpec.spark.implicits._
    val base = Seq((1L, "one")).toDF("id", "name")
    val changes = Seq((1L, "uno", "replace")).toDF("id", "name", "op")
    val ex = intercept[Exception] {
      Relational.mergeChangeset(base, changes, "id").collect()
    }
    ex.getMessage should include("unknown op")
  }
}
