package graft

import org.apache.spark.sql.functions._
import graft.operators.Sketches

class SketchesSpec extends SparkSpec {

  test("approx_count_distinct within rsd of exact at every setting") {
    val r = Sketches.distinctCounts(tables.lineitem).collect()(0)
    val exact = r.getAs[Long]("exact_distinct").toDouble
    exact shouldBe 200.0
    // 5 sigma of the advertised relative standard deviation
    math.abs(r.getAs[Long]("approx_rsd05") - exact) / exact should be < 0.25
    math.abs(r.getAs[Long]("approx_rsd10") - exact) / exact should be < 0.5
    math.abs(r.getAs[Long]("approx_rsd01") - exact) / exact should be < 0.05
  }

  test("bloom filter: no false negatives, probes answer") {
    val r = Sketches.bloomMembership(spark, tables.lineitem, "l_returnflag",
      Seq("A", "N", "R", "X", "Z")).collect()
      .map(x => x.getAs[String]("candidate") -> x.getAs[Boolean]("might_contain"))
      .toMap
    r("A") shouldBe true
    r("N") shouldBe true
    r("R") shouldBe true // present keys can never read false
  }

  test("count-min sketch over-counts, never under-counts") {
    val est = Sketches.cmsFrequencies(spark, tables.lineitem, "l_returnflag",
      Seq("A", "N", "R")).collect()
      .map(x => x.getAs[String]("key") -> x.getAs[Long]("estimate")).toMap
    val exact = Sketches.exactFrequencies(tables.lineitem, "l_returnflag",
      Seq("A", "N", "R")).collect()
      .map(x => x.getAs[String]("key") -> x.getAs[Long]("cnt")).toMap
    exact shouldBe Map("A" -> 1962L, "N" -> 2070L, "R" -> 1968L)
    est.keySet shouldBe exact.keySet
    est.foreach { case (k, e) =>
      e should be >= exact(k)
      // eps=0.01 -> overshoot bounded by eps * stream length
      e should be <= exact(k) + (0.01 * 6000).toLong + 1
    }
  }

  test("portable CMS: over-counts never under-counts; bounded; deterministic") {
    // the oracle-facing md5/integer family must carry the SAME accuracy
    // contract as the native sketch it twins — over a high-cardinality
    // column (2000 distinct order keys in 272 buckets forces real
    // collisions, unlike l_returnflag's 3 values)
    val keys = Seq("1", "7", "32", "9999999") // last one absent
    val est = Sketches.cmsFrequenciesPortable(spark, tables.lineitem,
      "l_orderkey", keys).collect()
      .map(x => x.getAs[String]("key") -> x.getAs[Long]("estimate")).toMap
    val exact = Sketches.exactFrequencies(tables.lineitem, "l_orderkey",
      keys).collect()
      .map(x => x.getAs[String]("key") -> x.getAs[Long]("cnt")).toMap
    est.keySet shouldBe keys.toSet // absent keys still answer (with 0+)
    keys.foreach { k =>
      est(k) should be >= exact.getOrElse(k, 0L)
      // width=272, depth=5 -> overshoot ~ N/width per row, min over rows
      est(k) should be <= exact.getOrElse(k, 0L) + (6.0 * 6000 / 272).toLong
    }
    est shouldBe Sketches.cmsFrequenciesPortable(spark, tables.lineitem,
      "l_orderkey", keys).collect()
      .map(x => x.getAs[String]("key") -> x.getAs[Long]("estimate")).toMap
  }

  test("portable bloom: no false negatives; absent-probe fp rate near spec") {
    // build over the 2000 distinct l_orderkey strings (~21% of the
    // n=1000-sized geometry's saturation -> real bit collisions), probe
    // every present value and 500 known-absent ones
    val present = (1 to 50).map(_.toString)
    val absent = (1000000 to 1000499).map(_.toString)
    val r = Sketches.bloomMembershipPortable(spark, tables.lineitem,
      "l_orderkey", present ++ absent).collect()
      .map(x => x.getAs[String]("candidate") ->
        x.getAs[Boolean]("might_contain")).toMap
    val trulyPresent = tables.lineitem
      .select(col("l_orderkey").cast("string")).distinct()
      .collect().map(_.getString(0)).toSet
    present.filter(trulyPresent).foreach(p => r(p) shouldBe true)
    // fpp is geometry-driven; over-full filter (2000 items in an
    // n=1000 build) still stays well under a loose ceiling
    val fp = absent.count(r(_)) / 500.0
    fp should be < 0.25
  }

  test("portable HLL: per-group estimate within 5 sigma; deterministic") {
    // the oracle-facing register family must carry the native HLL++'s
    // accuracy contract: m=1024 registers -> rsd 1.04/32 = 3.25%, so 5
    // sigma is ~16%. l_orderkey per returnflag is ~600-900 distinct at
    // sf0.001 — real register collisions, nowhere near the
    // linear-counting boundary's engine-sensitive edge
    def run() = Sketches.hllEstimatePortable(tables.lineitem,
      "l_orderkey", "l_returnflag").collect()
      .map(r => r.getAs[String]("key") ->
        (r.getAs[Long]("n_set"), r.getAs[Double]("estimate"),
          r.getAs[Long]("exact_distinct"))).toMap
    val est = run()
    est.keySet shouldBe Set("A", "N", "R")
    est.foreach { case (k, (nSet, e, exact)) =>
      withClue(s"$k: est $e vs exact $exact: ") {
        nSet should be <= 1024L
        nSet should be >= 1L
        math.abs(e - exact) / exact.toDouble should be < 0.16
      }
    }
    est shouldBe run() // register relation + estimate chain deterministic
  }

  test("histogram quantiles: error bound holds; histograms merge by sum") {
    import org.apache.spark.sql.functions.col
    val docs = tables.documents
    val out = Sketches.histogramQuantiles(docs, "n_chars", "lang")
      .collect()
    out should not be empty
    out.foreach { r =>
      val (est, exact) = (r.getAs[Long]("est"), r.getAs[Long]("exact"))
      withClue(s"${r.getAs[String]("key")} p${r.getAs[Long]("p")}: " +
        s"est $est exact $exact: ") {
        // HdrHistogram guarantee at sigBits=4: bucket lower bound is an
        // under-estimate by strictly less than 2^-4 of the true value
        est should be <= exact
        (exact - est).toDouble should be < (exact.toDouble / 16 + 1)
      }
    }
    // mergeability IS summation: histogram(a ∪ b) = histogram(a) +
    // histogram(b), bucket-wise — the fold an appendable stats store uses
    val a = Sketches.histogramBuckets(
      docs.filter(col("doc_id") % 2 === 0), "n_chars", "lang")
    val b = Sketches.histogramBuckets(
      docs.filter(col("doc_id") % 2 === 1), "n_chars", "lang")
    val merged = a.unionByName(b)
      .groupBy("key", "bl", "sh", "idx")
      .agg(org.apache.spark.sql.functions.sum("cnt").as("cnt"))
    val whole = Sketches.histogramBuckets(docs, "n_chars", "lang")
    merged.exceptAll(whole).count() shouldBe 0L
    whole.exceptAll(merged).count() shouldBe 0L
    // constant-state bound: buckets per group ≤ (64 − 4)·2^4 + 2^5
    whole.groupBy("key").count().collect()
      .foreach(_.getLong(1) should be <= ((64 - 4) * 16 + 32).toLong)
  }

  test("hllOverlapPortable: inclusion-exclusion tracks the exact overlap") {
    import SparkSpec.spark.implicits._
    // two corpora with a planned per-key structure: 800 shared values,
    // 400 A-only, 600 B-only
    val a = (0 until 1200).map(i => ("k", s"v$i")).toDF("g", "v")
    val b = (400 until 1800).map(i => ("k", s"v$i")).toDF("g", "v")
    val out = Sketches.hllOverlapPortable(a, b, "v", "g").collect()
    out.length shouldBe 1
    val r = out.head
    r.getAs[Long]("exact_overlap") shouldBe 800L
    val (estA, estB, estU) = (r.getAs[Double]("est_a"),
      r.getAs[Double]("est_b"), r.getAs[Double]("est_union"))
    val ov = r.getAs[Double]("overlap_est")
    // rsd at m=1024 is ~3.25%; inclusion-exclusion compounds three
    // estimates, so gate at 5 sigma of the union cardinality
    math.abs(estA - 1200) should be < (5 * 0.0325 * 1200)
    math.abs(estB - 1400) should be < (5 * 0.0325 * 1400)
    math.abs(ov - 800) should be < (5 * 0.0325 * 1800)
    estU should be <= (estA + estB)
    // identical corpora: identical registers, so union ≡ A and the
    // estimate algebra collapses EXACTLY (not approximately)
    val same = Sketches.hllOverlapPortable(a, a, "v", "g").head()
    same.getAs[Double]("est_union") shouldBe same.getAs[Double]("est_a")
    same.getAs[Double]("overlap_est") shouldBe
      same.getAs[Double]("est_a") +- 1e-6
    // disjoint corpora: exact 0; the estimate floor keeps it >= 0
    val c = (5000 until 5600).map(i => ("k", s"w$i")).toDF("g", "v")
    val dj = Sketches.hllOverlapPortable(a, c, "v", "g").head()
    dj.getAs[Long]("exact_overlap") shouldBe 0L
    dj.getAs[Double]("overlap_est") should
      be >= 0.0
  }

  test("histogram store: folded store answers exactly like inline") {
    val docs = tables.documents
    Seq("hist_store_t", "hist_store_t__spec")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    // build on the even half, fold the odd half in — merge is an exact
    // bucket-wise sum, so the store path must answer IDENTICALLY to the
    // inline whole-corpus run (estimates AND counts, not just close)
    Sketches.buildHistogramStore(
      docs.filter(col("doc_id") % 2 === 0), "n_chars", "lang",
      "hist_store_t")
    Sketches.appendHistogramStore(
      docs.filter(col("doc_id") % 2 === 1), "hist_store_t")
    rowSet(Sketches.histogramQuantilesViaStore(
      docs, "n_chars", "lang", "hist_store_t")) shouldBe
      rowSet(Sketches.histogramQuantiles(docs, "n_chars", "lang"))
    // a store without its spec is half-built: loud, never defaulted
    spark.sql("DROP TABLE IF EXISTS hist_store_t__spec")
    an[IllegalStateException] should be thrownBy
      Sketches.quantilesFromStore(spark, "hist_store_t")
    an[IllegalStateException] should be thrownBy
      Sketches.appendHistogramStore(docs, "hist_store_t")
  }

  test("HLL store: batch-appended store equals single-pass build exactly") {
    import SparkSpec.spark.implicits._
    val docs = tables.documents
    Seq("hll_store_ab", "hll_store_ab__spec", "hll_store_one",
      "hll_store_one__spec")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    // single-pass truth over the whole corpus
    Sketches.buildHllStore(docs, Seq("lang"), "text", "hll_store_one")
    // the same corpus in three arbitrary batches, folded incrementally —
    // HLL union is register-wise max, a pure function of the item SET,
    // so the per-key estimates must be IDENTICAL, not just close
    Sketches.buildHllStore(docs.filter(col("doc_id") % 3 === 0),
      Seq("lang"), "text", "hll_store_ab")
    Sketches.appendHllStore(docs.filter(col("doc_id") % 3 === 1),
      "hll_store_ab")
    Sketches.appendHllStore(docs.filter(col("doc_id") % 3 === 2),
      "hll_store_ab")
    def est(t: String): Map[String, Long] =
      Sketches.hllEstimates(spark, t)
        .as[(String, Long)].collect().toMap
    est("hll_store_ab") shouldBe est("hll_store_one")
    // and the estimates track the exact per-key distincts (lgK 12 →
    // rsd well under 2%; generous 10% gate)
    val exact = docs.groupBy("lang")
      .agg(countDistinct(col("text")).as("n"))
      .as[(String, Long)].collect().toMap
    est("hll_store_one").foreach { case (k, v) =>
      math.abs(v - exact(k)).toDouble / exact(k) should be < 0.1
    }
    // replaying a batch already folded leaves the store unchanged
    Sketches.appendHllStore(docs.filter(col("doc_id") % 3 === 2),
      "hll_store_ab")
    est("hll_store_ab") shouldBe est("hll_store_one")
    // a store without its spec is half-built: loud
    spark.sql("DROP TABLE IF EXISTS hll_store_ab__spec")
    an[IllegalStateException] should be thrownBy
      Sketches.appendHllStore(docs, "hll_store_ab")
  }

  test("heavyHitters equals the exact groupBy-threshold answer") {
    val toks = tables.documents.select(
      explode(graft.operators.TextAnalysis.tokens(col("text"))).as("tok"))
    Seq(1.0 / 64, 1.0 / 128).foreach { share =>
      val n = toks.count()
      val threshold = math.ceil(share * n).toLong
      val exact = rowSet(toks.groupBy(col("tok").as("value"))
        .agg(count(lit(1)).as("n_occurrences"))
        .filter(col("n_occurrences") >= threshold))
      exact.size should be > 0 // the gate must actually gate something
      rowSet(Sketches.heavyHitters(toks, "tok", share)) shouldBe exact
    }
  }

  test("heavyHitters is partitioning-independent despite sketch candidates") {
    val toks = tables.documents.select(
      explode(graft.operators.TextAnalysis.tokens(col("text"))).as("tok"))
    // adversarial layouts: one partition (pure reduce path) vs many
    // tiny ones (merge-heavy path) — the Misra-Gries candidate sets
    // differ, the recounted answer must not
    val one = rowSet(Sketches.heavyHitters(toks.coalesce(1), "tok", 1.0 / 64))
    val many = rowSet(Sketches.heavyHitters(
      toks.repartition(32), "tok", 1.0 / 64))
    one shouldBe many
  }

  test("heavyHitters: tiny stream edge cases") {
    import SparkSpec.spark.implicits._
    val df = Seq("a", "a", "a", "b", "c").toDF("v")
    // share 1/2: only 'a' (3 of 5 >= ceil(2.5))
    rowSet(Sketches.heavyHitters(df, "v", 0.5)) shouldBe
      Set(Seq("a", 3L))
    // share 1: only a value equal to the whole stream qualifies
    Sketches.heavyHitters(df, "v", 1.0).count() shouldBe 0L
    Sketches.heavyHitters(df.limit(0), "v", 0.5).count() shouldBe 0L
  }
}
