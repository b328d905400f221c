package graft

import org.apache.spark.sql.functions._
import graft.operators.{TextAnalysis, TextOps}

class TextSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  private lazy val tiny = Seq(
    (1L, "the cat  sat", "en", "s", 12L),
    (2L, "THE CAT SAT", "en", "s", 11L),
    (3L, "", "en", "s", 0L)
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  test("wordCount golden: most frequent corpus word") {
    val top = TextOps.wordCount(tables.documents)
      .orderBy(col("cnt").desc, col("word")).collect()(0)
    top.getAs[String]("word") shouldBe "scan"
    top.getAs[Long]("cnt") shouldBe 984L
  }

  test("wordCount total equals token count (tokenizers agree)") {
    val wcTotal = TextOps.wordCount(tables.documents)
      .agg(sum("cnt")).collect()(0).getLong(0)
    val taTotal = TextAnalysis.tokenStatsByLang(tables.documents)
      .agg(sum("total_tokens")).collect()(0).getLong(0)
    wcTotal shouldBe taTotal
  }

  test("tokenizer handles runs of whitespace and empty text") {
    val q = TextAnalysis.qualityFeatures(tiny).orderBy("doc_id").collect()
    q(0).getAs[Long]("n_tokens") shouldBe 3L // double space != empty token
    q(2).getAs[Long]("n_tokens") shouldBe 0L
    assert(q(2).isNullAt(q(2).fieldIndex("avg_token_len"))) // guarded div
  }

  test("wordLengthCount weights sum to total tokens") {
    val wl = TextOps.wordLengthCount(tables.documents)
    val total = wl.agg(sum("cnt")).collect()(0).getLong(0)
    TextOps.wordCount(tables.documents)
      .agg(sum("cnt")).collect()(0).getLong(0) shouldBe total
  }

  test("avgWordLengthByInitial: every initial is one character") {
    val bad = TextOps.avgWordLengthByInitial(tables.documents)
      .filter(expr("length(initial) <> 1")).count()
    bad shouldBe 0L
  }

  test("invertedIndex caps postings but reports exact n_docs") {
    val idx = TextOps.invertedIndex(tables.documents, maxPostings = 5)
    val r = idx.collect()
    all(r.map(_.getAs[String]("postings").split(",").length)) should be <= 5
    // n_docs exact: 'scan' appears in more than 5 docs
    val scan = idx.filter(col("word") === "scan").collect()(0)
    scan.getAs[Long]("n_docs") should be > 5L
    // postings are the lowest doc ids, ascending
    val p = scan.getAs[String]("postings").split(",").map(_.toLong)
    p.toSeq shouldBe p.sorted.toSeq
  }

  test("tfIdf: ubiquitous terms score near tf, rare terms above it") {
    val scores = TextOps.tfIdf(tables.documents)
    // smoothed idf >= 1, so tf_idf >= tf always
    scores.filter(col("tf_idf") < col("tf")).count() shouldBe 0
    // a word in every doc has idf == ln((N+1)/(N+1)) + 1 == exactly 1
    val nDocs = tables.documents.count()
    val everywhere = scores.groupBy("word")
      .agg(count(lit(1)).as("df"), max(col("tf_idf") / col("tf")).as("r"))
      .filter(col("df") === nDocs)
    everywhere.filter(col("r") =!= 1.0).count() shouldBe 0
  }

  test("bm25: positive scores; rarer term outranks commoner one at equal tf") {
    val scores = TextOps.bm25(tables.documents)
    scores.filter(col("bm25") <= 0).count() shouldBe 0
    // document frequency per word, to order terms by rarity
    val docFreq = scores.groupBy("word").agg(count(lit(1)).as("df"))
    val s = scores.join(docFreq, "word")
    // same doc + same tf => identical length normalization, so the score
    // must be strictly monotone in idf: strictly smaller df, higher score
    val violations = s.alias("a").join(s.alias("b"),
      expr("a.doc_id = b.doc_id AND a.tf = b.tf AND a.df < b.df"))
      .filter(expr("a.bm25 <= b.bm25")).count()
    violations shouldBe 0
  }

  test("collocations: perfectly-coupled bigram scores high positive PMI") {
    val docs = Seq.tabulate(20)(i =>
      (i.toLong, s"alpha beta x$i filler", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextOps.collocations(docs, minCount = 5)
      .collect().map(r => (r.getAs[String]("w1"), r.getAs[String]("w2"),
        r.getAs[Double]("pmi"))).toList
    // 'alpha beta' occurs in every doc and alpha/beta never occur apart
    val ab = out.filter(p => p._1 == "alpha" && p._2 == "beta")
    ab.length shouldBe 1
    ab.head._3 should be > 1.0
  }

  test("invertedIndexPositions assigns global word positions in file order") {
    val lines = Seq("alpha beta alpha", "gamma alpha").toDF("value")
    val idx = TextOps.invertedIndexPositions(lines)
      .collect().map(r => r.getAs[String]("word") ->
        (r.getAs[String]("positions"), r.getAs[Long]("n_occurrences"))).toMap
    idx("alpha") shouldBe (("0,2,4", 3L))
    idx("beta") shouldBe (("1", 1L))
    idx("gamma") shouldBe (("3", 1L))
  }

  test("fingerprint collapses case and whitespace differences") {
    val fps = TextAnalysis.fingerprints(tiny).collect()
    fps(0).getAs[String]("fp") shouldBe fps(1).getAs[String]("fp")
  }

  test("languageId returns unknown for zero marker hits, never guesses") {
    val pred = TextAnalysis.languageId(tiny).orderBy("doc_id").collect()
    pred(0).getAs[String]("predicted_lang") shouldBe "en" // 'the' marker
    pred(2).getAs[String]("predicted_lang") shouldBe "unknown"
  }

  test("corpusStats totals match the raw table") {
    val total = TextAnalysis.corpusStats(tables.documents)
      .agg(sum("total_chars")).collect()(0).getLong(0)
    tables.documents.agg(sum("n_chars")).collect()(0).getLong(0) shouldBe total
  }

  test("tokenQuantiles: approx sketch lands near the exact percentiles") {
    val exact = TextAnalysis.tokenQuantiles(tables.documents, exact = true)
      .orderBy("lang").collect()
    val approx = TextAnalysis.tokenQuantiles(tables.documents)
      .orderBy("lang").collect()
    exact.length shouldBe approx.length
    exact.zip(approx).foreach { case (e, a) =>
      a.getString(0) shouldBe e.getString(0)
      a.getLong(1) shouldBe e.getLong(1)           // counts exact
      a.getLong(5) shouldBe e.getLong(5)           // max exact
      // percentile sketch within 10% relative of the true quantile
      Seq(2, 3, 4).foreach { i =>
        math.abs(a.getDouble(i) - e.getDouble(i)) should be <=
          (0.1 * e.getDouble(i))
      }
    }
    // quantiles are ordered: p50 <= p90 <= p99 <= max
    exact.foreach { r =>
      r.getDouble(2) should be <= r.getDouble(3)
      r.getDouble(3) should be <= r.getDouble(4)
      r.getDouble(4) should be <= r.getLong(5).toDouble
    }
  }

  test("repetitionSignals: hand-computed ratios, null-guarded empties") {
    val docs = Seq(
      (1L, "a a a b"),          // 4 tokens, 2 distinct; bigrams: aa,aa,ab
      (2L, "x! y? z."),         // 3 symbols of 8 chars; no repeated bigram
      (3L, "")                  // empty: every ratio null
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionSignals(docs).orderBy("doc_id")
      .collect()
    out(0).getLong(1) shouldBe 4L
    out(0).getDouble(2) shouldBe 0.5   // 1 - 2/4
    out(0).getDouble(3) shouldBe 0.6667 // "a a" twice of 3 bigrams
    out(1).getDouble(2) shouldBe 0.0
    out(1).getDouble(3) shouldBe 0.5   // both bigrams distinct -> 1/2
    out(1).getDouble(4) shouldBe 0.375 // 3 symbol chars / 8
    out(2).getLong(1) shouldBe 0L
    out(2).isNullAt(2) shouldBe true
    out(2).isNullAt(3) shouldBe true
    out(2).isNullAt(4) shouldBe true
  }

  test("chunkDocuments: sliding windows with overlap, short tail chunk") {
    import SparkSpec.spark.implicits._
    val docs = Seq((1L, "a b c d e"), (2L, "")).toDF("doc_id", "text")
    val out = TextOps.chunkDocuments(docs, chunkTokens = 3, stride = 2)
      .orderBy("doc_id", "chunk_id").collect()
    out.map(_.getString(2)).toSeq shouldBe Seq("a b c", "c d e", "e")
    out.map(_.getLong(3)).toSeq shouldBe Seq(3L, 3L, 1L)
    // empty document yields no chunks at all
    out.map(_.getLong(0)).distinct.toSeq shouldBe Seq(1L)
  }

  test("chunkDocuments: stride == chunkTokens reconstructs the corpus") {
    import SparkSpec.spark.implicits._
    val docs = Seq((1L, "one two three four five six seven"))
      .toDF("doc_id", "text")
    val rebuilt = TextOps.chunkDocuments(docs, chunkTokens = 3, stride = 3)
      .orderBy("chunk_id").collect().map(_.getString(2)).mkString(" ")
    rebuilt shouldBe "one two three four five six seven"
    an[IllegalArgumentException] should be thrownBy
      TextOps.chunkDocuments(docs, chunkTokens = 3, stride = 4)
  }

  test("vocabCoverage: deterministic top-k vocab, exact OOV accounting") {
    import SparkSpec.spark.implicits._
    val docs = Seq(
      (1L, "a a a b b c", "s1"), // a:3 b:2 c:1
      (2L, "a b x y", "s2")      // corpus: a:4 b:3 c:1 x:1 y:1
    ).toDF("doc_id", "text", "source")
    // k=3 vocab is {a, b, c}: c beats x/y on the word-asc tiebreak
    val out = TextOps.vocabCoverage(docs, vocabSize = 3).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    out("s1") shouldBe ((6L, 0L, 0.0))
    out("s2") shouldBe ((4L, 2L, 0.5)) // x, y are OOV
    // the vocab side broadcasts; no shuffle join for the coverage pass
    plan(TextOps.vocabCoverage(docs, 3)) should include("BroadcastHashJoin")
  }

  test("fluencyScores: hand-computed bigram log-probs, bag semantics") {
    import SparkSpec.spark.implicits._
    val docs = Seq(
      (1L, "a b a b"), // bigrams (a,b),(b,a),(a,b) — repeats score twice
      (2L, "a b c"),   // (a,b),(b,c)
      (3L, "x")        // one token: no bigrams, null score
    ).toDF("doc_id", "text")
    // corpus: c(a,b)=3, c(b,a)=1, c(b,c)=1; prefixes a·=3, b·=2
    // terms: ln(1)=0 for (a,b); ln(1/2) for (b,a) and (b,c)
    val out = TextAnalysis.fluencyScores(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    out(1L)._1 shouldBe 3L
    out(1L)._2.get shouldBe math.log(0.5) / 3 +- 1e-6
    out(2L)._1 shouldBe 2L
    out(2L)._2.get shouldBe math.log(0.5) / 2 +- 1e-6
    out(3L) shouldBe ((0L, None))
  }

  test("crossPerplexity: hand-computed add-1 scores; unseen smooths to 1/V") {
    import SparkSpec.spark.implicits._
    val ref = Seq((10L, "a b"), (11L, "a b"), (12L, "a c"))
      .toDF("doc_id", "text") // V = {a,b,c} = 3; c(a,b)=2 c(a,c)=1; a·=3
    val cand = Seq(
      (1L, "a b"), // ln((2+1)/(3+3)) = ln(1/2) → nll = ln 2
      (2L, "z q"), // unseen prefix: ln((0+1)/(0+3)) → nll = ln 3
      (3L, "a")    // one token: no bigrams, null
    ).toDF("doc_id", "text")
    val out = TextAnalysis.crossPerplexity(ref, cand).collect()
      .map(r => r.getLong(0) -> (r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    out(1L)._1 shouldBe 1L
    out(1L)._2.get shouldBe math.log(2.0) +- 1e-6
    out(2L)._2.get shouldBe math.log(3.0) +- 1e-6
    out(3L) shouldBe ((0L, None))
    // the filter's point: reference-like text scores lower than noise
    out(1L)._2.get should be < out(2L)._2.get
  }

  test("nll wrap guard: a doc past the bigram headroom fails loudly") {
    // the production bound (~3·10⁸ bigrams/doc) is unreachable in a
    // test, so the guard is exercised through its test-only override:
    // under the bound the scores are untouched, past it the quantized
    // LONG sum refuses to publish a potentially-wrapped value
    import SparkSpec.spark.implicits._
    val cand = Seq((1L, "a b a b a b")).toDF("doc_id", "text") // 5 bigrams
    val cnt = Seq(("a", "b", 2L), ("b", "a", 1L)).toDF("w1", "w2", "c")
    val pref = Seq(("a", 2L), ("b", 1L)).toDF("w1", "p")
    val ok = TextAnalysis.scoreAgainstLm(cand, cnt, pref, 3L, 1.0,
      maxBigramsPerDoc = 5L).collect()
    ok.length shouldBe 1
    ok.head.getLong(1) shouldBe 5L
    ok.head.isNullAt(2) shouldBe false
    val ex = intercept[Exception] {
      TextAnalysis.scoreAgainstLm(cand, cnt, pref, 3L, 1.0,
        maxBigramsPerDoc = 4L).collect()
    }
    ex.getMessage should include("bigrams")
  }

  test("persisted LM: crossPerplexityWithTable equals inline; half-built is loud") {
    val spark = SparkSpec.spark
    Seq("lm_tbl", "lm_tbl__spec", "lm_tbl__pref")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    val ref = tables.documents.filter(col("doc_id") % 5 =!= 0)
    val cand = tables.documents.filter(col("doc_id") % 5 === 0)
    TextAnalysis.buildLmTable(ref, "lm_tbl")
    rowSet(TextAnalysis.crossPerplexityWithTable(cand, "lm_tbl")) shouldBe
      rowSet(TextAnalysis.crossPerplexity(ref, cand))
    // an LM whose prefix sibling is missing is half-built: reject
    spark.sql("DROP TABLE IF EXISTS lm_tbl__pref")
    an[IllegalArgumentException] should be thrownBy
      TextAnalysis.crossPerplexityWithTable(cand, "lm_tbl")
  }

  test("perplexityBuckets: lang terciles balanced, ordered, nulls outside") {
    val ref = tables.documents.filter(col("doc_id") % 5 =!= 0)
    val cand = tables.documents.filter(col("doc_id") % 5 === 0)
    val out = TextAnalysis.perplexityBuckets(ref, cand)
    out.count() shouldBe cand.count() // every candidate lands in a bucket
    val rows = out.filter(col("bucket") =!= "unscored")
      .select("lang", "nll", "bucket")
      .as[(String, Double, String)].collect()
    rows.groupBy(_._1).foreach { case (lang, rs) =>
      val sizes = rs.groupBy(_._3).view.mapValues(_.size).toMap
      withClue(s"$lang sizes $sizes: ") {
        // ntile: bucket sizes differ by at most 1
        (sizes.values.max - sizes.values.min) should be <= 1
        // and every head nll <= every middle nll <= every tail nll
        def m(b: String, f: Seq[Double] => Double, d: Double) =
          Some(rs.filter(_._3 == b).map(_._2).toSeq).filter(_.nonEmpty)
            .map(f).getOrElse(d)
        m("head", _.max, Double.MinValue) should be <=
          m("middle", _.min, Double.MaxValue)
        m("middle", _.max, Double.MinValue) should be <=
          m("tail", _.min, Double.MaxValue)
      }
    }
    // a one-token doc is unscorable: bucketed 'unscored', never in a tercile
    val short = Seq((5L, "solo", "en")).toDF("doc_id", "text", "lang")
    TextAnalysis.perplexityBuckets(ref, short)
      .select("bucket").as[String].collect() shouldBe Array("unscored")
  }

  test("importanceWeights: log-ratio pulls target-like docs positive") {
    import SparkSpec.spark.implicits._
    // target reference speaks pattern A, raw reference pattern B: a
    // candidate in pattern A must score positive (more target-like),
    // pattern B negative, and the column must equal nll_raw - nll_target
    val target = (0 until 20).map(i => (100L + i, "alpha beta gamma"))
      .toDF("doc_id", "text")
    val raw = (0 until 20).map(i => (200L + i, "delta epsilon zeta"))
      .toDF("doc_id", "text")
    val cand = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon zeta"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.importanceWeights(target, raw, cand).collect()
      .map(r => r.getLong(0) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    out(1L)._3 should be > 0.0
    out(2L)._3 should be < 0.0
    out.values.foreach { case (t, r, lr) =>
      lr shouldBe BigDecimal(r - t)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble +- 1e-9
    }
    // real-corpus shape: weights exist for every scorable candidate
    val full = TextAnalysis.importanceWeights(
      tables.documents.filter(col("doc_id") % 5 === 1),
      tables.documents.filter(col("doc_id") % 5 === 2 ||
        col("doc_id") % 5 === 3),
      tables.documents.filter(col("doc_id") % 5 === 0))
    full.count() shouldBe
      tables.documents.filter(col("doc_id") % 5 === 0).count()
  }

  test("fuzzyPairs: q-gram filter reproduces brute force on part names") {
    Seq(1, 2, 3).foreach { t =>
      rowSet(TextOps.fuzzyPairs(tables.part, "p_name", t)) shouldBe
        rowSet(TextOps.bruteForceFuzzyPairs(tables.part, "p_name", t))
    }
    // completeness is q-independent (larger q = larger-corpus tuning)
    Seq(3, 4).foreach { qq =>
      rowSet(TextOps.fuzzyPairs(tables.part, "p_name", 2, q = qq)) shouldBe
        rowSet(TextOps.bruteForceFuzzyPairs(tables.part, "p_name", 2))
    }
  }

  test("fuzzyPairs: short strings, cross-length pairs, dedup, nulls") {
    import SparkSpec.spark.implicits._
    // "cat"/"cart" (both short of the gram bound), "a"/"ab" (below gram
    // length), short-vs-long "ring"/"rings!", and a null to screen out
    val df = Seq(Some("cat"), Some("cart"), Some("cat"), Some("a"),
      Some("ab"), Some("ring"), Some("rings!"), None).toDF("name")
    Seq(1, 2, 3).foreach { t =>
      rowSet(TextOps.fuzzyPairs(df, "name", t)) shouldBe
        rowSet(TextOps.bruteForceFuzzyPairs(df, "name", t))
    }
    val got = TextOps.fuzzyPairs(df, "name", 1).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    got should contain(("cart", "cat", 1L)) // left < right lexicographically
    got should contain(("a", "ab", 1L))
    an[IllegalArgumentException] should be thrownBy
      TextOps.fuzzyPairs(df, "name", 0)
  }

  test("fuzzyPairs: maxPairsPerDoc keeps the closest m with true totals") {
    import SparkSpec.spark.implicits._
    // "aaaa" is within distance 2 of three neighbors -> cap bites
    val df = Seq("aaaa", "aaab", "aabb", "aaac", "zzzz").toDF("name")
    val uncapped = TextOps.fuzzyPairs(df, "name", threshold = 2)
      .filter(col("left") === "aaaa").count()
    uncapped shouldBe 3L
    val capped = TextOps.fuzzyPairs(df, "name", threshold = 2,
      maxPairsPerDoc = Some(2))
      .filter(col("left") === "aaaa").collect()
    capped.length shouldBe 2
    capped.foreach(_.getAs[Long]("n_pairs_total") shouldBe 3L)
    // the two CLOSEST survive (dist asc, right asc): the dist-2 "aabb"
    // is the overflow that was shed
    capped.map(_.getString(1)).toSeq shouldBe Seq("aaab", "aaac")
  }

  test("sourceShift: hand-computed entropy and KL vs corpus") {
    import SparkSpec.spark.implicits._
    val docs = Seq(
      (1L, "a a b", "s1"), // p = (a:2/3, b:1/3)
      (2L, "a c", "s2")    // p = (a:1/2, c:1/2); corpus q = (3/5, 1/5, 1/5)
    ).toDF("doc_id", "text", "source")
    val out = TextAnalysis.sourceShift(docs).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    val (n1, d1, h1, kl1) = out("s1")
    n1 shouldBe 3L; d1 shouldBe 2L
    // H = -(2/3 ln 2/3 + 1/3 ln 1/3); KL = 2/3 ln(10/9) + 1/3 ln(5/3)
    h1 shouldBe 0.636514 +- 1e-6
    kl1 shouldBe 0.240516 +- 1e-6
    val (n2, d2, h2, kl2) = out("s2")
    n2 shouldBe 2L; d2 shouldBe 2L
    h2 shouldBe math.log(2) +- 1e-6 // uniform over 2 words
    kl2 shouldBe (0.5 * math.log(0.5 / 0.6) +
      0.5 * math.log(0.5 / 0.2)) +- 1e-6
    // a source identical to the corpus has KL 0
    val one = TextAnalysis.sourceShift(docs.withColumn("source", lit("all")))
      .collect()
    one.length shouldBe 1
    one.head.getDouble(4) shouldBe 0.0 +- 1e-9
  }

  test("searchIndex: conjunctive AND; repeated words count once") {
    import SparkSpec.spark.implicits._
    val docs = Seq(
      (1L, "join hash row"),       // all three
      (2L, "join join hash hash"), // missing row; repeats must not help
      (3L, "row hash join extra"), // all three with noise
      (4L, "join")                 // one term only
    ).toDF("doc_id", "text")
    TextOps.searchDocuments(docs, Seq("join", "hash", "row"))
      .collect().map(_.getLong(0)).sorted shouldBe Array(1L, 3L)
    // duplicate query terms are deduped, not double-counted
    TextOps.searchDocuments(docs, Seq("join", "join"))
      .collect().map(_.getLong(0)).sorted shouldBe Array(1L, 2L, 3L, 4L)
    an[IllegalArgumentException] should be thrownBy
      TextOps.searchDocuments(docs, Seq.empty)
  }
}
