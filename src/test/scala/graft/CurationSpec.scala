package graft

import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.functions._
import graft.operators.{Curation, TextAnalysis}

class CurationSpec extends SparkSpec {

  test("curate applies all three gates") {
    val out = Curation.curate(tables.documents)
    // every kept doc satisfies the quality + language gates
    out.filter(!col("n_tokens").between(30, 120)).count() shouldBe 0
    out.filter(!col("predicted_lang").isin("en", "unknown")).count() shouldBe 0
    // and the output is dup-free by content fingerprint: n_tokens is a
    // proxy-free check via distinct doc ids
    out.select("doc_id").distinct().count() shouldBe out.count()
    out.count() should be > 0L
  }

  test("curation funnel partitions the corpus exactly") {
    val funnel = Curation.curationFunnel(tables.documents)
      .collect().map(r => r.getAs[String]("verdict") ->
        r.getAs[Long]("n_docs")).toMap
    funnel.values.sum shouldBe tables.documents.count()
    // kept docs in the funnel == docs entering the dedup stage
    val preDedupKept = funnel("keep")
    Curation.curate(tables.documents).count() should be <= preDedupKept
  }

  test("curation is one scan + one shuffle (plan shape)") {
    val p = plan(Curation.curate(tables.documents))
    // exactly one Exchange beyond the spread repartition: the dedup window
    val exchanges = "Exchange".r.findAllIn(p).length
    exchanges should be <= 2 // spread round-robin + window hash partition
    p should not include "SortMergeJoin" // no join-backs between stages
  }

  test("lengthPrune drops each language's shortest decile, ties together") {
    val docs = tables.documents.select(col("doc_id"), col("lang"),
      F.size(TextAnalysis.tokens(col("text"))).cast("long").as("n_toks"))
    val kept = Curation.lengthPrune(tables.documents, dropBelow = 0.1)
    kept.count() should be < docs.count()
    // within every language, every dropped doc is strictly shorter than
    // every kept doc — a tie class is never split by the cut
    val dropped = docs.join(kept.select("doc_id"), Seq("doc_id"), "left_anti")
    dropped.groupBy("lang").agg(max("n_toks").as("mx"))
      .join(kept.groupBy("lang").agg(min("n_toks").as("mn")), "lang")
      .filter(col("mx") >= col("mn")).count() shouldBe 0
    // the decile is distribution-relative: every language loses docs
    dropped.select("lang").distinct().count() shouldBe
      docs.select("lang").distinct().count()
  }

  test("lengthPruneApprox matches exact decisions up to sketch error") {
    val exact = Curation.lengthPrune(tables.documents, dropBelow = 0.1)
      .select("doc_id")
    val approx = Curation.lengthPruneApprox(tables.documents,
      dropBelow = 0.1).select("doc_id")
    val total = tables.documents.count()
    // decisions agree except (at most) the boundary tie class per lang
    val disagree = exact.except(approx).count() +
      approx.except(exact).count()
    disagree.toDouble / total should be <= 0.02
    // and the plan is sort-free: threshold sketch + broadcast join-back,
    // no per-language rank window (the whole point of the variant)
    val p = plan(Curation.lengthPruneApprox(tables.documents, 0.1))
    p should not include "Window"
    p should include("BroadcastHashJoin")
  }

  test("leakageAudit: flags cross-split near-dups, keeps same-split ones") {
    import SparkSpec.spark.implicits._
    // replicate groupSplit's assignment to PICK sources in known splits
    def splitOf(src: String): String = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(src.getBytes("UTF-8")).take(4)
        .map("%02x".format(_)).mkString
      if (h < "cccccccc") "train" else if (h < "e6666666") "val" else "test"
    }
    val srcs = (1 to 1000).map(i => s"src_$i")
    val trainSrc = srcs.find(splitOf(_) == "train").get
    val testSrc = srcs.find(splitOf(_) == "test").get
    val dup = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (1L, dup, trainSrc),                 // identical pair across the
      (2L, dup, testSrc),                  //   train/test boundary
      (3L, "one two three four five six", trainSrc), // dup pair inside
      (4L, "one two three four five six", trainSrc), //   train only
      (5L, "totally different words here now", testSrc)
    ).toDF("doc_id", "text", "source")
    val out = Curation.leakageAudit(docs, threshold = 0.7).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getBoolean(3))).toMap
    out(("test", "train")) shouldBe ((1L, true)) // the contamination row
    out(("train", "train")) shouldBe ((1L, false))
    out.size shouldBe 2
  }

  test("calibrateScores: per-group percent-rank, ties share rank") {
    import SparkSpec.spark.implicits._
    val df = Seq(
      ("g1", 10), ("g1", 20), ("g1", 20), ("g1", 30), // pr: 0, 1/3, 1/3, 1
      ("g2", 99)                                      // singleton: 0
    ).toDF("g", "score")
    val got = Curation.calibrateScores(df, "g", "score").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
    got.filter(_._1 == "g1").map(_._3).sorted shouldBe
      Seq(0.0, 0.333333, 0.333333, 1.0)
    got.filter(_._1 == "g2").map(_._3) shouldBe Seq(0.0)
  }

  test("containmentPrune: quoted doc dropped, identical pair keeps low id") {
    import SparkSpec.spark.implicits._
    val short = "alpha beta gamma delta epsilon zeta"
    val long = s"intro words here $short plus a long tail of many other " +
      "unrelated tokens stretching far beyond the quoted run"
    val docs = Seq(
      (1L, short), (2L, long),             // 1 contained in larger 2
      (3L, "one two three four five six"), // identical pair: low id wins
      (4L, "one two three four five six"),
      (5L, "nothing in common with any of those documents here"),
      (6L, "hi") // shingle-free: trivially kept
    ).toDF("doc_id", "text")
    val keep = Curation.containmentPrune(docs, threshold = 0.9).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    keep shouldBe Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 0L,
      5L -> 1L, 6L -> 1L)
  }

  test("groupSplit: groups never straddle splits; zero shuffle") {
    import SparkSpec.spark.implicits._
    val rows = (1 to 2000).map(i => (i.toLong, s"domain_${i % 400}"))
    val df = rows.toDF("id", "domain")
    val out = Curation.groupSplit(df, "domain")
    // leakage-safety: each domain maps to exactly one split
    out.groupBy("domain")
      .agg(countDistinct(col("split")).as("n"))
      .filter(col("n") =!= 1).count() shouldBe 0
    // with 400 groups the realized shares track 0.8/0.1/0.1 loosely
    val shares = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1).toDouble / rows.size).toMap
    shares("train") shouldBe 0.8 +- 0.1
    (shares.getOrElse("val", 0.0) + shares.getOrElse("test", 0.0)) shouldBe
      0.2 +- 0.1
    // pure projection: no Exchange anywhere in the plan
    plan(Curation.groupSplit(df, "domain")) should not include "Exchange"
  }

  test("groupSplit: deterministic, null-safe, validates fractions") {
    import SparkSpec.spark.implicits._
    val df = Seq((1L, Option("a")), (2L, Option("a")), (3L, None))
      .toDF("id", "g")
    val a = Curation.groupSplit(df, "g").collect().map(r =>
      r.getLong(0) -> r.getString(2)).toMap
    val b = Curation.groupSplit(df, "g").collect().map(r =>
      r.getLong(0) -> r.getString(2)).toMap
    a shouldBe b // same assignment on every run
    a(1L) shouldBe a(2L) // same group, same split
    Set("train", "val", "test") should contain(a(3L)) // null key assigned
    an[IllegalArgumentException] should be thrownBy
      Curation.groupSplit(df, "g", Seq("train" -> 0.5, "val" -> 0.4))
    an[IllegalArgumentException] should be thrownBy
      Curation.groupSplit(df, "g", Seq("all" -> 1.0))
  }

  test("cluster-safe split: no near-dup pair straddles a split boundary") {
    import graft.operators.Dedup
    val docs = tables.documents
    val pairs = Dedup.minhashDupPairs(docs, threshold = 0.7, k = 64,
      bands = 32).select("doc_a", "doc_b")
    pairs.count() should be > 0L // the corpus really has near-dups
    val split = Curation.groupSplit(
      docs.select("doc_id")
        .join(Dedup.dupComponents(pairs), Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("component"), col("doc_id")).as("component")),
      "component")
    val sa = split.select(col("doc_id").as("doc_a"),
      col("split").as("split_a"))
    val sb = split.select(col("doc_id").as("doc_b"),
      col("split").as("split_b"))
    pairs.join(sa, "doc_a").join(sb, "doc_b")
      .filter(col("split_a") =!= col("split_b"))
      .count() shouldBe 0L // leakage impossible by construction
  }
}
