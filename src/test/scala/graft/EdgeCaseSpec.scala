package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Relational, TextAnalysis}

/** Degenerate-input behavior of the round-3 operators: empty corpora,
  * empty pair lists, single rows. These are the shapes that crash real
  * pipelines at 3am (an empty partition after a filter, a benchmark set
  * with no overlap, a first run with no duplicate pairs yet).
  */
class EdgeCaseSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  private lazy val noDocs =
    Seq.empty[(Long, String)].toDF("doc_id", "text")
  private lazy val oneDoc =
    Seq((1L, "just one tiny document")).toDF("doc_id", "text")

  test("packSequences: empty input yields empty output, single doc bin 0") {
    Relational.packSequences(noDocs, 128).count() shouldBe 0
    val one = Relational.packSequences(oneDoc, 128).collect()
    one.length shouldBe 1
    one(0).getLong(2) shouldBe 0L
  }

  test("packedSequences edges: empty corpus; over-budget doc stays whole") {
    import graft.operators.Bpe
    val merges = Seq(Bpe.Merge(1, "o", "n"))
    Bpe.packedSequences(noDocs, merges, budgetTokens = 8).count() shouldBe 0
    // a document longer than the budget packs into the bin where it
    // STARTS and is never split (the packer's documented semantics) —
    // its whole EOS-terminated sequence lands in one bin
    val fat = Seq((1L, "one two three four five six seven eight nine"))
      .toDF("doc_id", "text")
    val bins = Bpe.packedSequences(fat, merges, budgetTokens = 4).collect()
    bins.length shouldBe 1
    val seq0 = bins(0).getSeq[Long](bins(0).fieldIndex("input_ids"))
    seq0.last shouldBe 0L // the EOS
    bins(0).getAs[Long]("n_docs") shouldBe 1L
  }

  test("portable LSH edges: zero vector signs consistently; empty corpus probes empty") {
    import graft.operators.Similarity
    val dim = 64
    val z = Seq((1L, Array.fill(dim)(0.0f), 0))
      .toDF("vec_id", "embedding", "label")
    // zero vector: every dot is 0, no bit set — signature 0 in every
    // table, same in both engines (no NaN/null path)
    val sigs = Similarity.lshTopK(z, z, k = 1, bits = 4, tables = 16,
      portable = true).collect()
    sigs.length shouldBe 1 // finds itself through bucket (0, 0)
    val empty = Seq.empty[(Long, Array[Float], Int)]
      .toDF("vec_id", "embedding", "label")
    Similarity.lshTopK(empty, z, k = 5, bits = 4, tables = 16,
      portable = true).count() shouldBe 0
  }

  test("trainMergesLocal: empty vocabulary trains zero merges") {
    import graft.operators.Bpe
    Bpe.trainMerges(noDocs, numMerges = 4) shouldBe Nil
  }

  test("dupComponents: empty pair list terminates and yields no rows") {
    val empty = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    Dedup.dupComponents(empty).count() shouldBe 0
    // the reliable-checkpoint path must handle the same degenerate input
    val dir = java.nio.file.Files
      .createTempDirectory("graft-cc-empty").toString
    Dedup.dupComponents(empty, checkpointDir = Some(dir)).count() shouldBe 0
  }

  test("lengthPruneApprox: dropBelow 0 keeps every document") {
    val docs = Seq((1L, "en", "a b c"), (2L, "en", "a"), (3L, "fr", "x y"))
      .toDF("doc_id", "lang", "text")
    graft.operators.Curation.lengthPruneApprox(docs, dropBelow = 0.0)
      .count() shouldBe 3
  }

  test("kMeansFit: k exceeding distinct vectors still terminates") {
    // farthest-point seeding on 2 vectors with k=3 repeats a seed —
    // duplicate centroids collapse via the lower-cluster-id tiebreak and
    // empty clusters keep their previous centroid; no hang, no crash
    val two = Seq(
      (1L, Seq(0.0f, 1.0f)), (2L, Seq(1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val (cents, obj) = graft.operators.Similarity.kMeansFit(
      two, k = 3, iters = 2, seeding = "farthest")
    cents.length shouldBe 3
    obj.size shouldBe 2
  }

  test("benchmarkOverlap: empty benchmark set marks nothing contaminated") {
    val out = Dedup.benchmarkOverlap(oneDoc, noDocs).collect()
    out.length shouldBe 1
    out(0).getLong(1) shouldBe 0L
    out(0).getBoolean(2) shouldBe false
  }

  test("funnel: step with no matching events flows zero through later steps") {
    val events = Seq(
      (1L, java.sql.Timestamp.valueOf("2026-01-01 10:00:00"), "view")
    ).toDF("user_id", "ts", "event_type")
    val out = Relational.funnel(events, Seq("view", "click", "purchase"))
      .orderBy("step").collect().map(_.getLong(2))
    out.toSeq shouldBe Seq(1L, 0L, 0L)
  }

  test("stratifiedSampleDeterministic: rate 0 drops all, rate 1 keeps all") {
    val docs = tables.documents.select("doc_id", "lang")
    Relational.stratifiedSampleDeterministic(docs, "lang",
      Map("en" -> 0.0), "doc_id")
      .filter(col("lang") === "en").count() shouldBe 0
    val total = docs.count()
    Relational.stratifiedSampleDeterministic(docs, "lang",
      Map.empty, "doc_id").count() shouldBe total
  }

  test("tokenQuantiles and repetitionSignals survive an empty frame") {
    TextAnalysis.tokenQuantiles(
      Seq.empty[(Long, String, String)].toDF("doc_id", "text", "lang"),
      exact = true).count() shouldBe 0
    TextAnalysis.repetitionSignals(noDocs).count() shouldBe 0
  }

  test("cohortRetention on a single-event user is (day, 0, 1)") {
    val events = Seq(
      (1L, java.sql.Timestamp.valueOf("2026-01-02 10:00:00"), 1.0)
    ).toDF("user_id", "ts", "value")
    val out = Relational.cohortRetention(events).collect()
    out.length shouldBe 1
    out(0).getString(0) shouldBe "2026-01-02"
    out(0).getLong(1) shouldBe 0L
    out(0).getLong(2) shouldBe 1L
  }

  test("resolveCanonical with no dup pairs: every doc is its own keeper") {
    val docs = Seq((1L, "a", 5L), (2L, "b", 9L))
      .toDF("doc_id", "text", "n_chars")
    val empty = Seq.empty[(Long, Long)].toDF("doc_id", "component")
    val r = Dedup.resolveCanonical(docs, empty)
      .select("doc_id", "component", "canonical_id", "keep")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    r shouldBe Seq((1L, 1L, 1L, 1L), (2L, 2L, 2L, 1L))
  }

  test("budgetSelect edges: budget covers all / starves all; bad budget") {
    val docs = Seq((1L, 2L, 10L), (2L, 1L, 10L))
      .toDF("doc_id", "n_chars", "n_tokens")
    Relational.budgetSelect(docs, "n_chars", "n_tokens", budget = 100L)
      .count() shouldBe 2
    Relational.budgetSelect(docs, "n_chars", "n_tokens", budget = 5L)
      .count() shouldBe 0
    an[IllegalArgumentException] should be thrownBy
      Relational.budgetSelect(docs, "n_chars", "n_tokens", budget = 0L)
  }

  test("shuffleShard edges: one shard takes everything; bad shard count") {
    val docs = Seq((1L, "s"), (2L, "s")).toDF("doc_id", "source")
    val one = Relational.shuffleShard(docs, "doc_id", 1)
    one.filter(col("shard") =!= 0L).count() shouldBe 0
    one.count() shouldBe 2
    an[IllegalArgumentException] should be thrownBy
      Relational.shuffleShard(docs, "doc_id", 0)
  }
}
