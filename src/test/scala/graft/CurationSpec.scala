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
}
