package graft

import org.apache.spark.sql.functions._

import graft.operators.{Curation, Pipeline}

/** Composition invariants of the end-to-end corpus build (q164's
  * engine side): the per-stage operators are individually oracle-gated;
  * these tests pin what only the COMPOSITION can break — stage
  * contracts lining up, end-to-end determinism, and the geometry of
  * the final training chunks.
  */
class PipelineSpec extends SparkSpec {

  private lazy val out = Pipeline.corpusBuild(tables.documents).cache()

  test("corpus build produces training chunks end to end") {
    out.count() should be > 0L
  }

  test("every emitted doc survived curation (stages compose, not leak)") {
    val outDocs = out.select("doc_id").distinct()
    val curated = Curation.curate(tables.documents).select("doc_id")
    outDocs.join(curated, Seq("doc_id"), "left_anti").count() shouldBe 0L
  }

  test("chunk geometry: <= 32 tokens each, contiguous 0-based indices") {
    out.filter(col("n_tokens") > 32).count() shouldBe 0L
    // chunk_idx per doc is 0..n-1 with no gaps
    val bad = out.groupBy("doc_id")
      .agg(count(lit(1)).as("n"), max("chunk_idx").as("mx"),
        min("chunk_idx").as("mn"),
        countDistinct("chunk_idx").as("nd"))
      .filter(col("mn") =!= 0 || col("mx") =!= col("n") - 1 ||
        col("nd") =!= col("n"))
    bad.count() shouldBe 0L
  }

  test("pack bins: every chunk assigned; bin ids contiguous from 0") {
    val bins = out.select("bin_id").distinct()
      .collect().map(_.getLong(0)).sorted
    bins.head shouldBe 0L
    bins shouldBe (0L until bins.length).toArray
  }

  test("shards: round-robin over bins, every shard id in [0, 8)") {
    out.filter(col("shard") < 0 || col("shard") >= 8)
      .count() shouldBe 0L
    // a bin maps to exactly one shard
    out.groupBy("bin_id").agg(countDistinct("shard").as("n"))
      .filter(col("n") =!= 1).count() shouldBe 0L
    // round-robin: shard counts over bins differ by at most one
    val perShard = out.select("bin_id", "shard").distinct()
      .groupBy("shard").count().collect().map(_.getLong(1))
    (perShard.max - perShard.min) should be <= 1L
  }

  test("the whole pipeline is deterministic run to run") {
    val again = Pipeline.corpusBuild(tables.documents)
    rowSet(again) shouldBe rowSet(out)
  }

  // explicit-persist ids only: localCheckpoint buffers (the BPE round
  // materializer, the build's own output — all eager, so their RDDs
  // report isCheckpointed) are ContextCleaner-reachable by design and
  // linger in getPersistentRDDs only until the next GC — counting them
  // would make this assertion timing-dependent. The leak class these
  // tests pin is the EXPLICIT persist, which no GC ever frees without
  // an unpersist call.
  private def pinnedIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs
      .collect { case (id, rdd) if !rdd.isCheckpointed => id }.toSet

  test("corpus-sized intermediates are released on the success path") {
    val before = pinnedIds
    val built = Pipeline.corpusBuild(tables.documents)
    built.count() should be > 0L
    val leaked = pinnedIds -- before
    assert(leaked.isEmpty,
      s"corpusBuild leaked persisted intermediates: rdd ids $leaked")
  }

  test("corpus-sized intermediates are released on the failure path") {
    // negative doc_ids trip the ckey packing-bound raise_error when the
    // chunk relation first materializes (packSized's eager partition
    // totals) — mid-build, with all three stage persists live, so this
    // exercises every finally in the release chain.
    val before = pinnedIds
    val negDocs = tables.documents
      .withColumn("doc_id", -col("doc_id") - 1)
    intercept[Exception] {
      Pipeline.corpusBuild(negDocs).count()
    }
    val leaked = pinnedIds -- before
    assert(leaked.isEmpty,
      s"failed corpusBuild left persisted intermediates: rdd ids $leaked")
  }
}
