package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._

/** End-to-end corpus-build composition — the proof that the engine's
  * stages are a PIPELINE, not a query zoo. One call chains the
  * individually-oracle-gated operators in their production order:
  *
  *   1. curate          — quality/language screen + exact dedup
  *                        ([[Curation.curate]], q52's gate)
  *   2. canonicalize    — MinHash near-dup clusters resolved to one
  *                        canonical doc per cluster
  *                        ([[Dedup.minhashDupPairs]] →
  *                        [[Dedup.dupComponents]] →
  *                        [[Dedup.resolveCanonical]], q31/q74/q102)
  *   3. mix             — temperature-scaled (α = 0.5) sampling to a
  *                        global token budget
  *                        ([[Relational.temperatureMix]], q163)
  *   4. tokenize        — BPE merges trained ON THE MIXED CORPUS (the
  *                        data the model would see), then every
  *                        selected doc encoded ([[Bpe.trainMerges]] /
  *                        [[Bpe.encodeDocs]], q133/q140)
  *   5. chunk           — context-window splitting of over-long
  *                        encodings ([[Bpe.chunkEncoded]], q147)
  *   6. pack            — fixed-budget bin assignment by the
  *                        distributed two-pass prefix sum
  *                        ([[Relational.packSized]], q64/q144)
  *   7. shard           — content-addressed deterministic export
  *                        sharding over the packed bins
  *                        ([[Relational.shuffleShard]], q103)
  *
  * Output: one row per training chunk —
  * (doc_id, chunk_idx, n_tokens, ids_digest, bin_id, shard) — which
  * pins end-to-end: WHICH docs survived selection (rows), the exact
  * token stream (ids_digest, the q140 array-free digest convention),
  * the chunk geometry, the pack assignment, and the export shard.
  * Deterministic at every stage (content-addressed sampling, integer
  * micro-unit thresholds, total-order tie-breaks), so the q164 DuckDB
  * oracle replays the full chain and hash-matches.
  *
  * Scale notes (the 100-TB shape): the curated and selected corpora
  * are persisted (MEMORY_AND_DISK) because each feeds several
  * downstream scans (near-dup pipeline; BPE train + encode); every
  * stage keeps its own documented scale shape — no stage added a
  * global window, driver-side corpus collect, or all-pairs join that
  * its standalone form doesn't have. The driver-side state is bounded:
  * BPE vocab argmax rows (numMerges), mix thresholds (#groups), pack
  * partition totals (#partitions), shard count (total tokens /
  * packTokens / re-bin).
  *
  * Cache lifecycle: every persist here is released in a `finally`
  * before the call returns — explicit persists are unreachable to the
  * ContextCleaner, so without the release a failed OR completed build
  * would pin three corpus-sized relations in executor storage for the
  * session's lifetime (the [[Graph.triangleCounts]] pattern). The
  * returned DataFrame is eagerly materialized (`localCheckpoint(true)`
  * — it is chunk-row-sized, the bounded OUTPUT of the build, not a
  * corpus-sized intermediate) so the caller's lazy plan does not
  * depend on the released caches.
  */
object Pipeline {

  /** Build a training corpus from raw documents; see the object doc.
    * `documents` must carry (doc_id, text, lang, source, n_chars) —
    * the documents-table contract shared by every curation operator.
    */
  def corpusBuild(
      documents: DataFrame,
      mixBudgetTokens: Long = 20000L,
      chunkTokens: Int = 32,
      packTokens: Long = 512L,
      numMerges: Int = 8,
      nShards: Int = 8,
      neardupThreshold: Double = 0.7): DataFrame = {

    // 1. curate: keep-list of doc_ids, then re-attach text (curate's
    //    q52-stable output schema drops the text column)
    val curated = Curation.curate(documents)
    val curatedDocs = documents
      .join(curated.select("doc_id"), Seq("doc_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try corpusBuildOnCurated(curatedDocs, mixBudgetTokens, chunkTokens,
      packTokens, numMerges, nShards, neardupThreshold)
    finally curatedDocs.unpersist()
  }

  /** [[corpusBuild]] stages 2–7 over the persisted curated corpus —
    * split out so the caller's finally releases `curatedDocs` even
    * when a downstream job fails (the [[Graph.triangleCounts]]
    * convention); `selDocs` and `chunks` get the same treatment here.
    */
  private def corpusBuildOnCurated(
      curatedDocs: DataFrame,
      mixBudgetTokens: Long,
      chunkTokens: Int,
      packTokens: Long,
      numMerges: Int,
      nShards: Int,
      neardupThreshold: Double): DataFrame = {

    // 2. canonical near-dup resolution OVER THE CURATED CORPUS (the
    //    exact-dup tier already ran inside curate; this is the fuzzy
    //    tier). keep=1 rows ARE the near-dup-deduplicated corpus.
    val canon = Dedup.resolveCanonical(curatedDocs,
        Dedup.dupComponents(Dedup.minhashDupPairs(curatedDocs,
          threshold = neardupThreshold, k = 64, bands = 32)))
      .filter(col("keep") === 1L)
      .select("doc_id")
    val canonDocs = curatedDocs.join(canon, Seq("doc_id"))

    // 3. temperature mix to the token budget (α = 0.5 √-share
    //    flattening; content-addressed membership, so the selection
    //    replays bit-for-bit in the oracle)
    val selDocs = Relational.temperatureMix(canonDocs, col("doc_id"),
        col("lang"), size(TextAnalysis.tokens(col("text"))),
        mixBudgetTokens)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try corpusBuildOnSelection(selDocs, chunkTokens, packTokens,
      numMerges, nShards)
    finally selDocs.unpersist()
  }

  /** Stages 4–7 over the persisted mixed selection (see
    * [[corpusBuildOnCurated]] for why the body is split). */
  private def corpusBuildOnSelection(
      selDocs: DataFrame,
      chunkTokens: Int,
      packTokens: Long,
      numMerges: Int,
      nShards: Int): DataFrame = {

    // 4. tokenizer trained on the SELECTED corpus (what a real pipeline
    //    trains on — the tokenizer depends on every upstream stage),
    //    then encode. trainMerges is eager driver-side argmax over
    //    vocabulary aggregates (bounded), the q133 contract.
    val merges = Bpe.trainMerges(selDocs, numMerges)
    val enc = Bpe.encodeDocs(selDocs, merges)

    // 5. chunk to the context window. Persisted because THREE jobs
    //    consume it (packSized's two-pass prefix sum collects partition
    //    totals eagerly, shuffleShard's zipWithIndex runs its own
    //    offsets job, and the final join materializes the rows) — each
    //    would otherwise replay the whole BPE encode join chain
    //    (packSized's scaladoc: persist the sized projection when the
    //    upstream is expensive).
    val chunks = Bpe.chunkEncoded(enc, chunkTokens)
      // a single synthetic long key gives the packer its total order
      // (doc_id, chunk_idx); the packing bound is asserted per row —
      // a >= 100k-chunk document (3.2M tokens at the default window)
      // or a negative doc_id would silently collide keys, corrupting
      // pack order and fanning out the join back
      .withColumn("ckey",
        when(col("chunk_idx") < 100000 && col("doc_id") >= 0,
          col("doc_id") * 100000L + col("chunk_idx"))
          .otherwise(raise_error(concat(
            lit("corpusBuild: chunk key packing bound exceeded "),
            lit("(doc_id="), col("doc_id").cast("string"),
            lit(", chunk_idx="), col("chunk_idx").cast("string"),
            lit(") — need doc_id >= 0 and < 100000 chunks/doc")))))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {

    // 6. pack chunks into fixed token-budget bins (two-pass prefix sum)
    val bins = Relational.packSized(
        chunks.select(col("ckey").as("doc_id"), col("n_tokens")),
        packTokens)
      .select(col("doc_id").as("ckey"), col("bin_id"))

    // 7. shard the BINS (the export unit) content-addressed; the bin
    //    relation is total-tokens/packTokens rows — broadcast-sized
    val shards = Relational.shuffleShard(
        bins.select("bin_id").distinct(), "bin_id", nShards)
      .select("bin_id", "shard")

    // materialize the chunk-level OUTPUT eagerly — returned lazily it
    // would depend on the cached intermediates the finally releases
    chunks
      .join(bins, Seq("ckey"))
      .join(F.broadcast(shards), Seq("bin_id"))
      .select(
        col("doc_id"),
        col("chunk_idx").cast("long").as("chunk_idx"),
        col("n_tokens"),
        md5(array_join(transform(col("ids"), _.cast("string")), " "))
          .as("ids_digest"),
        col("bin_id"),
        col("shard"))
      .localCheckpoint(true)
    } finally chunks.unpersist()
  }
}
