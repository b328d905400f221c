package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}
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
  *
  * == Incremental maintenance ==
  *
  * [[corpusBuildWithState]] additionally persists the BUILD STATE a
  * later crawl needs to update the corpus at DELTA cost instead of a
  * full rebuild — the operating mode at 100 TB, where a daily crawl
  * touches a fraction of a percent of the corpus and re-running the
  * seven-stage build over everything would dominate the pipeline. The
  * state family under prefix `p`:
  *
  *   - `p_snapshot`  (doc_id, fp)  — content fingerprint of the RAW
  *                   crawl, the diff base ([[Dedup.snapshotDiff]]'s
  *                   semantics without rescanning old text)
  *   - `p_standing`  (doc_id)      — the canonical curated doc set
  *                   currently IN the corpus universe
  *   - `p_neardup`                 — [[Dedup.buildNearDupIndex]] over
  *                   the standing docs (band-bucketed, own spec table)
  *   - `p_mix`       (grp, thresh) — the frozen temperature-mix
  *                   thresholds ([[Relational.temperatureThresholds]])
  *   - `p_merges`                  — the frozen BPE tokenizer
  *                   ([[Bpe.saveMerges]], own spec table)
  *   - `p_vocab`     (token, id)   — the frozen token-id space
  *                   ([[Bpe.tokenIds]] over the v1 selection)
  *   - `p__spec`                   — one row of build parameters +
  *                   `max_bin`, written LAST as the state's commit
  *                   marker: [[corpusDelta]] refuses half-built state
  *                   via [[graft.sources.IndexSpec.readRequired]]
  *
  * [[corpusDelta]] then turns a new crawl into (tombstones + new
  * chunks); [[applyCorpusDelta]] folds them into a chunk relation.
  * The operational loop closes with [[compactCorpus]] (squash N folded
  * changesets into a fresh bucketed table with a reset bin space) and
  * [[reconcileCandidates]]/[[reconcileDelta]] (audit + re-admission of
  * suppressed content whose standing counterpart was later removed —
  * the crawl-diff semantic edge — at delta cost). After those, the
  * only job left for a periodic full rebuild is re-TRAINING the frozen
  * mix thresholds and tokenizer against the drifted corpus.
  */
object Pipeline {

  // near-dup LSH geometry shared by the build's self-pass, the
  // persisted index, and the delta's probe — one definition so the
  // three can never drift (the index spec additionally guards the
  // persisted half at probe time)
  private val NdNgram = 3
  private val NdK = 64
  private val NdBands = 32

  private def snapshotTable(p: String) = s"${p}_snapshot"
  private def standingTable(p: String) = s"${p}_standing"
  private def neardupTable(p: String) = s"${p}_neardup"
  private def mixTable(p: String) = s"${p}_mix"
  private def mergesTable(p: String) = s"${p}_merges"
  private def vocabTable(p: String) = s"${p}_vocab"

  /** Immutable bundle of the build knobs shared by [[corpusBuild]] and
    * [[corpusBuildWithState]]; `statePrefix = Some(p)` selects the
    * state-persisting variant (state is written table-by-table as the
    * stages that derive it run).
    */
  private final case class BuildParams(
      mixBudgetTokens: Long,
      chunkTokens: Int,
      packTokens: Long,
      numMerges: Int,
      nShards: Int,
      neardupThreshold: Double,
      statePrefix: Option[String])

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
      neardupThreshold: Double = 0.7): DataFrame =
    corpusBuildImpl(documents, BuildParams(mixBudgetTokens, chunkTokens,
      packTokens, numMerges, nShards, neardupThreshold, None))

  /** [[corpusBuild]] that ALSO persists the incremental-maintenance
    * state family under `statePrefix` (see the object doc) so
    * [[corpusDelta]] can later fold a new crawl in at delta cost. The
    * `p__spec` commit marker is written last: a crash mid-build leaves
    * state that [[corpusDelta]] loudly refuses, never half-trusts.
    * Re-running overwrites every state table, so the build is
    * re-entrant.
    */
  def corpusBuildWithState(
      documents: DataFrame,
      statePrefix: String,
      mixBudgetTokens: Long = 20000L,
      chunkTokens: Int = 32,
      packTokens: Long = 512L,
      numMerges: Int = 8,
      nShards: Int = 8,
      neardupThreshold: Double = 0.7): DataFrame = {
    require(statePrefix.nonEmpty, "corpusBuildWithState: empty statePrefix")
    corpusBuildImpl(documents, BuildParams(mixBudgetTokens, chunkTokens,
      packTokens, numMerges, nShards, neardupThreshold, Some(statePrefix)))
  }

  private def corpusBuildImpl(documents: DataFrame,
      params: BuildParams): DataFrame = {
    params.statePrefix.foreach { p =>
      // invalidate FIRST on a re-build: the spec is the commit marker,
      // and a crash after the state tables start overwriting must not
      // leave a previous generation's marker vouching for mixed state
      // (corpusDelta would silently diff against the new snapshot but
      // encode with the old tokenizer) — dropping it re-establishes
      // the marker-written-last invariant for re-runs
      documents.sparkSession.sql(
        s"DROP TABLE IF EXISTS ${graft.sources.IndexSpec.specTable(p)}")
      // snapshot of the RAW crawl — the delta's diff base covers every
      // crawl doc (also curation-rejected ones: a future crawl doc
      // equal to a rejected one is "unchanged" and skips reprocessing
      // — the same gates would reject it again). Bucketed by doc_id,
      // the delta's join key: the diff's full-outer join and the
      // tombstone anti-joins are the only corpus-sized joins on the
      // delta path, and bucketing makes the snapshot side
      // exchange-free on every one of them (the q48/q130 layout
      // discipline) — only the crawl side shuffles, once.
      graft.sources.Sinks.saveTablePartitioned(
        documents.select(col("doc_id"),
          TextAnalysis.fingerprint(col("text")).as("fp")),
        snapshotTable(p),
        bucketBy = Some((32, Seq("doc_id"))), sortBy = Seq("doc_id"))
    }

    // 1. curate: keep-list of doc_ids, then re-attach text (curate's
    //    q52-stable output schema drops the text column)
    val curated = Curation.curate(documents)
    val curatedDocs = documents
      .join(curated.select("doc_id"), Seq("doc_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val out =
      try corpusBuildOnCurated(curatedDocs, params)
      finally curatedDocs.unpersist()

    // spec LAST — the state family's commit marker (max_bin is read
    // off the materialized output, which is chunk-row-sized)
    params.statePrefix.foreach { p =>
      val spark = documents.sparkSession
      import spark.implicits._
      val maxBin = Option(out.agg(max("bin_id")).head().get(0))
        .map(_.asInstanceOf[Long]).getOrElse(-1L)
      graft.sources.IndexSpec.write(
        Seq((params.mixBudgetTokens, params.chunkTokens,
          params.packTokens, params.numMerges, params.nShards,
          params.neardupThreshold, maxBin))
          .toDF("mix_budget_tokens", "chunk_tokens", "pack_tokens",
            "num_merges", "n_shards", "neardup_threshold", "max_bin"),
        p)
    }
    out
  }

  /** Stages 2–7 over the persisted curated corpus — split out so the
    * caller's finally releases `curatedDocs` even when a downstream
    * job fails (the [[Graph.triangleCounts]] convention); `selDocs`
    * and `chunks` get the same treatment here.
    */
  private def corpusBuildOnCurated(
      curatedDocs: DataFrame,
      params: BuildParams): DataFrame = {

    // 2. canonical near-dup resolution OVER THE CURATED CORPUS (the
    //    exact-dup tier already ran inside curate; this is the fuzzy
    //    tier). keep=1 rows ARE the near-dup-deduplicated corpus.
    val canon = Dedup.resolveCanonical(curatedDocs,
        Dedup.dupComponents(Dedup.minhashDupPairs(curatedDocs,
          threshold = params.neardupThreshold, ngram = NdNgram,
          k = NdK, bands = NdBands)))
      .filter(col("keep") === 1L)
      .select("doc_id")
    val canonDocs = curatedDocs.join(canon, Seq("doc_id"))

    // state: the standing corpus universe (canonical curated docs) +
    // the near-dup index a delta probes against it. Both writes are
    // actions over the still-persisted curatedDocs.
    params.statePrefix.foreach { p =>
      // bucketed by doc_id like the snapshot (same rationale: every
      // standing-set join in the delta keys on doc_id)
      graft.sources.Sinks.saveTablePartitioned(
        canonDocs.select("doc_id"), standingTable(p),
        bucketBy = Some((32, Seq("doc_id"))), sortBy = Seq("doc_id"))
      Dedup.buildNearDupIndex(canonDocs, neardupTable(p),
        ngram = NdNgram, k = NdK, bands = NdBands)
    }

    // 3. temperature mix to the token budget (α = 0.5 √-share
    //    flattening; content-addressed membership, so the selection
    //    replays bit-for-bit in the oracle — and, frozen, replays
    //    bit-for-bit against a LATER crawl's docs)
    val thresholds = Relational.temperatureThresholds(canonDocs,
      col("lang"), size(TextAnalysis.tokens(col("text"))),
      params.mixBudgetTokens)
    params.statePrefix.foreach { p =>
      graft.sources.Sinks.saveTable(thresholds, mixTable(p))
    }
    val selDocs = Relational.mixtureApplyThresholds(canonDocs,
        col("doc_id"), col("lang"), thresholds)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try corpusBuildOnSelection(selDocs, params)
    finally selDocs.unpersist()
  }

  /** Stages 4–7 over the persisted mixed selection (see
    * [[corpusBuildOnCurated]] for why the body is split). */
  private def corpusBuildOnSelection(
      selDocs: DataFrame,
      params: BuildParams): DataFrame = {

    // 4. tokenizer trained on the SELECTED corpus (what a real pipeline
    //    trains on — the tokenizer depends on every upstream stage),
    //    then encode. trainMerges is eager driver-side argmax over
    //    vocabulary aggregates (bounded), the q133 contract.
    val merges = Bpe.trainMerges(selDocs, params.numMerges)
    params.statePrefix.foreach { p =>
      Bpe.saveMerges(selDocs.sparkSession, merges, mergesTable(p),
        params.numMerges)
      // the token-id TABLE freezes with the merges: a delta crawl must
      // encode into the v1 id space (re-ranking ids over delta docs
      // would silently renumber every token — see encodeDocsFrozen)
      graft.sources.Sinks.saveTable(
        Bpe.tokenIds(selDocs, merges), vocabTable(p))
    }
    val enc = Bpe.encodeDocs(selDocs, merges)

    // 5. chunk to the context window. Persisted because THREE jobs
    //    consume it (packSized's two-pass prefix sum collects partition
    //    totals eagerly, shuffleShard's zipWithIndex runs its own
    //    offsets job, and the final join materializes the rows) — each
    //    would otherwise replay the whole BPE encode join chain
    //    (packSized's scaladoc: persist the sized projection when the
    //    upstream is expensive).
    val chunks = withChunkKey(Bpe.chunkEncoded(enc, params.chunkTokens))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try packShardEmit(chunks, params.packTokens, params.nShards,
      binBase = 0L)
    finally chunks.unpersist()
  }

  /** The (doc_id, chunk_idx) → ckey synthetic packing key shared by the
    * full build and the delta: a single long gives the packer its total
    * order. The bound is asserted per row — a >= 100k-chunk document
    * (3.2M tokens at the default window) or a negative doc_id would
    * silently collide keys, corrupting pack order and fanning out the
    * join back.
    */
  private def withChunkKey(chunks: DataFrame): DataFrame =
    chunks.withColumn("ckey",
      when(col("chunk_idx") < 100000 && col("doc_id") >= 0,
        col("doc_id") * 100000L + col("chunk_idx"))
        .otherwise(raise_error(concat(
          lit("corpusBuild: chunk key packing bound exceeded "),
          lit("(doc_id="), col("doc_id").cast("string"),
          lit(", chunk_idx="), col("chunk_idx").cast("string"),
          lit(") — need doc_id >= 0 and < 100000 chunks/doc")))))

  /** Stages 6–7 (+ final projection) over a persisted chunk relation:
    * pack into fixed token-budget bins offset by `binBase` (0 for a
    * full build; the standing corpus's max_bin + 1 for a delta, so
    * delta bins append after the existing ones), shard the new bins
    * content-addressed, and emit the chunk rows. The result is
    * materialized eagerly — returned lazily it would depend on the
    * cached intermediates the callers' finally blocks release.
    */
  /** Bin + shard assignment over a ckey-keyed chunk relation — the
    * pack/shard halves of stages 6–7, shared by the build/delta emit
    * (which also digests the token ids) and [[compactCorpus]] (whose
    * input already carries digests). Returns the input columns plus
    * (bin_id, shard).
    */
  private def packShardAssign(chunks: DataFrame, packTokens: Long,
      nShards: Int, binBase: Long): DataFrame = {
    // 6. pack chunks into fixed token-budget bins (two-pass prefix sum)
    val bins = Relational.packSized(
        chunks.select(col("ckey").as("doc_id"), col("n_tokens")),
        packTokens)
      .select(col("doc_id").as("ckey"),
        (col("bin_id") + lit(binBase)).as("bin_id"))

    // 7. shard the BINS (the export unit) content-addressed; the bin
    //    relation is total-tokens/packTokens rows — broadcast-sized
    val shards = Relational.shuffleShard(
        bins.select("bin_id").distinct(), "bin_id", nShards)
      .select("bin_id", "shard")

    chunks
      .join(bins, Seq("ckey"))
      .join(F.broadcast(shards), Seq("bin_id"))
  }

  private def packShardEmit(chunks: DataFrame, packTokens: Long,
      nShards: Int, binBase: Long,
      mat: (DataFrame, String) => DataFrame =
        graft.core.Rounds.materializer(None)): DataFrame = {
    mat(packShardAssign(chunks, packTokens, nShards, binBase)
      .select(
        col("doc_id"),
        col("chunk_idx").cast("long").as("chunk_idx"),
        col("n_tokens"),
        md5(array_join(transform(col("ids"), _.cast("string")), " "))
          .as("ids_digest"),
        col("bin_id"),
        col("shard")),
      "pack_shard_emit")
  }

  /** Fold a NEW CRAWL into a corpus built by [[corpusBuildWithState]],
    * at cost proportional to the CHANGE, not the corpus. Returns a
    * changeset — one relation of
    * (op, doc_id, chunk_idx, n_tokens, ids_digest, bin_id, shard):
    *
    *   - `op = 'del'` (tombstones): doc_ids REMOVED from or CHANGED in
    *     the new crawl — a reader drops their chunks (chunk fields are
    *     the -1/0/'' sentinels). Emitted snapshot-level, without
    *     consulting the chunk store: a tombstone for a doc that never
    *     had chunks is a harmless no-op under [[applyCorpusDelta]].
    *   - `op = 'add'`: training chunks (the [[corpusBuild]] schema) for
    *     the delta docs that survive the full gate chain, packed into
    *     bins STRICTLY ABOVE the standing corpus's max_bin (append-only
    *     placement — existing bins and shards are immutable).
    *
    * The delta replays the build's stages over the CHANGED SLICE under
    * frozen v1 decisions:
    *
    *   1. diff      — new crawl fingerprints vs the `p_snapshot` table
    *                  ([[Dedup.snapshotDiff]] semantics); unchanged
    *                  docs exit here, which is what makes everything
    *                  downstream delta-sized
    *   2. curate    — [[Curation.curate]] over added ∪ changed only
    *   3. screen    — exact: fp ∈ snapshot of non-tombstoned docs;
    *                  near-dup: [[Dedup.probeNearDupIndex]] against the
    *                  persisted band index, hits filtered to corpus
    *                  docs still standing (a near-dup of a doc being
    *                  removed THIS round does not screen)
    *   4. self-dedup— canonical resolution WITHIN the screened delta
    *                  (standing-screen first, then self: a delta doc
    *                  whose only dup was itself screened away survives)
    *   5. mix       — the FROZEN `p_mix` thresholds; content-addressed
    *                  membership needs no corpus rescan. A delta group
    *                  with no frozen threshold fails loudly (a frozen
    *                  mix cannot place an unseen group).
    *   6. tokenize  — the FROZEN `p_merges` tokenizer; no retrain
    *   7. chunk/pack/shard — bins offset past `max_bin`
    *
    * `corpusDocs` is the relation holding the STANDING corpus's text
    * (the previous crawl): it is touched only by the probe's verify
    * semi-join — candidate-sized, never a full-corpus pass.
    *
    * Known semantic edge (inherent to crawl-diff incrementality, shared
    * by every delta-maintenance design that doesn't track dup groups):
    * when a standing doc is removed, crawl twins that were SUPPRESSED
    * as its duplicates in earlier rounds are not re-evaluated — they
    * diff as "unchanged". A periodic full rebuild reconciles; the
    * DuckDB oracle replays the same rule, so the behavior is pinned,
    * not accidental.
    *
    * `commit = true` additionally advances the state family to the new
    * crawl (snapshot ← new fingerprints; standing ← survivors folded
    * in, tombstones out; band index ← delta survivors appended;
    * `p__spec.max_bin` ← new max bin, written LAST), enabling a THIRD
    * crawl to delta against this one. The updates run after the
    * changeset is fully materialized and all inputs they read are
    * checkpointed, so no write ever overwrites a table its own plan
    * still reads. A crash PART-WAY through the commit leaves mixed-
    * generation state — re-run the full [[corpusBuildWithState]] to
    * reconcile (the streaming tiers' batch_id replay machinery is the
    * tool for exactly-once ingestion; a corpus delta is a maintenance
    * transaction, run it like one).
    *
    * `checkpointDir` selects the materializer for the delta's stage
    * waists ([[graft.core.Rounds]]'s contract): `None` (default) uses
    * `localCheckpoint` — fastest, but the buffers live in executor
    * block-manager memory and die with an executor, failing the
    * transaction; `Some(dir)` writes each waist as parquet under `dir`
    * so a cluster run survives executor loss mid-delta. Waists are
    * DELTA-sized either way, so the reliable form's extra I/O is
    * proportional to the change, not the corpus.
    */
  def corpusDelta(newCrawl: DataFrame, corpusDocs: DataFrame,
      statePrefix: String, commit: Boolean = false,
      checkpointDir: Option[String] = None): DataFrame = {
    val spark = newCrawl.sparkSession
    val spec = graft.sources.IndexSpec.readRequired(spark, statePrefix)
    val chunkTokens = spec.getAs[Int]("chunk_tokens")
    val packTokens = spec.getAs[Long]("pack_tokens")
    val nShards = spec.getAs[Int]("n_shards")
    val threshold = spec.getAs[Double]("neardup_threshold")
    val binBase = spec.getAs[Long]("max_bin") + 1L

    val snap = spark.table(snapshotTable(statePrefix))
    val newFpsPlan = newCrawl.select(col("doc_id"),
      TextAnalysis.fingerprint(col("text")).as("new_fp"))
    // A committed delta consumes the full-crawl fingerprint projection
    // TWICE — the diff here, then the snapshot advance in
    // [[commitDelta]] — and the projection's input is the crawl TEXT,
    // the dominant corpus-sized pass of the whole delta. Persisting the
    // fp rows (doc_id + 16-byte digest, tiny next to the text) makes
    // the crawl scan run ONCE: the diff's materialization fills the
    // cache as a side effect and the commit reads it back. Uncommitted
    // deltas read the projection once and skip the cache. Released in
    // the same finally as the diff.
    val newFps =
      if (commit)
        newFpsPlan.persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else newFpsPlan
    // the diff joins fingerprint relations (16-byte rows), never text;
    // only the changed slice flows on
    val diff = snap.select(col("doc_id"), col("fp").as("old_fp"))
      .join(newFps, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("old_fp").isNull, "added")
          .when(col("new_fp").isNull, "removed")
          .when(col("old_fp") =!= col("new_fp"), "changed")
          .otherwise("unchanged").as("status"))
      .filter(col("status") =!= "unchanged")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // per-invocation nonce in the waist names: a LATER delta against
    // the same checkpointDir must not overwrite parquet a still-held
    // earlier changeset reads (Rounds' distinct-names contract)
    val nonce = java.lang.Long.toHexString(System.nanoTime())
    val matBase = graft.core.Rounds.materializer(checkpointDir)
    val mat = (df: DataFrame, name: String) =>
      matBase(df, s"${name}_$nonce")
    try corpusDeltaOnDiff(newCrawl, newFps, corpusDocs, statePrefix,
      commit, diff, chunkTokens, packTokens, nShards, threshold, binBase,
      mat)
    finally {
      diff.unpersist()
      if (commit) newFps.unpersist()
    }
  }

  private def corpusDeltaOnDiff(newCrawl: DataFrame, newFps: DataFrame,
      corpusDocs: DataFrame, statePrefix: String, commit: Boolean,
      diff: DataFrame, chunkTokens: Int, packTokens: Long, nShards: Int,
      threshold: Double, binBase: Long,
      mat: (DataFrame, String) => DataFrame): DataFrame = {
    val spark = newCrawl.sparkSession
    val snap = spark.table(snapshotTable(statePrefix))
    val tombstones = diff
      .filter(col("status").isin("removed", "changed")).select("doc_id")
    val deltaIds = diff
      .filter(col("status").isin("added", "changed")).select("doc_id")

    // Lineage discipline for everything below: each stage's output is
    // DELTA-sized and the next stage references it SEVERAL times (the
    // probe reads its batch thrice, the LSH self-join more) — left
    // lazy, those references re-execute the whole upstream chain
    // multiplicatively (measured: the 2%-delta run cost MORE than the
    // full 20× build before these cuts, ~86 s of repeated curation/
    // probe subtrees and driver re-planning — the plan-explosion class
    // trainMerges' round materializer exists for). Each waist is
    // eagerly materialized through `mat` (localCheckpoint by default,
    // reliable parquet under `checkpointDir`): delta-sized data, one
    // execution per stage, leaf-sized plans downstream.

    // 2. curate the delta slice (text re-attached, curate's contract)
    val deltaDocs = newCrawl.join(deltaIds, Seq("doc_id"))
    val deltaCurDocs = mat(deltaDocs
      .join(Curation.curate(deltaDocs).select("doc_id"), Seq("doc_id")),
      "delta_curated")

    // 3a. exact screen: a delta doc whose content already exists in a
    //     NON-tombstoned snapshot doc is a re-upload, not new content.
    //     (Snapshot fps, not curated fps: any snapshot doc with equal
    //     text passes/fails the curation gates identically, so the fp
    //     sets coincide for docs that reach this screen.)
    val afterExact = mat(exactScreen(deltaCurDocs, snap, tombstones),
      "delta_after_exact")

    // 3b–7. the shared admission chain (near-dup screen vs standing,
    //        self-dedup, frozen mix/encode, pack/shard above binBase)
    val standingNow = spark.table(standingTable(statePrefix))
      .join(tombstones, Seq("doc_id"), "left_anti")
    val (survivors, adds) = admitScreened(afterExact, corpusDocs,
      statePrefix, standingNow, chunkTokens, packTokens, nShards,
      threshold, binBase, mat)

    val out = mat(tombstones
      .select(lit("del").as("op"), col("doc_id"),
        lit(-1L).as("chunk_idx"), lit(0L).as("n_tokens"),
        lit("").as("ids_digest"), lit(-1L).as("bin_id"),
        lit(-1L).as("shard"))
      .unionByName(adds.select(lit("add").as("op"), col("doc_id"),
        col("chunk_idx"), col("n_tokens"), col("ids_digest"),
        col("bin_id"), col("shard"))),
      "delta_changeset")

    if (commit)
      // the CACHED full-crawl fingerprint rows the diff already
      // materialized (see corpusDelta's persist) — the snapshot
      // advance reads the cache, so a committed delta pays ONE
      // corpus-sized fp scan, not a second re-derivation
      commitDelta(spark, statePrefix,
        newFps.select(col("doc_id"), col("new_fp").as("fp")),
        survivors, standingNow, out, spec = (chunkTokens, packTokens,
          nShards, threshold, binBase), mat)
    out
  }

  /** The delta's exact-dup screen: drop every delta doc whose content
    * fingerprint already exists in a snapshot doc that is NOT being
    * tombstoned this round. The corpus side NEVER shuffles — the
    * snapshot is consumed as one shuffle-free bucketed scan filtered
    * through a broadcast of the delta's (small) fp set, then the
    * bounded hit set flows back as a broadcast into a delta-side
    * anti-join. The only shuffle exchanges in the plan are the two
    * fp-distincts, both over DELTA-sized (or hit-set-sized) rows —
    * gated by PipelineSpec's plan test. If a delta's fp set ever
    * outgrew the broadcast budget (a crawl churning a double-digit
    * percentage of a 100-TB corpus is a rebuild, not a delta), the
    * fallback is a persisted fp-bucketed twin of the snapshot.
    */
  private[graft] def exactScreen(deltaCurDocs: DataFrame,
      snap: DataFrame, tombstones: DataFrame): DataFrame = {
    val fpCol = "__fp_delta"
    val withFp = deltaCurDocs
      .withColumn(fpCol, TextAnalysis.fingerprint(col("text")))
    val hitFps = snap
      .join(F.broadcast(withFp.select(col(fpCol).as("fp")).distinct()),
        Seq("fp"), "left_semi")
      .join(F.broadcast(tombstones), Seq("doc_id"), "left_anti")
      .select("fp").distinct()
    withFp
      .join(F.broadcast(hitFps.withColumnRenamed("fp", fpCol)),
        Seq(fpCol), "left_anti")
      .drop(fpCol)
  }

  /** Stages 3b–7 of the delta admission chain over an exact-screened
    * candidate slice: near-dup screen against `standingNow` via the
    * persisted band index (bucketed probe + candidate-slice verify,
    * the q130 cost shape), canonical resolution WITHIN the slice (a
    * candidate whose only dup was itself screened away survives),
    * frozen mix (loud refusal on an unseen group), frozen tokenizer,
    * chunk/pack/shard above `binBase`. Returns (survivors, adds):
    * survivors feed a commit's standing/index advance, adds are the
    * new chunk rows. Shared by [[corpusDelta]] (candidates = the
    * crawl's changed slice) and [[reconcileDelta]] (candidates =
    * suppressed content re-surfacing after removals).
    */
  private def admitScreened(afterExact: DataFrame, corpusDocs: DataFrame,
      statePrefix: String, standingNow: DataFrame, chunkTokens: Int,
      packTokens: Long, nShards: Int, threshold: Double, binBase: Long,
      mat: (DataFrame, String) => DataFrame): (DataFrame, DataFrame) = {
    val spark = afterExact.sparkSession
    val ndHits = Dedup.probeNearDupIndex(afterExact, corpusDocs,
        neardupTable(statePrefix), threshold, NdNgram, NdK, NdBands)
      .join(standingNow.select(col("doc_id").as("corpus_id")),
        Seq("corpus_id"))
      .select(col("new_id").as("doc_id")).distinct()
    val screened = mat(afterExact.join(ndHits, Seq("doc_id"), "left_anti"),
      "delta_screened")

    // canonical resolution WITHIN the screened slice (the build's
    // stage-2 machinery over the candidate slice)
    val selfKeep = Dedup.resolveCanonical(screened,
        Dedup.dupComponents(Dedup.minhashDupPairs(screened,
          threshold = threshold, ngram = NdNgram, k = NdK,
          bands = NdBands)))
      .filter(col("keep") === 1L)
      .select("doc_id")
    val survivors = mat(screened.join(selfKeep, Seq("doc_id")),
      "delta_survivors")

    // frozen mix. Coverage check first — group-cardinality-bounded
    // collect, same bound as the threshold broadcast itself.
    val thresholds = spark.table(mixTable(statePrefix))
    val missing = survivors
      .select(col("lang").cast("string").as("grp")).distinct()
      .join(thresholds.select("grp"), Seq("grp"), "left_anti")
      .collect().map(_.getString(0)).sorted
    require(missing.isEmpty,
      s"corpusDelta: group(s) ${missing.mkString(", ")} have no " +
        s"frozen mix threshold in ${mixTable(statePrefix)} — a " +
        "frozen mix cannot place an unseen group; re-run " +
        "corpusBuildWithState to re-derive thresholds (or insert an " +
        "explicit threshold row for the new group)")
    val sel = Relational.mixtureApplyThresholds(survivors,
      col("doc_id"), col("lang"), thresholds)

    // frozen tokenizer (merges AND token-id space from v1), then
    // chunk/pack/shard above the standing bins
    val merges = Bpe.loadMerges(spark, mergesTable(statePrefix))
    val chunks = withChunkKey(
        Bpe.chunkEncoded(Bpe.encodeDocsFrozen(sel, merges,
          spark.table(vocabTable(statePrefix))), chunkTokens))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val adds =
      try packShardEmit(chunks, packTokens, nShards, binBase, mat)
      finally chunks.unpersist()
    (survivors, adds)
  }

  /** Re-admission candidates for [[reconcileDelta]] — the fp-tier
    * audit of the suppressed-twin edge. A crawl doc is a candidate
    * when it is UNCHANGED against the snapshot (changed/added docs
    * belong to [[corpusDelta]]), NOT standing, and its content
    * fingerprint exists on NO standing doc — content the crawl still
    * carries that the corpus no longer does, which a fresh rebuild
    * would re-evaluate but the crawl diff never re-surfaces (the
    * [[corpusDelta]] semantic edge). The count is the engine's
    * REBUILD-PRESSURE metric; note it includes curation-rejected docs
    * whose content never stood — [[reconcileDelta]]'s admission chain
    * re-applies those gates before anything is re-admitted.
    *
    * Cost shape: fp rows only, never text. The doc_id joins are
    * snapshot-side exchange-free (bucketed layout); the fp anti-join
    * re-keys both sides by fp — a corpus-sized shuffle of 16-byte
    * rows, the irreducible cost of asking "which content is absent",
    * and the reason this is an occasional maintenance pass rather
    * than part of every crawl's delta.
    */
  def reconcileCandidates(newCrawl: DataFrame,
      statePrefix: String): DataFrame = {
    val spark = newCrawl.sparkSession
    graft.sources.IndexSpec.readRequired(spark, statePrefix)
    val snap = spark.table(snapshotTable(statePrefix))
    val standing = spark.table(standingTable(statePrefix))
    val newFps = newCrawl.select(col("doc_id"),
      TextAnalysis.fingerprint(col("text")).as("fp"))
    val unchanged = snap.join(newFps, Seq("doc_id", "fp"), "left_semi")
    val standingFps = snap.join(standing, Seq("doc_id"), "left_semi")
      .select("fp")
    unchanged
      .join(standing, Seq("doc_id"), "left_anti")
      .join(standingFps, Seq("fp"), "left_anti")
      .select("doc_id")
  }

  /** Close the [[corpusDelta]] semantic edge WITHOUT a full rebuild:
    * re-evaluate the [[reconcileCandidates]] (suppressed or rejected
    * crawl content whose standing counterpart has since been removed)
    * through the delta's own admission chain — curation, near-dup
    * screen against the standing corpus, self canonical resolution,
    * frozen mix, frozen tokenizer — and emit their chunks as an
    * add-only changeset packed above the standing `max_bin`
    * (foldable by [[applyCorpusDelta]] like any delta).
    *
    * `newCrawl` must be the crawl the state's snapshot was committed
    * from: candidates are restricted to docs UNCHANGED against the
    * snapshot, so a stale or mutated crawl simply contributes fewer
    * candidates, never wrong ones.
    *
    * `commit = true` advances standing/band-index/spec exactly like a
    * committed delta; the snapshot is NOT rewritten — every candidate
    * is already in it. After a commit the operator is IDEMPOTENT: the
    * re-admitted docs are standing, so a second pass emits an empty
    * changeset (curation-rejected docs legitimately remain fp-tier
    * [[reconcileCandidates]] — the admission chain re-drops them).
    * PipelineSpec gates this, and gates that a fold of delta +
    * reconcile reaches the REBUILD's doc set exactly on the
    * suppressed-twin construction.
    *
    * What still needs a periodic rebuild: re-TRAINING — the frozen mix
    * thresholds and tokenizer drift from the corpus distribution as
    * deltas accumulate; reconciliation re-admits content but never
    * re-derives decisions. Policy note: where a fresh rebuild might
    * elect a re-surfacing twin as its cluster's canonical (e.g. a
    * longer duplicate), reconciliation — like the delta screen —
    * always keeps the doc already standing.
    */
  def reconcileDelta(newCrawl: DataFrame, corpusDocs: DataFrame,
      statePrefix: String, commit: Boolean = false,
      checkpointDir: Option[String] = None): DataFrame = {
    val spark = newCrawl.sparkSession
    val spec = graft.sources.IndexSpec.readRequired(spark, statePrefix)
    val chunkTokens = spec.getAs[Int]("chunk_tokens")
    val packTokens = spec.getAs[Long]("pack_tokens")
    val nShards = spec.getAs[Int]("n_shards")
    val threshold = spec.getAs[Double]("neardup_threshold")
    val binBase = spec.getAs[Long]("max_bin") + 1L
    val nonce = java.lang.Long.toHexString(System.nanoTime())
    val matBase = graft.core.Rounds.materializer(checkpointDir)
    val mat = (df: DataFrame, name: String) =>
      matBase(df, s"${name}_$nonce")

    // candidate slice, curated (the candidates' fps are all IN the
    // snapshot by construction, so the delta's snapshot-fp exact
    // screen would reject every one of them — the standing-fp absence
    // test inside reconcileCandidates IS this path's exact screen;
    // curate's own fp window dedups within the slice)
    val candDocs = newCrawl
      .join(reconcileCandidates(newCrawl, statePrefix), Seq("doc_id"))
    val candCur = mat(candDocs
      .join(Curation.curate(candDocs).select("doc_id"), Seq("doc_id")),
      "reconcile_curated")

    val standing = spark.table(standingTable(statePrefix))
    val (survivors, adds) = admitScreened(candCur, corpusDocs,
      statePrefix, standing, chunkTokens, packTokens, nShards,
      threshold, binBase, mat)

    val out = mat(adds.select(lit("add").as("op"), col("doc_id"),
      col("chunk_idx"), col("n_tokens"), col("ids_digest"),
      col("bin_id"), col("shard")), "reconcile_changeset")

    if (commit) {
      import spark.implicits._
      val newStanding = mat(standing
        .unionByName(survivors.select("doc_id")), "reconcile_standing")
      graft.sources.Sinks.saveTablePartitioned(newStanding,
        standingTable(statePrefix),
        bucketBy = Some((32, Seq("doc_id"))), sortBy = Seq("doc_id"))
      Dedup.appendNearDupIndex(survivors, neardupTable(statePrefix),
        ngram = NdNgram, k = NdK, bands = NdBands)
      val newMaxBin = Option(out.agg(max("bin_id")).head().get(0))
        .map(_.asInstanceOf[Long]).getOrElse(binBase - 1L)
      graft.sources.IndexSpec.write(
        Seq((spec.getAs[Long]("mix_budget_tokens"), chunkTokens,
          packTokens, spec.getAs[Int]("num_merges"), nShards, threshold,
          newMaxBin))
          .toDF("mix_budget_tokens", "chunk_tokens", "pack_tokens",
            "num_merges", "n_shards", "neardup_threshold", "max_bin"),
        statePrefix)
    }
    out
  }

  /** The state advance of a committed delta (see [[corpusDelta]]).
    * Every input that reads a state table is materialized BEFORE the
    * first overwrite, so no write consumes a table it is replacing.
    * The spec (with the new max_bin) is written last — the same
    * commit-marker role it plays in the initial build.
    */
  private def commitDelta(spark: SparkSession, statePrefix: String,
      newFps: DataFrame, survivors: DataFrame, standingNow: DataFrame,
      out: DataFrame,
      spec: (Int, Long, Int, Double, Long),
      mat: (DataFrame, String) => DataFrame): Unit = {
    import spark.implicits._
    val (chunkTokens, packTokens, nShards, threshold, binBase) = spec
    // materialize everything that still reads the old state tables
    // (survivors arrives already checkpointed — the delta's waist).
    // newFps needs NO barrier: it reads only the caller's crawl (never
    // a state table) and arrives cache-materialized by the diff — the
    // snapshot write below is the committed delta's SECOND and last
    // consumer of the one fp scan.
    val newStanding = mat(standingNow
      .unionByName(survivors.select("doc_id")), "commit_standing")

    // same bucketed layout the build writes, so the NEXT delta's joins
    // stay snapshot-side exchange-free
    graft.sources.Sinks.saveTablePartitioned(newFps,
      snapshotTable(statePrefix),
      bucketBy = Some((32, Seq("doc_id"))), sortBy = Seq("doc_id"))
    graft.sources.Sinks.saveTablePartitioned(newStanding,
      standingTable(statePrefix),
      bucketBy = Some((32, Seq("doc_id"))), sortBy = Seq("doc_id"))
    Dedup.appendNearDupIndex(survivors, neardupTable(statePrefix),
      ngram = NdNgram, k = NdK, bands = NdBands)
    val newMaxBin = Option(out.filter(col("op") === "add")
        .agg(max("bin_id")).head().get(0))
      .map(_.asInstanceOf[Long]).getOrElse(binBase - 1L)
    val old = graft.sources.IndexSpec.readRequired(spark, statePrefix)
    graft.sources.IndexSpec.write(
      Seq((old.getAs[Long]("mix_budget_tokens"), chunkTokens,
        packTokens, old.getAs[Int]("num_merges"), nShards, threshold,
        newMaxBin))
        .toDF("mix_budget_tokens", "chunk_tokens", "pack_tokens",
          "num_merges", "n_shards", "neardup_threshold", "max_bin"),
      statePrefix)
  }

  /** Fold a [[corpusDelta]] changeset into a chunk relation: drop every
    * chunk of a tombstoned doc, then append the delta's chunks — the
    * [[Relational.mergeChangeset]] shape specialized to the corpus
    * schema (delete-then-add per doc, so a CHANGED doc's old chunks
    * never coexist with its new ones). One anti-join + one union; at
    * scale both sides stay partitioned by doc_id.
    */
  def applyCorpusDelta(chunks: DataFrame, delta: DataFrame): DataFrame = {
    val dels = delta.filter(col("op") === "del")
      .select("doc_id").distinct()
    val adds = delta.filter(col("op") === "add").drop("op")
    chunks.join(dels, Seq("doc_id"), "left_anti").unionByName(adds)
  }

  /** Close the delta loop: squash a chunk relation maintained through N
    * [[applyCorpusDelta]] folds into a FRESH corpus table. After N
    * committed deltas a reader pays N chained anti-joins and the bin
    * space / tombstone set grow monotonically (delta bins are
    * append-only and never reclaim the holes deletions leave);
    * compaction resets both: the folded chunks are RE-PACKED into
    * contiguous bins from 0 (same pack_tokens budget and shard count
    * the state's spec froze — chunk content, ids_digest and geometry
    * are untouched, only bin/shard placement changes) and written as a
    * doc_id-bucketed table, so subsequent reads are one shuffle-free
    * scan in the q48 layout.
    *
    * Compaction also VACUUMS the band index
    * ([[graft.operators.Dedup.compactNearDupIndex]] against the
    * standing set): append-only growth leaves entries for docs that
    * have since left the corpus, and while probes stay correct (hits
    * are standing-filtered), their cost drifts upward with the
    * garbage. The rest of the state family needs no reconciliation —
    * snapshot, standing set, mix thresholds and tokenizer describe
    * DOC content, which compaction does not touch. Only the spec's
    * `max_bin` advances (shrinks), written LAST: until it lands, a
    * concurrent-crash window leaves deltas appending above the OLD
    * max_bin, which stays collision-free against both the folded and
    * the compacted relation (compacted bins are ≤ the old max). The
    * operator is re-entrant — re-running overwrites the output table
    * and rewrites the spec.
    *
    * NOT run here: re-evaluation of crawl twins suppressed as
    * duplicates of since-removed docs (the [[corpusDelta]] semantic
    * edge) — that requires the crawl TEXT, not the chunk relation; a
    * periodic full [[corpusBuildWithState]] reconciles it, and
    * PipelineSpec pins that the reconciliation diff is EXACTLY the
    * suppressed-twin set.
    */
  def compactCorpus(chunks: DataFrame, statePrefix: String,
      saveAs: String): DataFrame = {
    val spark = chunks.sparkSession
    import spark.implicits._
    val spec = graft.sources.IndexSpec.readRequired(spark, statePrefix)
    val packTokens = spec.getAs[Long]("pack_tokens")
    val nShards = spec.getAs[Int]("n_shards")

    // re-key and persist: the pack's two-pass prefix sum, the shard
    // map, and the final join all re-read the folded relation, whose
    // own plan may be N anti-joins deep — exactly the cost compaction
    // exists to stop paying
    val keyed = withChunkKey(chunks.select(
        col("doc_id"), col("chunk_idx"), col("n_tokens"),
        col("ids_digest")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val out =
      try {
        val assigned = packShardAssign(keyed, packTokens, nShards,
            binBase = 0L)
          .select(col("doc_id"),
            col("chunk_idx").cast("long").as("chunk_idx"),
            col("n_tokens"), col("ids_digest"), col("bin_id"),
            col("shard"))
        graft.sources.Sinks.saveTablePartitioned(assigned, saveAs,
          bucketBy = Some((32, Seq("doc_id"))), sortBy = Seq("doc_id"))
        spark.table(saveAs)
      } finally keyed.unpersist()

    // vacuum the band index: appendNearDupIndex only ever grows it, so
    // entries of docs that have since left the corpus accumulate and
    // probe cost drifts upward with garbage (correct — hits are
    // standing-filtered — but paid on every delta). Compaction is the
    // natural reclaim point: keep exactly the standing docs' rows.
    Dedup.compactNearDupIndex(spark, neardupTable(statePrefix),
      spark.table(standingTable(statePrefix)))

    // spec advance LAST (max_bin only ever shrinks here) — the
    // compacted table is durable before any delta can place bins
    // against the new, smaller bin space
    val maxBin = Option(out.agg(max("bin_id")).head().get(0))
      .map(_.asInstanceOf[Long]).getOrElse(-1L)
    graft.sources.IndexSpec.write(
      Seq((spec.getAs[Long]("mix_budget_tokens"),
        spec.getAs[Int]("chunk_tokens"), packTokens,
        spec.getAs[Int]("num_merges"), nShards,
        spec.getAs[Double]("neardup_threshold"), maxBin))
        .toDF("mix_budget_tokens", "chunk_tokens", "pack_tokens",
          "num_merges", "n_shards", "neardup_threshold", "max_bin"),
      statePrefix)
    out
  }
}
