package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the composition a training-data pipeline
  * actually runs: quality gate → language gate → exact dedup → curated
  * corpus. Built as ONE pass over the documents scan (token features,
  * language argmax, and the dedup fingerprint are all computed in a
  * single projection) followed by exactly ONE shuffle (the dedup
  * window). At 100 TB that plan shape — not the individual operators —
  * is what makes curation affordable: no join-backs between stages, no
  * second scan of the raw text.
  */
object Curation {

  /** Leakage-safe train/val/test split: every row whose `groupCol` value
    * hashes alike lands in the SAME split, so correlated documents (one
    * domain's pages, one source's crawl) can never straddle the
    * train/test boundary — the group-aware split that keeps eval sets
    * honest. `splits` is (name, fraction) with fractions summing to 1.
    *
    * Assignment is a pure projection — no shuffle, no group table, no
    * join: the first 8 hex chars of `md5(groupCol)` are compared against
    * cumulative-fraction thresholds (hex strings compare exactly like
    * the 32-bit integers they spell, and md5 is engine-portable, so the
    * same row lands in the same split on any engine, any partitioning,
    * any run). Granularity is 1/2³² of the hash space — fractions are
    * honored to ~0.2 ppb in expectation over groups; realized shares
    * track fractions only as group count grows (20 sources will be
    * lumpy; a million domains will not). Null group keys hash as the
    * empty string — one deterministic split, not a null split.
    */
  def groupSplit(df: DataFrame, groupCol: String,
      splits: Seq[(String, Double)] = Seq(
        "train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
      splitName: String = "split"): DataFrame = {
    require(splits.size >= 2, "groupSplit: need at least two splits")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"groupSplit: fractions must sum to 1, got ${splits.map(_._2).sum}")
    require(splits.forall(_._2 > 0), "groupSplit: fractions must be > 0")
    val h = substring(md5(coalesce(col(groupCol).cast("string"), lit(""))),
      1, 8)
    val cuts = splits.init
      .scanLeft(0.0) { case (acc, (_, f)) => acc + f }.tail
      .map(f => f"${math.floor(f * 4294967296.0).toLong}%08x")
    val assigned = splits.init.map(_._1).zip(cuts)
      .foldRight(lit(splits.last._1)) { case ((name, cut), rest) =>
        when(h < lit(cut), lit(name)).otherwise(rest)
      }
    df.withColumn(splitName, assigned)
  }

  /** Cross-split leakage audit: near-duplicate pairs that STRADDLE the
    * [[groupSplit]] train/val/test boundary — the contamination a
    * group-aware split is supposed to prevent but can't when near-dup
    * content recurs under DIFFERENT group keys (the same article
    * syndicated on two domains lands in two splits). One row per
    * unordered split pair with its near-dup pair count; rows with
    * `crosses_boundary` are eval-set contamination, and a clean corpus
    * reports only same-split rows. Built on the EXACT Jaccard join
    * ([[Dedup.exactJaccardPairs]]), so a zero is a guarantee, not a
    * recall-limited estimate.
    *
    * Cost shape: the pair join dominates (see exactJaccardPairs); the
    * audit adds two joins of the (small) pair list against the pure-
    * projection split assignment and a six-row rollup.
    */
  def leakageAudit(documents: DataFrame, groupCol: String = "source",
      splits: Seq[(String, Double)] = Seq(
        "train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
      threshold: Double = 0.7, ngram: Int = 3): DataFrame = {
    val split = groupSplit(
      documents.select(col("doc_id"), col(groupCol)), groupCol, splits)
      .select(col("doc_id"), col("split"))
    Dedup.exactJaccardPairs(documents, threshold, ngram)
      .join(split.select(col("doc_id").as("doc_a"),
        col("split").as("split_a")), "doc_a")
      .join(split.select(col("doc_id").as("doc_b"),
        col("split").as("split_b")), "doc_b")
      .groupBy(
        least(col("split_a"), col("split_b")).as("split_lo"),
        greatest(col("split_a"), col("split_b")).as("split_hi"))
      .agg(count(lit(1)).as("n_pairs"))
      .withColumn("crosses_boundary", col("split_lo") =!= col("split_hi"))
  }

  /** Per-group score calibration: replace a raw score with its
    * percent-rank WITHIN its group, so scores become comparable ACROSS
    * groups — the fix for "source A's quality model scores run hot":
    * after calibration, "top 10% of each source" is the same filter
    * everywhere, immune to each scorer's scale and offset. percent_rank
    * (= (rank−1)/(n−1), ties sharing the min rank) depends only on rank,
    * so the output is deterministic under any tie order and any
    * partitioning.
    *
    * Scale shape: one window per group — a shuffle keyed by `groupCol`;
    * when one group dominates the corpus this has the same skew profile
    * as [[lengthPrune]]'s exact path, and the same remedy applies (the
    * approx-quantile broadcast variant).
    */
  def calibrateScores(df: DataFrame, groupCol: String, scoreCol: String,
      outCol: String = "calibrated"): DataFrame =
    df.withColumn(outCol,
      round(percent_rank().over(
        Window.partitionBy(groupCol).orderBy(scoreCol)), 6))

  /** Containment-based pruning — the RESOLUTION step for
    * [[Dedup.containmentPairs]]: a document is dropped when it is
    * contained (containment ≥ `threshold`) in a STRICTLY larger document
    * (more distinct shingles), or in an equal-sized one with a smaller
    * doc_id (equal-size pairs are mutually contained at the same score —
    * identical sets only at threshold 1.0 — so keep-lowest-id is a
    * deterministic symmetric tiebreak, matching exact-dedup's
    * convention). The
    * rule reads each doc's verdict off its own pair rows only — no
    * transitive chains, no iteration: quoted posts collapse into their
    * wrappers, wrappers survive unless themselves quoted whole. Output
    * is every document with a keep flag (1 = survivor), so
    * `filter(keep = 1)` IS the pruned corpus and the full frame stays a
    * provenance lookup.
    */
  def containmentPrune(documents: DataFrame, threshold: Double = 0.8,
      ngram: Int = 3): DataFrame = {
    val sizes = documents.select(col("doc_id"),
      size(Dedup.shingles(col("text"), ngram)).cast("long").as("n_sh"))
    val dropped = Dedup.containmentPairs(documents, threshold, ngram)
      .join(sizes.select(col("doc_id").as("doc_a"), col("n_sh").as("na")),
        "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n_sh").as("nb")),
        "doc_b")
      .filter(col("nb") > col("na") ||
        (col("nb") === col("na") && col("doc_b") < col("doc_a")))
      .select(col("doc_a").as("doc_id")).distinct()
      .withColumn("_dropped", lit(1))
    documents.select("doc_id")
      .join(dropped, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        when(col("_dropped").isNull, lit(1L)).otherwise(lit(0L))
          .as("keep"))
  }

  /** Percentile-based length pruning (the distribution-relative form of
    * Gopher's length rules): drop each language's shortest `dropBelow`
    * quantile instead of using one absolute token floor, so a threshold
    * tuned on English doesn't over-prune languages with different token
    * statistics. `percent_rank` = (rank−1)/(n−1) over (lang, token
    * count) — one shuffle on lang; ties share a rank, so equal-length
    * docs are kept or dropped together (no arbitrary cut inside a tie
    * class). Skew note: partition-per-language is fine while languages
    * number in the hundreds; a corpus dominated by one language still
    * sorts that language on one reducer chain — at that scale switch the
    * rank to approx_percentile thresholds computed per language and
    * broadcast back (same decisions up to sketch error, no global sort).
    */
  def lengthPrune(documents: DataFrame, dropBelow: Double = 0.1): DataFrame = {
    val w = Window.partitionBy(col("lang")).orderBy(col("n_toks").asc)
    documents
      .select(col("doc_id"), col("lang"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n_toks"))
      .withColumn("len_pr", percent_rank().over(w))
      .filter(col("len_pr") >= dropBelow)
      .withColumn("len_pr", round(col("len_pr"), 4))
  }

  /** The skew-proof form of [[lengthPrune]] — the one to run when one
    * language dominates the corpus. Instead of rank-sorting each
    * language on a single reducer chain, compute each language's
    * `dropBelow` token-count quantile with `approx_percentile` (a
    * mergeable sketch: map-side partials, no sort), broadcast the tiny
    * per-language threshold table back, and keep docs at or above their
    * language's cut. Decisions match [[lengthPrune]] up to sketch error
    * (`accuracy` trades memory for error ≈ 1/accuracy); equal-length
    * docs are still kept or dropped together, since the decision reads
    * only (lang, n_toks). Plan: one scan + one agg whose output is
    * #languages rows + one broadcast join — no per-language sort, so a
    * 90%-English corpus costs the same as a uniform one.
    */
  def lengthPruneApprox(documents: DataFrame, dropBelow: Double = 0.1,
      accuracy: Int = 10000): DataFrame = {
    val toks = documents
      .select(col("doc_id"), col("lang"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n_toks"))
    val cuts = toks.groupBy("lang")
      .agg(percentile_approx(col("n_toks"), lit(dropBelow), lit(accuracy))
        .as("len_cut"))
    toks.join(broadcast(cuts), "lang")
      .filter(col("n_toks") >= col("len_cut"))
      .select(col("doc_id"), col("lang"), col("n_toks"), col("len_cut"))
  }

  /** Curate: keep docs whose token count lies in [minTokens, maxTokens]
    * and whose predicted language is in `keepLangs`, then keep one doc
    * (lowest doc_id) per content fingerprint. Output carries the
    * features used for the decision — the lineage a dataset card needs.
    */
  def curate(
      documents: DataFrame,
      minTokens: Long = 30,
      maxTokens: Long = 120,
      keepLangs: Seq[String] = Seq("en", "unknown")): DataFrame = {
    val staged = Dedup.spread(documents).select(
      col("doc_id"), col("lang"), col("source"), col("n_chars"),
      TextAnalysis.tokens(lower(col("text"))).as("toks"),
      TextAnalysis.fingerprint(col("text")).as("fp"))
    val featured = staged.select(
      col("doc_id"), col("lang"), col("source"), col("n_chars"), col("fp"),
      size(col("toks")).cast("long").as("n_tokens"),
      TextAnalysis.langPredicted(TextAnalysis.langBest(col("toks")))
        .as("predicted_lang"))
    val kept = featured
      .filter(col("n_tokens").between(minTokens, maxTokens) &&
        col("predicted_lang").isin(keepLangs: _*))
    val w = Window.partitionBy("fp").orderBy(col("doc_id").asc)
    kept
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("doc_id", "lang", "source", "n_chars", "n_tokens",
        "predicted_lang")
  }

  /** Funnel stats for the same gates: one row per (stage, reason). */
  def curationFunnel(
      documents: DataFrame,
      minTokens: Long = 30,
      maxTokens: Long = 120,
      keepLangs: Seq[String] = Seq("en", "unknown")): DataFrame = {
    val staged = Dedup.spread(documents).select(
      TextAnalysis.tokens(lower(col("text"))).as("toks"),
      TextAnalysis.fingerprint(col("text")).as("fp"))
    val featured = staged.select(
      col("fp"),
      size(col("toks")).cast("long").as("n_tokens"),
      TextAnalysis.langPredicted(TextAnalysis.langBest(col("toks")))
        .as("predicted_lang"))
    featured.select(
      when(!col("n_tokens").between(minTokens, maxTokens), "drop_length")
        .when(!col("predicted_lang").isin(keepLangs: _*), "drop_lang")
        .otherwise("keep").as("verdict"))
      .groupBy("verdict")
      .agg(count(lit(1)).as("n_docs"))
  }
}
