package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The word-count family (SURVEY §2.4 A1/A5/A6/A7) over the `documents`
  * table. Tokenization is `explode(tokens(...))` — the Generator path that
  * replaces MR/RDD flatMap (`WordCount.java:25-32`,
  * `301-solutions.scala:11`) — and uses the same whitespace tokenizer as
  * TextAnalysis so token counts agree corpus-wide. All aggregations get
  * map-side partial aggregation; the shuffle moves (token, partial-count)
  * pairs, which for a natural-language corpus is vastly smaller than the
  * input.
  */
object TextOps {

  /** Tokens per document row, empty tokens dropped. Single-split inputs
    * are spread first — tokenization+explode is per-row CPU work.
    */
  private def words(documents: DataFrame) =
    Dedup.spread(documents).select(
      col("doc_id"),
      explode(TextAnalysis.tokens(col("text"))).as("word"))

  /** A1: word count (`301-solutions.scala:21-31`). */
  def wordCount(documents: DataFrame): DataFrame =
    words(documents).groupBy("word").agg(count(lit(1)).as("cnt"))

  /** A1 variant: word-length histogram (`301-solutions.scala:35-39`). */
  def wordLengthCount(documents: DataFrame): DataFrame =
    words(documents)
      .groupBy(length(col("word")).cast("long").as("word_len"))
      .agg(count(lit(1)).as("cnt"))

  /** A5: average word length by initial letter
    * (`Ex4AverageWordLength.java:24-46`). Canonical Double semantics
    * (SURVEY §7.4.3 — the MR-combiner integer division is a recorded
    * divergence, not replicated).
    */
  def avgWordLengthByInitial(documents: DataFrame): DataFrame =
    words(documents)
      .groupBy(substring(col("word"), 1, 1).as("initial"))
      .agg(
        // exact long sum ÷ count — deterministic across engines
        round(sum(length(col("word")).cast("long")).cast("double") /
          count(lit(1)), 4).as("avg_len"),
        count(lit(1)).as("cnt"))

  /** A6/A7: inverted index — word → sorted posting list of the first
    * `maxPostings` doc ids (by doc_id asc), plus the exact total doc count
    * (`Ex4InvertedIndex.java:23-45`). Posting lists are rendered as a CSV
    * string for a stable cross-engine representation.
    *
    * Scale note: posting lists are CAPPED — an unbounded
    * `collect_set(doc_id)` for a corpus-scale stopword is one
    * hundreds-of-millions-element aggregation buffer on one reducer (OOM on
    * the skewed key). The cap is applied with a window `row_number` BEFORE
    * the collect, so no buffer ever exceeds `maxPostings`; the exact
    * cardinality is still reported via `n_docs` (a partial-aggregating
    * count, safe at any scale).
    */
  /** BM25 relevance score per (doc, term) — Robertson idf with the +1
    * floor (never negative) and standard k1/b length normalization. Same
    * aggregation shape as [[tfIdf]] plus a per-doc length table; the two
    * corpus scalars (N, avgdl) broadcast. All double arithmetic is one
    * mirrored expression chain (see the oracle SQL), exact inputs.
    */
  def bm25(documents: DataFrame, k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    val w = words(documents)
    val tf = w.groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
    val dl = w.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val dfq = tf.groupBy("word").agg(count(lit(1)).as("df"))
    val n = documents.agg(count(lit(1)).as("n"))
    val avg = dl.agg((sum("dl").cast("double") / count(lit(1))).as("avgdl"))
    val idf = log(
      (col("n").cast("double") - col("df") + 0.5) / (col("df") + 0.5) + 1.0)
    val tfn = (col("tf").cast("double") * (k1 + 1.0)) /
      (col("tf").cast("double") +
        lit(k1) * (lit(1.0 - b) +
          lit(b) * (col("dl").cast("double") / col("avgdl"))))
    tf.join(dl, "doc_id").join(dfq, "word")
      .crossJoin(broadcast(n)).crossJoin(broadcast(avg))
      .select(col("doc_id"), col("word"), col("tf"),
        round(idf * tfn, 6).as("bm25"))
  }

  /** Collocation mining: adjacent-token bigram counts + pointwise mutual
    * information. PMI = ln(P(w1,w2) / (P(w1)·P(w2))) computed as one
    * double expression with the operand order mirrored in the SQL oracle
    * (deterministic cross-engine). Three uniform-key aggregations plus
    * two broadcast scalars; the bigram explode is per-row and the counts
    * shuffle is bounded by vocabulary², not corpus size.
    */
  def collocations(documents: DataFrame, minCount: Long = 5): DataFrame = {
    val toksDf = Dedup.spread(documents)
      .select(TextAnalysis.tokens(col("text")).as("toks"))
    val bigrams = toksDf.select(
      explode(when(size(col("toks")) >= 2,
        expr("transform(sequence(1, size(toks)-1), " +
          "i -> concat(element_at(toks, i), ' ', element_at(toks, i+1)))"))
        .otherwise(expr("array()"))).as("bigram"))
    val pairCounts = bigrams.groupBy("bigram")
      .agg(count(lit(1)).as("pair_count"))
      .select(
        split(col("bigram"), " ").getItem(0).as("w1"),
        split(col("bigram"), " ").getItem(1).as("w2"),
        col("pair_count"))
    val uniCounts = toksDf.select(explode(col("toks")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("c"))
    val nUni = uniCounts.agg(sum("c").as("n_uni"))
    val nBig = pairCounts.agg(sum("pair_count").as("n_big"))
    pairCounts
      .join(uniCounts.select(col("word").as("w1"), col("c").as("c_a")), "w1")
      .join(uniCounts.select(col("word").as("w2"), col("c").as("c_b")), "w2")
      .crossJoin(broadcast(nUni)).crossJoin(broadcast(nBig))
      .filter(col("pair_count") >= minCount)
      .select(col("w1"), col("w2"), col("pair_count"),
        round(log(
          (col("pair_count").cast("double") * col("n_uni") * col("n_uni")) /
            (col("n_big").cast("double") * col("c_a") * col("c_b"))), 6)
          .as("pmi"))
  }

  /** TF-IDF per (doc, term): smoothed idf = ln((N+1)/(df+1)) + 1 (the
    * sklearn-style smoothing — never zero, no div-by-zero on unseen
    * terms). Three aggregations, all on uniformly-hashed keys: term
    * frequency per (doc, word), document frequency per word, corpus size
    * as a broadcast scalar — no step is bounded by a single reducer.
    */
  def tfIdf(documents: DataFrame): DataFrame = {
    val tf = words(documents)
      .groupBy("doc_id", "word")
      .agg(count(lit(1)).as("tf"))
    val docFreq = tf.groupBy("word").agg(count(lit(1)).as("df"))
    val n = documents.agg(count(lit(1)).as("n"))
    tf.join(docFreq, "word")
      .crossJoin(broadcast(n))
      .select(
        col("doc_id"), col("word"), col("tf"),
        round(col("tf") *
          (log((col("n") + 1).cast("double") / (col("df") + 1)) + 1), 6)
          .as("tf_idf"))
  }

  /** A6 variant (SURVEY §7.4.6): word → global word POSITIONS in reading
    * order, over a text-file frame (one line per row, single ordered
    * source) — the RDD `zipWithIndex` index. Positions are assigned by
    * the distributed partition-offset numbering of
    * [[Relational.withRowIndex]]; the doc_id-postings form above is the
    * canonical one for the table-shaped corpus.
    */
  def invertedIndexPositions(lines: DataFrame,
      maxPostings: Int = 100): DataFrame = {
    val positioned = Relational.withRowIndex(
      lines.select(explode(TextAnalysis.tokens(col("value"))).as("word")),
      "pos")
    val w = Window.partitionBy("word").orderBy(col("pos").asc)
    positioned
      .withColumn("rn", row_number().over(w))
      .groupBy("word")
      .agg(
        array_join(
          transform(
            array_sort(collect_list(
              when(col("rn") <= maxPostings, col("pos")))),
            x => x.cast("string")),
          ",").as("positions"),
        count(lit(1)).as("n_occurrences"))
  }

  def invertedIndex(documents: DataFrame, maxPostings: Int = 100): DataFrame = {
    val pairs = words(documents).select("word", "doc_id").distinct()
    val w = Window.partitionBy("word").orderBy(col("doc_id").asc)
    pairs
      .withColumn("rn", row_number().over(w))
      .groupBy("word")
      .agg(
        // collect_list skips nulls, so only the first maxPostings survive;
        // array_sort restores doc_id order after the unordered collect.
        array_join(
          transform(
            array_sort(collect_list(
              when(col("rn") <= maxPostings, col("doc_id")))),
            x => x.cast("string")),
          ",").as("postings"),
        count(lit(1)).as("n_docs"))
  }

  /** Vocabulary coverage / OOV audit: build the top-`vocabSize` token
    * vocabulary by corpus frequency (ties broken by word asc — a total
    * order, so the vocab is identical on every engine and every run),
    * then report per-source token totals, out-of-vocabulary counts, and
    * the OOV rate. This is the tokenizer-fit check a pipeline runs per
    * source before training: a source whose OOV rate spikes is drawing
    * from a different distribution than the vocabulary was fit on.
    *
    * Plan: one token-count aggregation (map-side partials; the shuffle
    * carries (word, count) pairs, not tokens), a distributed top-k
    * (`TakeOrdered` — no global sort), then a BROADCAST left join of the
    * second token scan against the vocab — the vocab is bounded driver
    * state by construction (vocabSize rows), so the coverage pass adds
    * no shuffle beyond the final per-source rollup.
    */
  def vocabCoverage(documents: DataFrame, vocabSize: Int): DataFrame = {
    require(vocabSize > 0, "vocabCoverage: vocabSize must be positive")
    val counts = wordCount(documents)
    val vocab = counts
      .orderBy(col("cnt").desc, col("word").asc)
      .limit(vocabSize)
      .select(col("word"), lit(1L).as("_in_vocab"))
    Dedup.spread(documents)
      .select(col("source"),
        explode(TextAnalysis.tokens(col("text"))).as("word"))
      .join(broadcast(vocab), Seq("word"), "left_outer")
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_tokens"),
        (count(lit(1)) - count(col("_in_vocab"))).as("n_oov"),
        round((count(lit(1)) - count(col("_in_vocab"))).cast("double") /
          count(lit(1)), 6).as("oov_rate"))
  }

  /** Conjunctive term search over a posting-pair relation `pairs`
    * (word, doc_id): doc ids containing ALL of `terms`. The pair source
    * decides the cost profile — freshly exploded tokens make this a
    * one-shot scan query (the `IN` filter prunes to query-term rows
    * BEFORE the shuffle, so the aggregation sees |terms|·|matching docs|
    * rows, not the corpus); at 100 TB you pass the persisted,
    * word-bucketed posting table instead and the same probe reads only
    * the buckets holding the query terms — build-once/probe-many, the
    * textual twin of the ANN index split (q34/q51).
    */
  def searchIndex(pairs: DataFrame, terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "searchIndex: no query terms")
    val t = terms.distinct
    pairs
      .filter(col("word").isin(t: _*))
      .groupBy("doc_id")
      .agg(countDistinct(col("word")).as("_hits"))
      .filter(col("_hits") === t.length)
      .select("doc_id")
  }

  /** [[searchIndex]] over freshly exploded tokens — the scan-side form. */
  def searchDocuments(documents: DataFrame, terms: Seq[String]): DataFrame =
    searchIndex(words(documents).select("word", "doc_id"), terms)

  /** Fuzzy self-join (record linkage): every unordered pair of DISTINCT
    * `strCol` values within Levenshtein distance `threshold` — the
    * catalog/entity-matching primitive ("smal ring" ⇄ "small ring")
    * that exact joins can't express. Output: (left, right, dist) with
    * left < right; callers re-join ids on the matched values.
    *
    * Never all-pairs: candidates come from Ed-Join-style prefix
    * filtering over positional q-gram BAGS. One edit destroys at most
    * `q` of a string's q-grams, so two strings within distance t share
    * a bag intersection ≥ max(|bags|) − t·q; by the PPJoin prefix lemma
    * (under one global key order), any such pair must collide on one of
    * each side's first t·q+1 keys. Each gram is tagged with its
    * occurrence index — (gram, occ) keys make bag semantics a plain
    * equi-join — and keys are ordered rarest-first (global key
    * frequency, gram/occ as tiebreak), so join keys concentrate on
    * discriminative grams and hot bigrams ("e ", "th") never become
    * join keys: candidate volume is Σ df_prefix², not Σ df². Pairs
    * where the prefix lemma is vacuous (both sides ≤ t·q+q−1 chars, so
    * the guaranteed overlap can hit zero) go to a dedicated
    * length-banded short-string block — a bounded nested-loop over the
    * (tiny, alphabet-bounded) short-value set, not the corpus. A
    * length-band prune (|lenₐ−len_b| ≤ t, necessary for distance ≤ t)
    * cuts both paths before the exact `levenshtein` verify on
    * candidates only — the same generate-prune-verify shape as
    * [[Dedup.exactJaccardPairs]].
    *
    * Choose `q` for the corpus, not by habit: prefix selectivity needs
    * the gram space (alphabet^q) to dwarf the value count, or every key
    * is hot and the prefix join degenerates toward all-pairs. q=2 is
    * right for a dim table of thousands of names; at 10⁵+ values — or a
    * narrow alphabet like hex ids — use q=3..5 (the Ed-Join guidance).
    * Larger q also widens the short-string block (t·q+q−1), which is
    * the right trade: short strings belong in the banded block anyway.
    *
    * `maxPairsPerDoc` (default off): per-key emission cap with loud
    * `n_pairs_total` overflow accounting — see
    * [[graft.operators.Dedup.containmentPairs]] for the rationale.
    */
  def fuzzyPairs(strings: DataFrame, strCol: String, threshold: Int,
      q: Int = 2, maxPairsPerDoc: Option[Int] = None): DataFrame = {
    require(threshold >= 1, "fuzzyPairs: threshold must be >= 1")
    require(q >= 1, "fuzzyPairs: q must be >= 1")
    val withLen = Dedup.spread(strings)
      .select(col(strCol).as("s")).filter(col("s").isNotNull).distinct()
      .select(col("s"), length(col("s")).cast("long").as("len"))
    val shortMax = threshold * q + q - 1
    val grams = withLen.filter(col("len") >= q)
      .select(col("s"), col("len"), posexplode(expr(
        s"transform(sequence(1, length(s) - $q + 1)," +
          s" i -> substring(s, i, $q))")).as(Seq("pos", "g")))
      .withColumn("occ",
        row_number().over(Window.partitionBy("s", "g").orderBy("pos")))
      .select("s", "len", "g", "occ")
    val keyFreq = grams.groupBy("g", "occ").agg(count(lit(1)).as("kf"))
    val prefixes = grams.join(keyFreq, Seq("g", "occ"))
      .withColumn("rk", row_number().over(Window.partitionBy("s")
        .orderBy(col("kf").asc, col("g").asc, col("occ").asc)))
      .filter(col("rk") <= threshold * q + 1)
      .select("s", "len", "g", "occ")
    val gramCands = prefixes
      .select(col("s").as("left"), col("len").as("la"),
        col("g"), col("occ"))
      .join(prefixes.select(col("s").as("right"), col("len").as("lb"),
        col("g"), col("occ")), Seq("g", "occ"))
      .filter(col("left") < col("right"))
      .filter(abs(col("la") - col("lb")) <= threshold)
      .select("left", "right")
    val shorts = withLen.filter(col("len") <= shortMax)
    val shortCands = shorts.select(col("s").as("left"), col("len").as("la"))
      .join(shorts.select(col("s").as("right"), col("len").as("lb")),
        col("left") < col("right") &&
          abs(col("la") - col("lb")) <= threshold)
      .select("left", "right")
    val pairs = gramCands.union(shortCands).distinct()
      .withColumn("dist",
        levenshtein(col("left"), col("right")).cast("long"))
      .filter(col("dist") <= threshold)
    // emission guard for catalog storms (a name matching everything):
    // top-m closest per left key, loud n_pairs_total accounting — the
    // [[Dedup.capPairs]] contract
    Dedup.capPairs(pairs, maxPairsPerDoc, "left",
      Seq(col("dist").asc, col("right").asc))
  }

  /** All-pairs Levenshtein ground truth — TEST ORACLE ONLY; the
    * deliberate cross join documented alongside
    * [[Dedup.bruteForceJaccardPairs]]. [[fuzzyPairs]] is the scalable
    * form.
    */
  def bruteForceFuzzyPairs(strings: DataFrame, strCol: String,
      threshold: Int): DataFrame = {
    val s = strings.select(col(strCol).as("s"))
      .filter(col("s").isNotNull).distinct()
    s.select(col("s").as("left")).crossJoin(s.select(col("s").as("right")))
      .filter(col("left") < col("right"))
      .withColumn("dist",
        levenshtein(col("left"), col("right")).cast("long"))
      .filter(col("dist") <= threshold)
  }

  /** Sliding-window document chunking: token windows of `chunkTokens`
    * every `stride` tokens (overlap = chunkTokens − stride), the chunker
    * every RAG/pretraining pipeline runs before embedding or packing.
    * Chunk starts are 0, stride, 2·stride, … while < n_tokens, so every
    * token lands in ≥1 chunk and the last chunk may be short; empty
    * documents produce no chunks. Pure per-row explode — no shuffle, and
    * the token array is materialized ONCE as a column before the
    * per-chunk slices (expression-duplication rule: a HOF intermediate
    * referenced k times re-evaluates k times unless it is an attribute).
    */
  def chunkDocuments(documents: DataFrame, chunkTokens: Int = 64,
      stride: Int = 48): DataFrame = {
    require(chunkTokens > 0, "chunkTokens must be positive")
    require(stride > 0 && stride <= chunkTokens,
      "stride must be in [1, chunkTokens] so no token is skipped")
    Dedup.spread(documents)
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
      .withColumn("n_toks", size(col("toks")).cast("long"))
      .filter(col("n_toks") > 0)
      .select(
        col("doc_id"), col("toks"), col("n_toks"),
        explode(sequence(lit(0L), floor((col("n_toks") - 1) / stride)))
          .as("chunk_id"))
      .select(
        col("doc_id"),
        col("chunk_id"),
        concat_ws(" ",
          slice(col("toks"), (col("chunk_id") * stride + 1).cast("int"),
            lit(chunkTokens))).as("chunk_text"),
        least(lit(chunkTokens.toLong),
          col("n_toks") - col("chunk_id") * stride).as("n_chunk_tokens"))
  }
}
