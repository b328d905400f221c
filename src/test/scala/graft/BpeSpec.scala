package graft

import org.apache.spark.sql.functions._
import graft.operators.Bpe
import graft.operators.Bpe.Merge

class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Reference BPE apply over explicit token lists: rank order, each
    * merge exhaustively, all-occurrences leftmost-greedy — the textbook
    * semantics the padded-string replace chain must reproduce.
    */
  private def refApply(word: String, merges: Seq[Merge]): Seq[String] = {
    var toks: List[String] = word.map(_.toString).toList
    merges.sortBy(_.rank).foreach { m =>
      val out = scala.collection.mutable.ListBuffer[String]()
      var i = 0
      while (i < toks.length) {
        if (i + 1 < toks.length && toks(i) == m.lhs && toks(i + 1) == m.rhs) {
          out += m.lhs + m.rhs; i += 2
        } else { out += toks(i); i += 1 }
      }
      toks = out.toList
    }
    toks
  }

  test("padded-replace apply equals reference BPE on pathological runs") {
    val merges = Seq(Merge(1, "a", "a"), Merge(2, "aa", "aa"),
      Merge(3, "aa", "b"), Merge(4, "b", "a"))
    val words = (1 to 8).map("a" * _) ++
      Seq("aab", "abab", "baaa", "aabaa", "bbbaab", "ababab", "aaabaaab")
    val got = words.toDF("word")
      .select(col("word"), Bpe.tokens(col("word"), merges).as("toks"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    words.foreach { w =>
      got(w) shouldBe refApply(w, merges)
    }
  }

  test("training matches the textbook example, any partitioning") {
    // Sennrich's worked example: low x5, lower x2, newest x6, widest x3
    // round 1: (e,s) and (s,t) tie at 9 -> lex tie-break picks (e,s)
    val words = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val expected = Seq(Merge(1, "e", "s"), Merge(2, "es", "t"),
      Merge(3, "l", "o"), Merge(4, "lo", "w"))
    Seq(1, 7).foreach { parts =>
      val docs = words.toDF("text").repartition(parts)
      // default = driver-local fast path; localMaxWords = 0 forces the
      // distributed loop — both must produce the textbook merges
      Bpe.trainMerges(docs, numMerges = 4) shouldBe expected
      Bpe.trainMerges(docs, numMerges = 4,
        localMaxWords = 0) shouldBe expected
    }
  }

  test("packedSequences: bins reassemble the EOS-separated corpus stream") {
    val docs = tables.documents.filter(col("doc_id") < 200)
    val merges = Bpe.trainMerges(docs, numMerges = 6)
    val enc = Bpe.encodeDocs(docs, merges).orderBy("doc_id")
      .select("doc_id", "ids").as[(Long, Seq[Long])].collect()
    // bins are assigned by a doc_id-ordered prefix sum, so concatenating
    // bins in bin order must reproduce the whole corpus stream: every
    // doc's ids, doc order, one EOS (id 0) after each
    val expected = enc.flatMap { case (_, ids) => ids :+ 0L }.toSeq
    val packed = Bpe.packedSequences(docs, merges, budgetTokens = 64)
      .orderBy("bin_id").collect()
    packed.flatMap(r =>
      r.getSeq[Long](r.fieldIndex("input_ids"))).toSeq shouldBe expected
    packed.foreach { r =>
      r.getAs[Long]("n_tokens") shouldBe
        r.getSeq[Long](r.fieldIndex("input_ids")).size.toLong
      // the attention-boundary record: per-doc EOS-inclusive lengths
      // partition the bin's sequence exactly
      r.getSeq[Long](r.fieldIndex("doc_lens")).sum shouldBe
        r.getAs[Long]("n_tokens")
      r.getSeq[Long](r.fieldIndex("doc_lens")).size.toLong shouldBe
        r.getAs[Long]("n_docs")
    }
    packed.map(_.getAs[Long]("n_docs")).sum shouldBe enc.length.toLong
  }

  test("chunkEncoded: chunks bounded and reassemble exactly; compose bounds the pack") {
    val docs = tables.documents.filter(col("doc_id") < 200)
    val merges = Bpe.trainMerges(docs, numMerges = 6)
    val enc = Bpe.encodeDocs(docs, merges)
    val encMap = enc.collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](r.fieldIndex("ids"))).toMap
    val ch = Bpe.chunkEncoded(enc, maxTokens = 16)
    val byDoc = ch.collect().groupBy(_.getLong(0))
    byDoc.keySet shouldBe encMap.keySet // empty encodings keep their row
    byDoc.foreach { case (id, rows) =>
      rows.foreach(r =>
        r.getSeq[Long](r.fieldIndex("ids")).size should be <= 16)
      rows.sortBy(_.getInt(1))
        .flatMap(r => r.getSeq[Long](r.fieldIndex("ids")))
        .toSeq shouldBe encMap(id)
    }
    // the point of the pre-pass: after chunking, every pack unit is
    // <= maxTokens, so no bin overshoots its budget by more than one
    // chunk (the packer alone lets one giant doc blow a bin wide open)
    val rekeyed = ch.select(
      (col("doc_id") * 1000 + col("chunk_idx")).as("doc_id"),
      col("ids"), col("n_tokens"))
    Bpe.packedSequencesFrom(rekeyed, budgetTokens = 64)
      .collect().foreach(r =>
        r.getAs[Long]("n_tokens") should be <= (64L + 17L))
  }

  test("encoded table: export from the persisted encoding equals direct; wrong tokenizer is loud") {
    val docs = tables.documents.filter(col("doc_id") < 200)
    Seq("bpe_m_enc", "bpe_m_enc__spec", "bpe_m_enc2", "bpe_m_enc2__spec",
      "bpe_enc_tbl", "bpe_enc_tbl__spec")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    val merges = Bpe.buildMergesTable(docs, "bpe_m_enc", numMerges = 6)
    Bpe.buildEncodedTable(docs, "bpe_m_enc", "bpe_enc_tbl")
    val fromTable = Bpe.packedSequencesFrom(
      Bpe.readEncodedTable(spark, "bpe_enc_tbl", "bpe_m_enc"),
      budgetTokens = 64).orderBy("bin_id").collect()
    val direct = Bpe.packedSequences(docs, merges, budgetTokens = 64)
      .orderBy("bin_id").collect()
    fromTable.toSeq shouldBe direct.toSeq
    // exporting against a DIFFERENT tokenizer's merges table would mix
    // id spaces — must throw, never silently re-rank
    Bpe.buildMergesTable(docs, "bpe_m_enc2", numMerges = 4)
    an[IllegalArgumentException] should be thrownBy
      Bpe.readEncodedTable(spark, "bpe_enc_tbl", "bpe_m_enc2")
    // a RETRAINED tokenizer under the SAME table name is the sneakier
    // id-space mix — the digest in the spec catches it
    Bpe.buildMergesTable(docs.filter(col("doc_id") < 100), "bpe_m_enc",
      numMerges = 6)
    an[IllegalArgumentException] should be thrownBy
      Bpe.readEncodedTable(spark, "bpe_enc_tbl", "bpe_m_enc")
  }

  test("local fast-path merges equal the distributed loop's on the corpus") {
    val docs = tables.documents
    val local = Bpe.trainMerges(docs, numMerges = 24)
    val dist = Bpe.trainMerges(docs, numMerges = 24, localMaxWords = 0)
    local shouldBe dist
    local should have size 24
  }

  test("tokens concatenate back to the word (merges never lose chars)") {
    val docs = tables.documents
    val merges = Bpe.trainMerges(docs, numMerges = 6)
    merges should have size 6
    val bad = Bpe.wordVocab(docs)
      .select(col("word"), Bpe.tokens(col("word"), merges).as("toks"))
      .where(concat_ws("", col("toks")) =!= col("word"))
      .count()
    bad shouldBe 0L
  }

  test("early stop when the vocabulary is fully merged") {
    val docs = Seq("ab ab ab").toDF("text")
    // "ab" fully merges in one round; further rounds find no pairs
    Bpe.trainMerges(docs, numMerges = 5) shouldBe Seq(Merge(1, "a", "b"))
  }

  test("persisted merges round-trip; missing spec fails loudly") {
    val tbl = s"bpe_spec_test_${System.nanoTime()}"
    val docs = tables.documents
    val trained = Bpe.buildMergesTable(docs, tbl, numMerges = 5)
    Bpe.loadMerges(spark, tbl) shouldBe trained
    // half-built index (spec lost): probe must throw, never default
    spark.sql(s"DROP TABLE ${graft.sources.IndexSpec.specTable(tbl)}")
    an[IllegalStateException] should be thrownBy Bpe.loadMerges(spark, tbl)
  }

  test("token accounting: bounded by chars, at least one per word") {
    val docs = tables.documents
    val merges = Bpe.trainMerges(docs, numMerges = 8)
    val stats = Bpe.tokenStatsByLang(docs, merges).collect()
    stats.length should be > 0
    val words = Bpe.wordVocab(docs)
      .agg(sum(col("freq")).as("n"),
        sum(expr("freq * length(word)")).as("chars"))
      .head()
    val totalTokens = stats.map(_.getAs[Long]("sum_tokens")).sum
    totalTokens should be >= words.getAs[Long]("n") // >= one per word
    totalTokens should be < words.getAs[Long]("chars") // merges bite
  }

  test("encodeDocs: ids decode back to the document's token sequence") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "The mat the cat!"),
      (3L, "12345 --- !!!")  // no [a-z]+ words -> empty encoding
    ).toDF("doc_id", "text")
    val merges = Bpe.trainMerges(docs, numMerges = 4)
    val enc = Bpe.encodeDocs(docs, merges)
      .orderBy("doc_id")
      .as[(Long, Seq[Long], Long)].collect().toSeq
    // decode via the id table and compare against a driver-side
    // word-by-word application of the merge list
    val id2tok = Bpe.tokenIds(docs, merges)
      .as[(String, Long)].collect().map(_.swap).toMap
    def expectedTokens(text: String): Seq[String] =
      "[a-z]+".r.findAllIn(text.toLowerCase).toSeq
        .flatMap(w => refApply(w, merges))
    enc.foreach { case (docId, ids, n) =>
      n shouldBe ids.length.toLong
      val text = Map(1L -> "the cat sat on the mat",
        2L -> "The mat the cat!", 3L -> "12345 --- !!!")(docId)
      ids.map(id2tok) shouldBe expectedTokens(text)
    }
    enc.find(_._1 == 3L).get._2 shouldBe empty
    // hot tokens get small ids: id 1 is the most frequent token
    val counts = Bpe.wordVocab(docs)
      .select(explode(Bpe.tokens(col("word"), merges)).as("t"), col("freq"))
      .groupBy("t").agg(sum("freq").as("c"))
      .as[(String, Long)].collect().toMap
    counts(id2tok(1L)) shouldBe counts.values.max
  }

  test("docTokenCounts agrees with the encoding path; wordless docs count 0") {
    val docs = tables.documents.filter(col("doc_id") < 200)
      .select("doc_id", "text")
      .union(Seq((9901L, "12345 --- !!!")).toDF("doc_id", "text"))
    val merges = Bpe.trainMerges(docs, numMerges = 4)
    // the count path (per-word sums) and the encoding path (id-sequence
    // lengths) are independent implementations of the same number
    rowSet(Bpe.docTokenCounts(docs, merges)) shouldBe
      rowSet(Bpe.encodeDocs(docs, merges).select("doc_id", "n_tokens"))
    Bpe.docTokenCounts(docs, merges).filter(col("doc_id") === 9901L)
      .select("n_tokens").as[Long].head() shouldBe 0L
  }

  test("vocab report conserves corpus token mass") {
    val docs = tables.documents
    val merges = Bpe.trainMerges(docs, numMerges = 4)
    // over the FULL vocabulary (no topN cut), token mass == corpus tokens
    val full = Bpe.wordVocab(docs)
      .select(explode(Bpe.tokens(col("word"), merges)).as("token"),
        col("freq"))
      .agg(sum("freq")).head().getLong(0)
    val direct = Bpe.wordVocab(docs)
      .agg(sum(Bpe.tokenCount(col("word"), merges).cast("long") *
        col("freq"))).head().getLong(0)
    full shouldBe direct
  }

  test("mergesDigest separates fields: (1,ab,c) vs (1,a,bc) differ") {
    // without the  field separators both lists would serialize to
    // "1abc" and the retrained-tokenizer guard in readEncodedTable could
    // pass two different merge lists as identical
    val a = Seq(Bpe.Merge(1, "ab", "c"))
    val b = Seq(Bpe.Merge(1, "a", "bc"))
    Bpe.mergesDigest(a) should not be Bpe.mergesDigest(b)
    // rank/field boundary: both would serialize to "12ab" unseparated
    val c = Seq(Bpe.Merge(12, "a", "b"))
    val d = Seq(Bpe.Merge(1, "2a", "b"))
    Bpe.mergesDigest(c) should not be Bpe.mergesDigest(d)
  }
}
