package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The word-count family (SURVEY §2.4 A1/A5/A6/A7) over the `documents`
  * table. Tokenization is `explode(split(...))` — the Generator path that
  * replaces MR/RDD flatMap (`WordCount.java:25-32`,
  * `301-solutions.scala:11`). All aggregations get map-side partial
  * aggregation; the shuffle moves (token, partial-count) pairs, which for a
  * natural-language corpus is vastly smaller than the input.
  */
object TextOps {

  /** Tokens per document row, empty tokens dropped. */
  private def words(documents: DataFrame) =
    documents.select(
      col("doc_id"),
      explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")

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
        round(avg(length(col("word"))), 4).as("avg_len"),
        count(lit(1)).as("cnt"))

  /** A6/A7: inverted index — word → sorted distinct posting list
    * (`Ex4InvertedIndex.java:23-45`). Posting lists are rendered as a CSV
    * string for a stable cross-engine representation. collect_set is a
    * partial-aggregating set union; at web scale you would cap posting-list
    * length or switch to a positional index, noted here.
    */
  def invertedIndex(documents: DataFrame): DataFrame =
    words(documents)
      .groupBy("word")
      .agg(
        array_join(
          transform(sort_array(collect_set(col("doc_id"))),
            x => x.cast("string")),
          ",").as("postings"),
        countDistinct(col("doc_id")).as("n_docs"))
}
