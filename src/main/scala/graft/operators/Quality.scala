package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-contract auditing: the validation pass a pipeline runs over every
  * ingested table before trusting it downstream — per-column profiles
  * (null/distinct/extrema) and referential-integrity violation reports.
  * The reference corpus validates nothing (its exercises assume clean
  * inputs); at 100 TB ingest-time validation is what keeps one bad crawl
  * partition from poisoning a training run.
  */
object Quality {

  /** Long-format single-pass column profile: one output row per audited
    * column with row/null/distinct counts and lexicographic min/max of
    * the string-cast values (a type-agnostic profile — numeric extrema
    * belong to typed stats like [[Relational.groupStats]]).
    *
    * Plan shape: explode an array-of-structs projection (rows×cols
    * intermediate — the price of computing EVERY column's exact distinct
    * count in ONE scan, instead of Spark's Expand-based multi-distinct
    * which multiplies the input the same way but re-aggregates per
    * column). Two exchanges, both deliberate: the distinct pre-agg
    * shuffles on (column_name, value) — spread across all reducers, with
    * map-side partial aggregation collapsing duplicates first — then the
    * per-column rollup shuffles the already-tiny partials on
    * column_name. Keying the FIRST shuffle on column_name alone would
    * save an exchange but send each column's entire value set to a
    * single reducer — the skew that kills this at 100 TB.
    */
  def profileColumns(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profileColumns: no columns to audit")
    df.select(explode(array(cols.map(c =>
        struct(lit(c).as("column_name"), col(c).cast("string").as("v"))): _*))
        .as("cell"))
      .select(col("cell.column_name").as("column_name"), col("cell.v").as("v"))
      .groupBy("column_name")
      .agg(
        count(lit(1)).as("n_rows"),
        (count(lit(1)) - count(col("v"))).as("n_null"),
        countDistinct(col("v")).as("n_distinct"),
        min(col("v")).as("min_str"),
        max(col("v")).as("max_str"))
  }

  /** Referential-integrity audit: for each named (child, childKey,
    * parent, parentKey) constraint, the number of child rows whose
    * non-null key has no parent, plus the smallest orphaned key as a
    * debugging sample. Null child keys are not violations (SQL FK
    * semantics).
    *
    * Each constraint is one left-anti join against the parent's
    * projected key column — column-pruned to a single column at the
    * scan, so a "parent" of any width costs its key bytes; small parents
    * broadcast (AQE decides from the pruned size, not the table size).
    * Constraint reports are unioned — independent jobs, no cross-
    * constraint shuffle.
    */
  def fkViolations(
      constraints: Seq[(String, DataFrame, String, DataFrame, String)])
      : DataFrame = {
    require(constraints.nonEmpty, "fkViolations: no constraints")
    constraints.map { case (name, child, childKey, parent, parentKey) =>
      child.select(col(childKey).as("_k"))
        .filter(col("_k").isNotNull)
        .join(parent.select(col(parentKey).as("_k")), Seq("_k"), "left_anti")
        .agg(
          count(lit(1)).as("n_violations"),
          min(col("_k").cast("long")).as("sample_key"))
        .select(lit(name).as("constraint_name"), col("n_violations"),
          col("sample_key"))
    }.reduce(_ unionByName _)
  }
}
