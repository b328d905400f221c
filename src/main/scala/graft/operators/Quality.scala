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

  /** Categorical-association audit: Pearson chi-square independence test
    * plus Cramér's V between two categorical columns (lang × source,
    * label × shard, …). The drift check behind "is this attribute
    * independent of that one?" — V near 0 says the split/label is
    * balanced across the other axis; V near 1 says one determines the
    * other (a leakage or collection-bias smell).
    *
    * Zero-cell-free formulation: χ² = N·Σ_observed O²/(R·C) − N, which
    * sums only the OBSERVED contingency cells (the algebraic collapse of
    * the all-cells Σ(O−E)²/E, including its zero cells) — so sparse
    * high-cardinality tables never materialize r×c. Per-cell terms are
    * quantized to DECIMAL(30,12) and summed exactly (the engine- and
    * partitioning-independence convention); the final sqrt is IEEE
    * correctly-rounded, so V is deterministic too. One groupBy over the
    * pair, two marginal re-aggregations of that (already tiny) cell
    * table, one scalar output row.
    */
  def association(df: DataFrame, rowCol: String, colCol: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val cells = df.groupBy(rowCol, colCol).agg(count(lit(1)).as("o"))
    val rt = cells.groupBy(rowCol).agg(sum("o").as("rt"))
    val ct = cells.groupBy(colCol).agg(sum("o").as("ct"))
    val totals = cells.agg(
      sum("o").as("n"),
      countDistinct(col(rowCol)).as("r"),
      countDistinct(col(colCol)).as("c"))
    val terms = cells
      .join(broadcast(rt), rowCol).join(broadcast(ct), colCol)
      .select(((col("o").cast("double") * col("o").cast("double")) /
        (col("rt").cast("double") * col("ct").cast("double")))
        .cast(DecimalType(30, 12)).as("t"))
      .agg(sum("t").as("s"))
    val nD = col("n").cast("double")
    // exact independence makes N·S − N a tiny negative float; clamp so
    // sqrt never sees it (both engines, identically)
    val chi2 = greatest(nD * col("s").cast("double") - nD, lit(0.0))
    val minDim = least(col("r") - 1, col("c") - 1)
    terms.crossJoin(totals).select(
      col("n"),
      col("r").as("n_rows"),
      col("c").as("n_cols"),
      ((col("r") - 1) * (col("c") - 1)).as("dof"),
      round(chi2, 6).as("chi2"),
      when(minDim > 0,
        round(sqrt(chi2 / (nD * minDim.cast("double"))), 6))
        .as("cramers_v"))
  }
}
