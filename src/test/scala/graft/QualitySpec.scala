package graft

import org.apache.spark.sql.functions._
import graft.operators.Quality

/** Semantics of the data-contract audit operators on hand-built frames:
  * null accounting, exact distinct counts, FK-orphan detection, and the
  * SQL convention that null child keys are not violations.
  */
class QualitySpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  test("association: hand-computed 2x2 chi-square and Cramér's V") {
    // O = [[30,10],[10,30]], all marginals 40, N=80, E=20 per cell:
    // chi2 = 4 * (10^2/20) = 20, dof = 1, V = sqrt(20/80) = 0.5
    val rows =
      Seq.fill(30)(("A", "x")) ++ Seq.fill(10)(("A", "y")) ++
      Seq.fill(10)(("B", "x")) ++ Seq.fill(30)(("B", "y"))
    val out = Quality.association(rows.toDF("r", "c"), "r", "c").collect()
    out.length shouldBe 1
    val h = out.head
    h.getLong(0) shouldBe 80L  // n
    h.getLong(1) shouldBe 2L   // n_rows
    h.getLong(2) shouldBe 2L   // n_cols
    h.getLong(3) shouldBe 1L   // dof
    h.getDouble(4) shouldBe 20.0 +- 1e-6
    h.getDouble(5) shouldBe 0.5 +- 1e-6
  }

  test("association: independent columns score zero, 1-level column null V") {
    val indep =
      Seq.fill(20)(("A", "x")) ++ Seq.fill(20)(("A", "y")) ++
      Seq.fill(10)(("B", "x")) ++ Seq.fill(10)(("B", "y"))
    val h = Quality.association(indep.toDF("r", "c"), "r", "c").head()
    h.getDouble(4) shouldBe 0.0 +- 1e-9 // clamped, never a tiny negative
    h.getDouble(5) shouldBe 0.0 +- 1e-9
    val one = Seq(("A", "x"), ("A", "y")).toDF("r", "c")
    val h1 = Quality.association(one, "r", "c").head()
    h1.getLong(3) shouldBe 0L // dof (1-1)*(2-1)
    h1.isNullAt(5) shouldBe true // Cramér's V undefined
  }

  test("profileColumns counts rows/nulls/distincts per column in one pass") {
    val df = Seq(
      (Some(1L), Some("a")), (Some(1L), None),
      (Some(2L), Some("b")), (None, Some("b"))
    ).toDF("k", "s")
    val out = Quality.profileColumns(df, Seq("k", "s"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5))).toMap
    out shouldBe Map(
      "k" -> ((4L, 1L, 2L, "1", "2")),
      "s" -> ((4L, 1L, 2L, "a", "b")))
  }

  test("profileColumns audits all columns in one scan, two exchanges") {
    val plan = Quality.profileColumns(tables.orders,
      Seq("o_orderkey", "o_orderstatus", "o_orderpriority"))
      .queryExecution.executedPlan.toString
    // explode → partial agg → exchange on (column_name, v) → dedup →
    // exchange on column_name over the already-collapsed partials. The
    // first exchange spreading on the VALUE is the scale property: one
    // exchange on column_name alone would put each column's whole value
    // set on a single reducer. No Expand, no per-column re-scan.
    "Exchange".r.findAllIn(plan).size shouldBe 2
    plan should not include "Expand"
    "Scan parquet".r.findAllIn(plan).size shouldBe 1
  }

  test("fkViolations finds orphans; null child keys are not violations") {
    val child = Seq(
      (Some(1L), "r1"), (Some(9L), "r2"), (Some(9L), "r3"),
      (None, "r4") // null FK: excluded by SQL FK semantics
    ).toDF("fk", "payload")
    val parent = Seq(1L, 2L).toDF("pk")
    val clean = Seq(1L, 9L).toDF("pk")
    val out = Quality.fkViolations(Seq(
      ("child_fk", child, "fk", parent, "pk"),
      ("child_fk_clean", child, "fk", clean, "pk")))
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Long]))).toMap
    out shouldBe Map(
      "child_fk" -> ((2L, Some(9L))),
      "child_fk_clean" -> ((0L, None)))
  }
}
