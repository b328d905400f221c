package graft

import org.apache.spark.sql.functions._

import graft.operators.Graph

class GraphSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  test("pageRank: hand-computed star graph, mass conserved") {
    // symmetric star: c—l1, c—l2. |V|=3, init 1/3; after one round
    // r(c) = 0.15/3 + 0.85*(1/3 + 1/3), r(l) = 0.15/3 + 0.85*(1/3)/2
    val edges = Seq(
      ("c", "l1"), ("l1", "c"), ("c", "l2"), ("l2", "c")
    ).toDF("src", "dst")
    val r1 = Graph.pageRank(edges, iters = 1).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    r1("c") shouldBe (0.05 + 0.85 * 2.0 / 3.0) +- 1e-8
    r1("l1") shouldBe (0.05 + 0.85 / 6.0) +- 1e-8
    r1("l1") shouldBe r1("l2")
    // symmetric graph: no dangling mass, total rank stays exactly 1
    val r5 = Graph.pageRank(edges, iters = 5).collect()
      .map(_.getDouble(1))
    r5.sum shouldBe 1.0 +- 1e-6
    // the hub keeps outranking the leaves at the fixpoint
    val m5 = Graph.pageRank(edges, iters = 5).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    m5("c") should be > m5("l1")
  }

  test("pageRank: dangling mass evaporates on a one-way edge") {
    val edges = Seq(("a", "b")).toDF("src", "dst")
    val r = Graph.pageRank(edges, iters = 1).collect()
      .map(x => x.getString(0) -> x.getDouble(1)).toMap
    r("a") shouldBe 0.075 +- 1e-9 // base only: (1-0.85)/2
    r("b") shouldBe (0.075 + 0.85 * 0.5) +- 1e-9
  }

  test("hits: hand-computed bipartite round, L1-normalized") {
    // u1→{v1,v2}, u2→{v1}; after 1 round: a = (2/3, 1/3), h = (0.6, 0.4)
    val edges = Seq(("u1", "v1"), ("u1", "v2"), ("u2", "v1"))
      .toDF("src", "dst")
    val r = Graph.hits(edges, iters = 1).collect()
      .map(x => (x.getString(0), x.getString(1)) -> x.getDouble(2)).toMap
    r(("v1", "auth")) shouldBe 2.0 / 3 +- 1e-6
    r(("v2", "auth")) shouldBe 1.0 / 3 +- 1e-6
    r(("u1", "hub")) shouldBe 0.6 +- 1e-6
    r(("u2", "hub")) shouldBe 0.4 +- 1e-6
    // both vectors stay L1-normalized after more rounds
    val r5 = Graph.hits(edges, iters = 5).collect()
    r5.filter(_.getString(1) == "hub").map(_.getDouble(2)).sum shouldBe
      1.0 +- 1e-6
    r5.filter(_.getString(1) == "auth").map(_.getDouble(2)).sum shouldBe
      1.0 +- 1e-6
  }

  test("hits: partitioning-independent, exact equality") {
    val edges = (1L to 300L).map { i =>
      (s"u${i % 40}", s"v${i % 23}")
    }.distinct.toDF("src", "dst")
    val one = Graph.hits(edges.coalesce(1), iters = 3).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val many = Graph.hits(edges.repartition(7), iters = 3).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    one shouldBe many
    an[IllegalArgumentException] should be thrownBy
      Graph.hits(edges, iters = 0)
  }

  test("degreeHistogram: out and in sides, hand-computed") {
    val edges = Seq(("u1", "v1"), ("u1", "v2"), ("u2", "v1"))
      .toDF("src", "dst")
    val out = Graph.degreeHistogram(edges).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    out shouldBe Map(
      ("out", 1L) -> 1L, ("out", 2L) -> 1L, // u2 has 1 edge, u1 has 2
      ("in", 1L) -> 1L, ("in", 2L) -> 1L)   // v2 has 1 edge, v1 has 2
  }

  test("pageRank: partitioning-independent (decimal contribution sums)") {
    val edges = (1L to 200L).flatMap { i =>
      val hub = s"h${i % 3}"
      Seq((s"n$i", hub), (hub, s"n$i"))
    }.toDF("src", "dst")
    val one = Graph.pageRank(edges.coalesce(1), iters = 3)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val many = Graph.pageRank(edges.repartition(7), iters = 3)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    one shouldBe many // exact equality, not tolerance
    an[IllegalArgumentException] should be thrownBy
      Graph.pageRank(edges, iters = 0)
    an[IllegalArgumentException] should be thrownBy
      Graph.pageRank(edges, damping = 1.0)
  }
}
