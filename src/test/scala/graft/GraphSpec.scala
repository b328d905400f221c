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

  test("triangleCounts equals the brute-force triple enumeration") {
    // deterministic pseudo-random graph with a genuine hub (node 0
    // links everything — the degree-orientation stress case), plus
    // duplicates, reversed edges, and self-loops to exercise
    // canonicalization
    val raw = (1L to 40L).map(i => (0L, i)) ++
      (1L to 40L).flatMap(i => (i + 1 to 40L).filter(j =>
        (i * 31 + j * 17) % 5 == 0).map(j => (i, j)))
    val edges = (raw ++ raw.map(_.swap) ++ raw.take(10) ++
      Seq((7L, 7L))).toDF("src", "dst")
    val got = Graph.triangleCounts(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // brute force: canonical pair set, then all closed triples
    val und = raw.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter { case (a, b) => a != b }.toSet
    val nodes = und.flatMap { case (a, b) => Seq(a, b) }.toSeq.sorted
    val expected = nodes.map { n =>
      n -> nodes.combinations(2).count { case Seq(x, y) =>
        val tri = Seq(n, x, y).sorted
        tri.distinct.size == 3 &&
          tri.combinations(2).forall { case Seq(p, q) => und((p, q)) }
      }.toLong
    }.toMap
    expected.values.sum should be > 0L // the graph really has triangles
    got shouldBe expected
    // every node appears, triangle-free ones at zero
    got.keySet shouldBe nodes.toSet
  }

  test("degree orientation bounds hub wedge fan-out mechanically") {
    // the scaladoc's O(√m) claim, asserted rather than argued: on a
    // 1000-degree hub with a spoke ring, the UNORIENTED wedge count is
    // dominated by C(hubDeg, 2) while the oriented count — wedges at
    // each node's C(outdeg, 2) under the operator's (degree, id) rank —
    // collapses, because the hub (max degree) ranks above all its
    // neighbors and gets out-degree ~0. The 20x Stress twin measures
    // the same ratio at hubDeg 30,000: 450M naive vs 100k oriented
    // wedges, 38.3 s vs 7.8 s wall (graft.Stress hubTriangles*).
    import SparkSpec.spark.implicits._
    val edges = ((1L to 1000L).map(i => (0L, i)) ++
      (1L to 999L).map(i => (i, i + 1))).toDF("src", "dst")
    val und = edges.select(least(col("src"), col("dst")).as("a"),
      greatest(col("src"), col("dst")).as("b")).distinct()
    val deg = und.select(col("a").as("node"))
      .union(und.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    def wedgeSum(d: org.apache.spark.sql.DataFrame, c: String) =
      d.agg(sum((col(c) * (col(c) - 1) / 2).cast("long")))
        .head().getLong(0)
    val naive = wedgeSum(deg, "deg")
    val orientedOut = und
      .join(deg.select(col("node").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("node").as("b"), col("deg").as("db")), "b")
      .select(when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")), col("a"))
        .otherwise(col("b")).as("u"))
      .groupBy("u").agg(count(lit(1)).as("od"))
    val oriented = wedgeSum(orientedOut, "od")
    naive should be >= 499500L // C(1000, 2) from the hub alone
    oriented should be < naive / 100
    // and the operator still answers exactly on this graph: each ring
    // edge (i, i+1) closes one triangle with the hub
    val tri = Graph.triangleCounts(edges)
      .agg(sum("triangles")).head().getLong(0)
    tri shouldBe 3L * 999L // 999 triangles, counted at 3 corners each
  }

  test("labelPropagation: disjoint cliques converge to per-clique min label") {
    // two 5-cliques + a 3-chain; within a clique every node sees every
    // label equally often after round 1, so the min-label tie-break
    // drives each clique to its smallest member
    def clique(ids: Seq[Long]) =
      ids.combinations(2).map { case Seq(a, b) => (a, b) }.toSeq
    // self-loops must be dropped in BOTH union branches: (5,5) must not
    // bias node 5's neighbor histogram, and a node with ONLY self-loops
    // (30,30) must not appear in the output at all
    val edges = (clique(Seq(1L, 2L, 3L, 4L, 5L)) ++
      clique(Seq(10L, 11L, 12L, 13L, 14L)) ++
      Seq((20L, 21L), (21L, 22L), (5L, 5L), (30L, 30L))).toDF("src", "dst")
    val labels = Graph.labelPropagation(edges, iters = 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    labels.keySet should not contain 30L
    Seq(1L, 2L, 3L, 4L, 5L).foreach(n => labels(n) shouldBe 1L)
    Seq(10L, 11L, 12L, 13L, 14L).foreach(n => labels(n) shouldBe 10L)
    // deterministic: a rerun with different partitioning is identical
    val again = Graph.labelPropagation(edges.repartition(7), iters = 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    again shouldBe labels
    an[IllegalArgumentException] should be thrownBy
      Graph.labelPropagation(edges, iters = 0)
  }
}
