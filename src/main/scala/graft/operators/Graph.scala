package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Graph operators over plain edge-list DataFrames (src, dst) — no graph
  * library, no driver-side adjacency: every step is a keyed join or
  * aggregate, so the shapes are the ones that survive a billion-edge
  * graph (link graphs for crawl ranking, citation graphs for source
  * weighting).
  */
object Graph {

  /** PageRank over a directed edge list: iterative power method,
    * r'(v) = (1−d)/|V| + d·Σ_{u→v} r(u)/outdeg(u), run for a FIXED
    * `iters` rounds (fixed rounds keep the result deterministic and
    * oracle-replayable; convergence-epsilon stopping would tie the
    * output to float noise). Multi-edges act as weights; callers wanting
    * set semantics pass a distinct edge list. Dangling nodes (no
    * out-edges) simply evaporate their mass — symmetrized edge lists
    * (the usual analytics derivation) have none, and then total rank
    * stays exactly 1.
    *
    * Scale shape, mirroring [[Dedup.dupComponents]]: the edge list and
    * its out-degrees are materialized ONCE (they are re-joined every
    * round; upstream they are typically a join over the fact tables),
    * and each round is one edges⋈ranks join + one aggregate, re-keyed by
    * destination, materialized to truncate lineage — localCheckpoint by
    * default, parquet rounds under `checkpointDir` for the
    * executor-loss-safe 100-TB form. Per-edge contributions are
    * quantized to DECIMAL(30,12) and summed exactly, so every round —
    * and therefore the fixpoint trajectory — is independent of
    * partitioning and summation order (the k-means/sourceShift
    * determinism convention; double sums are order-sensitive inside an
    * iteration and the error would compound across rounds).
    */
  def pageRank(edges: DataFrame, iters: Int = 5, damping: Double = 0.85,
      checkpointDir: Option[String] = None): DataFrame = {
    require(iters > 0, "pageRank: iters must be positive")
    require(damping > 0 && damping < 1,
      s"pageRank: damping must be in (0,1), got $damping")
    val materialize = graft.core.Rounds.materializer(checkpointDir)
    val e = materialize(edges.select("src", "dst"), "pr_edges")
    val deg = e.groupBy("src").agg(count(lit(1)).as("od"))
    val withDeg = materialize(e.join(deg, "src"), "pr_edges_deg")
    val nodes = materialize(
      e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node"))).distinct(), "pr_nodes")
    val nV = nodes.count() // bounded driver state: one long
    require(nV > 0, "pageRank: empty edge list")
    // Detected ONCE upfront: when every node receives an in-edge (true
    // for any symmetrized edge list — the usual analytics derivation),
    // the per-round contribution aggregate already covers the full node
    // set and the per-round nodes left-outer join is a no-op — skip it,
    // saving one join per round. Nodes without in-edges only exist
    // otherwise, and only then is the left-outer needed to hand them
    // their base mass.
    val allReceive = e.select("dst").distinct().count() == nV
    val base = (1 - damping) / nV
    var ranks = nodes.withColumn("rank", lit(1.0 / nV))
    (1 to iters).foreach { i =>
      val contribs = withDeg
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"),
          (col("rank") / col("od").cast("double"))
            .cast(DecimalType(30, 12)).as("c"))
        .groupBy("node").agg(sum("c").as("m"))
      val next =
        if (allReceive)
          contribs.select(col("node"),
            (lit(base) + lit(damping) * col("m").cast("double")).as("rank"))
        else
          nodes.join(contribs, Seq("node"), "left_outer")
            .select(col("node"),
              (lit(base) + lit(damping) *
                coalesce(col("m").cast("double"), lit(0.0))).as("rank"))
      ranks = materialize(next, s"pr_round_$i")
    }
    ranks.select(col("node"), round(col("rank"), 8).as("rank"))
  }

  /** HITS hubs-and-authorities over a directed edge list, `iters` full
    * mutual-reinforcement rounds with L1 normalization: authority(v) =
    * Σ_{u→v} hub(u), hub(u) = Σ_{u→v} authority(v), each vector rescaled
    * to sum 1 after its update. On a bipartite graph (buyer→vendor,
    * page→cited-source) this separates the two roles PageRank blends:
    * hubs are prolific pointers, authorities are heavily-pointed-at
    * sinks. Output is one row per scored node: (node, kind∈{hub,auth},
    * score) — nodes with no out-edges get no hub row (they reinforce
    * nothing), mirroring no-in-edge nodes and auth rows.
    *
    * L1 (not the textbook L2) normalization keeps every operation
    * rational: per-edge contributions are quantized to DECIMAL(30,12)
    * and summed exactly, the normalizer is an exact decimal total, and
    * the one division per node is IEEE — so the whole trajectory is
    * partitioning- and engine-independent, same convention as
    * [[pageRank]]. Same materialization scheme too: edges once, each
    * half-round truncated (localCheckpoint, or parquet rounds under
    * `checkpointDir`).
    */
  def hits(edges: DataFrame, iters: Int = 5,
      checkpointDir: Option[String] = None): DataFrame = {
    require(iters > 0, "hits: iters must be positive")
    val materialize = graft.core.Rounds.materializer(checkpointDir)
    val e = materialize(edges.select("src", "dst"), "hits_edges")
    // Materialize the RAW aggregate, then normalize over the buffer: the
    // previous form (crossJoin(broadcast(total)) over the un-materialized
    // aggregate) executed the edges⋈scores join + aggregate TWICE per
    // half-round — once to compute the broadcast total, once for the main
    // side. The L1 total is one scalar (bounded driver state), read off
    // the materialized per-node raws in a cheap local scan; the division
    // is a pure projection over the same buffer, so downstream re-reads
    // cost nothing. Exact-decimal total → identical trajectory.
    def normalized(raw0: DataFrame, name: String): DataFrame = {
      val raw = materialize(raw0, name)
      val tot = Option(raw.agg(sum("raw")).head().getDecimal(0))
        .getOrElse(java.math.BigDecimal.ZERO)
      raw.select(col("node"),
        (col("raw").cast("double") / lit(tot).cast("double")).as("score"))
    }
    var hubs = e.select(col("src").as("node")).distinct()
      .withColumn("score", lit(1.0))
    var auths: DataFrame = null
    (1 to iters).foreach { i =>
      auths = normalized(
        e.join(hubs.withColumnRenamed("node", "src"), "src")
          .groupBy(col("dst").as("node"))
          .agg(sum(col("score").cast(DecimalType(30, 12))).as("raw")),
        s"hits_a_$i")
      hubs = normalized(
        e.join(auths.withColumnRenamed("node", "dst"), "dst")
          .groupBy(col("src").as("node"))
          .agg(sum(col("score").cast(DecimalType(30, 12))).as("raw")),
        s"hits_h_$i")
    }
    hubs.select(col("node"), lit("hub").as("kind"),
        round(col("score"), 8).as("score"))
      .union(auths.select(col("node"), lit("auth").as("kind"),
        round(col("score"), 8).as("score")))
  }

  /** Degree histogram of a directed edge list: for each direction, how
    * many nodes have each degree — the first diagnostic run on any new
    * graph (a heavy right tail here is the skew that later dictates
    * salting/broadcast choices in the joins over this graph; a spike at
    * degree 1 flags a near-tree). One row per (direction ∈ {out,in},
    * degree). Two aggregations per direction — per-node degree, then the
    * histogram rollup whose output is at most the distinct-degree count.
    */
  def degreeHistogram(edges: DataFrame): DataFrame = {
    def side(c: String, name: String) =
      edges.groupBy(col(c).as("node"))
        .agg(count(lit(1)).as("degree"))
        .groupBy("degree").agg(count(lit(1)).as("n_nodes"))
        .select(lit(name).as("direction"), col("degree"), col("n_nodes"))
    side("src", "out").union(side("dst", "in"))
  }
}
