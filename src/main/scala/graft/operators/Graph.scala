package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph analytics over edge DataFrames — the PageRank
  * companion to [[Dedup.connectedComponents]] (centrality vs
  * connectivity; e.g. rank canonical documents inside near-dup
  * families, or find load-bearing suppliers in a part-sourcing graph).
  *
  * Power iteration, Spark-first: each round is one equi-join of the
  * (static, degree-annotated) edge list against the current ranks plus
  * one aggregation on the destination — the contribution shuffle
  * partitions by the same key every round, so at scale consecutive
  * rounds reuse the exchange layout. A FIXED iteration count keeps the
  * result a pure function of (edges, iterations, damping) — no
  * convergence test whose trip point could depend on fp noise.
  */
object Graph extends Serializable {

  /** PageRank over an UNDIRECTED graph given one row per edge
    * (idA, idB). Both directions are materialized, so every node has
    * out-degree ≥ 1 — no dangling-mass correction needed. Returns
    * (id, rank); ranks over a connected component sum to that
    * component's share of nodes (global sum = 1).
    *
    * Lineage cadence: every `checkpointEvery` rounds the rank frame is
    * localCheckpoint'ed (eagerly), cutting the join+agg chain — without
    * it, iteration counts beyond ~10 accumulate an unbounded plan whose
    * post-failure recompute at 100 TB replays EVERY round from the
    * start. localCheckpoint (executor-local blocks) is the right tier
    * here: the static operands are persisted separately, and a lost
    * executor costs one cadence-window replay, not the full history.
    *
    * The default cadence (5) is deliberately BELOW the default iteration
    * count (10) so the cap actually engages on a default run — a cadence
    * ≥ iterations never fires (the round-7 audit caught exactly that
    * dead default) and the plan depth quietly scales with the iteration
    * count instead of staying bounded by the cadence window
    * (GraphSpec asserts the bound). */
  def pageRankUndirected(pairs: DataFrame, idA: String, idB: String,
      iterations: Int = 10, damping: Double = 0.85,
      checkpointEvery: Int = 5): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    require(checkpointEvery >= 1, "checkpointEvery must be >= 1")
    val und = pairs.select(col(idA).as("src"), col(idB).as("dst"))
      .unionAll(pairs.select(col(idB).as("src"), col(idA).as("dst")))
    val deg = und.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    // static per-round operand: (src, dst, deg(src)) — built once
    val undDeg = und.join(deg, "src")
      .select(col("src"), col("dst"), col("deg"))
      .persist()
    val nodes = deg.select(col("src").as("id")).persist()
    val n = nodes.count()
    var ranks = nodes.select(col("id"), lit(1.0 / n).as("rank"))
    for (round <- 1 to iterations) {
      // ONE join + one aggregation per round. No nodes re-join: with
      // both edge directions materialized, every node has degree ≥ 1
      // AND an in-contribution (each neighbor contributes back), so
      // the contribution aggregate already covers the full node set —
      // a left_outer completion join would never fire its coalesce
      ranks = undDeg
        .join(ranks, undDeg("src") === ranks("id"))
        .select(col("dst").as("id"), (col("rank") / col("deg")).as("c"))
        .groupBy(col("id"))
        .agg((lit((1 - damping) / n) +
          lit(damping) * sum(col("c"))).as("rank"))
      // cut lineage on cadence (but not on the final round — the tail is
      // materialized once into the persisted output below anyway)
      if (round % checkpointEvery == 0 && round < iterations)
        ranks = ranks.localCheckpoint(true)
    }
    // materialize the chained rounds ONCE while the static operands are
    // cached, then drop them — the returned frame is persisted so later
    // consumers replay no joins (same eager pattern as the CC finisher).
    // The unpersist first evicts a stale cache entry from a PREVIOUS
    // call on the same input (plan-identical): without it the re-persist
    // is a silent no-op against the old entry ("Asked to cache already
    // cached data") and this call's result would serve from state the
    // caller may have mutated around; a fresh run must own a fresh cache
    ranks.unpersist()
    val out = ranks.persist()
    out.count()
    undDeg.unpersist()
    nodes.unpersist()
    out
  }
}
