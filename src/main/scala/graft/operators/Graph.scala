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
      checkpointEvery: Int = 5,
      broadcastRanks: Option[Boolean] = None,
      broadcastBudgetBytes: Long = DefaultRankBroadcastBytes)
      : DataFrame = {
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
    val init = nodes.select(col("id"), lit(1.0 / n).as("rank"))
    powerRounds(undDeg, nodes, init, _ => lit((1 - damping) / n),
      iterations, damping, checkpointEvery,
      broadcastRanks.getOrElse(
        ranksFitBroadcast(n, broadcastBudgetBytes)))
  }

  /** PERSONALIZED PageRank: identical power iteration, but the restart
    * mass teleports only to the `seeds` — ranks measure proximity to
    * the seed set, the primitive behind "canonical document per
    * near-dup family" and related-item ranking. Seeds absent from the
    * graph contribute teleport mass to nobody (their rank is defined
    * but unreachable); ranks sum to ≤ 1 with equality when every seed
    * is present. Same fixed-rounds determinism contract as
    * [[pageRankUndirected]]. */
  def personalizedPageRank(pairs: DataFrame, idA: String, idB: String,
      seeds: Seq[Long], iterations: Int = 10, damping: Double = 0.85,
      checkpointEvery: Int = 5,
      broadcastRanks: Option[Boolean] = None,
      broadcastBudgetBytes: Long = DefaultRankBroadcastBytes)
      : DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    require(checkpointEvery >= 1, "checkpointEvery must be >= 1")
    require(seeds.nonEmpty, "seed set must be non-empty")
    val und = pairs.select(col(idA).as("src"), col(idB).as("dst"))
      .unionAll(pairs.select(col(idB).as("src"), col(idA).as("dst")))
    val deg = und.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val undDeg = und.join(deg, "src")
      .select(col("src"), col("dst"), col("deg"))
      .persist()
    val nodes = deg.select(col("src").as("id")).persist()
    val n = nodes.count()
    val k = seeds.size
    val tele = (id: org.apache.spark.sql.Column) =>
      when(id.isin(seeds: _*), lit((1 - damping) / k)).otherwise(lit(0.0))
    val init = nodes.select(col("id"),
      when(col("id").isin(seeds: _*), lit(1.0 / k)).otherwise(lit(0.0))
        .as("rank"))
    powerRounds(undDeg, nodes, init, tele, iterations, damping,
      checkpointEvery,
      broadcastRanks.getOrElse(
        ranksFitBroadcast(n, broadcastBudgetBytes)))
  }

  /** Shared power-iteration core: ONE join + one aggregation per round
    * against the persisted (src, dst, deg) operand; no nodes re-join —
    * with both edge directions materialized every node has degree ≥ 1
    * AND an in-contribution, so the contribution aggregate already
    * covers the full node set (a left_outer completion join would
    * never fire its coalesce). `teleport` maps the node-id column to
    * that node's restart mass: a constant for classic PageRank, a
    * seed-set indicator for the personalized variant. */
  /** The rank-state broadcast budget (r16 optimization round, guide
    * §3.1): each power round joins the NODE-sized rank state against
    * the persisted edge operand. Planned cold, the post-aggregation
    * rank frame has no size statistics, so Catalyst picks sort-merge
    * and every round materializes an EDGE-sized exchange before AQE
    * flips the join to broadcast at runtime (measured on q120 at
    * sf0.1: a reused 1.18M-row / 36 MiB exchange of undDeg feeding
    * each round's BroadcastHashJoin). Hinting the broadcast statically
    * removes the big-side exchange from every round: per round ONE
    * exchange (the contribution aggregation) remains — the shuffle
    * power iteration fundamentally needs. The hint is SIZED, not
    * hardcoded (the triangleCounts auto-broadcast pattern): ~48 bytes
    * per (id, rank) row against this budget, decided from the node
    * count the callers already measure — a billion-node 100 TB graph
    * blows the budget and auto-degrades to today's shuffle plan. */
  val DefaultRankBroadcastBytes: Long = 256L << 20

  /** Size model for the auto choice: n (id, rank) rows at ~48 bytes of
    * row + hash-relation overhead each. Public so the crossover is
    * spec-able without a giant graph in CI. */
  def ranksFitBroadcast(n: Long,
      budgetBytes: Long = DefaultRankBroadcastBytes): Boolean =
    48L * n <= budgetBytes

  private def powerRounds(undDeg: DataFrame, nodes: DataFrame,
      init: DataFrame,
      teleport: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
      iterations: Int, damping: Double, checkpointEvery: Int,
      broadcastRanks: Boolean = false)
      : DataFrame = {
    var ranks = init
    for (round <- 1 to iterations) {
      val rhs = if (broadcastRanks) broadcast(ranks) else ranks
      ranks = undDeg
        .join(rhs, undDeg("src") === rhs("id"))
        .select(col("dst").as("id"), (col("rank") / col("deg")).as("c"))
        .groupBy(col("id"))
        .agg((teleport(col("id")) +
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

  /** Per-node triangle counts + local clustering coefficient over an
    * undirected simple graph, one row per edge (idA, idB). Self-loops
    * and duplicate edges are dropped. Returns (id, deg, n_tri, lcc)
    * for EVERY node, lcc = 2·n_tri / (deg·(deg−1)) rounded to 6 dp.
    *
    * Scale shape: degree orientation (every edge pointed from its
    * lower-(deg,id) endpoint to the higher) caps every out-degree at
    * O(√m) regardless of hubs [Chiba–Nishizeki], so the total
    * triangle work is O(m^1.5) — and each triangle (u,v,w), ranked
    * u<v<w, is found exactly once: w ∈ adj⁺(u) ∩ adj⁺(v) for its
    * unique (lowest, middle) edge (u,v), while edges (u,w) and (v,w)
    * can never re-find it (v ∉ adj⁺(w), u ∉ adj⁺(v)). The closure is
    * computed per EDGE as one in-core `array_intersect` of the two
    * endpoints' bounded out-adjacency arrays, never as a wedge
    * exchange: materializing wedges shuffles Σ outdeg² rows (41 M at
    * sf0.1 — measured 17 s in the closure join alone) where the
    * adjacency form joins the m-row edge list against a
    * node-count-sized adjacency table. With `broadcastAdjacency`
    * (default) that table ships map-side and the closure runs with NO
    * shuffle of adjacency data at all — measured 3.8 s vs 17.3 s for
    * the wedge exchange at sf0.1 (1.2 M edges), identical counts; the
    * table sat just over the 10 MB auto-broadcast line, which is why
    * AQE alone left it as a sort-merge join. With `Some(false)` the
    * closure degrades to two shuffle equi-joins on node id — still
    * edge-list-sized exchanges, never the Σ outdeg² wedge volume.
    * Per-node counts are a corner explode + aggregation.
    *
    * `broadcastAdjacency = None` (the default since round 9) SIZES the
    * choice instead of hardcoding it: the canonical edge and node
    * counts are measured (two cheap jobs against frames the closure
    * consumes anyway, both persisted for their later reuses) and the
    * adjacency payload estimated at 8·m + 44·n bytes (one long array
    * slot per oriented edge + per-node row/array overhead); at or
    * under [[DefaultAdjacencyBroadcastBytes]] the measured-winner
    * broadcast plan runs, above it the shuffle plan. The ×10 sweep's
    * data points calibrate the default: 12 M edges ≈ 140 MB estimated
    * — comfortably inside the 256 MB budget where broadcast measured
    * 49.2 s vs 74.5 s shuffle — while a 100× node table estimates in
    * the tens of GB and auto-degrades instead of OOMing the driver. */
  val DefaultAdjacencyBroadcastBytes: Long = 256L << 20

  /** The auto strategy's size model: m canonical edges contribute one
    * 8-byte array slot each; n nodes ~44 bytes of row + array + degree
    * overhead. Public so the crossover is spec-able against the
    * measured sweep points without running a 12 M-edge graph in CI. */
  def adjacencyFitsBroadcast(m: Long, n: Long,
      budgetBytes: Long = DefaultAdjacencyBroadcastBytes): Boolean =
    8L * m + 44L * n <= budgetBytes

  def triangleCounts(pairs: DataFrame, idA: String, idB: String,
      broadcastAdjacency: Option[Boolean] = None,
      broadcastBudgetBytes: Long = DefaultAdjacencyBroadcastBytes)
      : DataFrame = {
    val canon = pairs
      .select(least(col(idA), col(idB)).as("a"),
        greatest(col(idA), col(idB)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .persist() // consumed by deg, the orientation join, and counting
    val und = canon.select(col("a").as("id"), col("b").as("nb"))
      .unionAll(canon.select(col("b").as("id"), col("a").as("nb")))
    val deg = und.groupBy(col("id")).agg(count(lit(1)).as("deg"))
      .persist() // consumed by both orientation sides + the final join
    val doBroadcast = broadcastAdjacency.getOrElse(
      adjacencyFitsBroadcast(canon.count(), deg.count(),
        broadcastBudgetBytes))
    val side = (f: DataFrame) =>
      if (doBroadcast) broadcast(f) else f
    // annotate both endpoint degrees, then orient low-rank → high-rank
    // (rank = (deg, id); ids are distinct so the order is total).
    // deg is node-sized plain longs — strictly smaller than the
    // adjacency table, so it rides the same broadcast switch
    val e = canon
      .join(side(deg.select(col("id").as("a"), col("deg").as("deg_a"))),
        "a")
      .join(side(deg.select(col("id").as("b"), col("deg").as("deg_b"))),
        "b")
    val aFirst = col("deg_a") < col("deg_b") ||
      (col("deg_a") === col("deg_b") && col("a") < col("b"))
    val o = e.select(
        when(aFirst, col("a")).otherwise(col("b")).as("src"),
        when(aFirst, col("b")).otherwise(col("a")).as("dst"))
      .persist() // consumed thrice (adjacency build + two join sides)
    // out-adjacency arrays: one row per node, array length ≤ O(√m) by
    // the orientation — bounded, never a hub-sized blob. SORTED at
    // build (one per-node sort) so the per-edge closure can run as a
    // merge scan instead of array_intersect's per-row hash-set build
    // (r16 optimization round: the closure stage's dominant allocation
    // on a 1.2M-edge graph — see [[graft.expressions
    // .SortedLongIntersect]]; the intersection SET is identical, and
    // on these duplicate-free inputs so is the emitted order, which
    // the downstream sum aggregation ignores anyway)
    val adj = o.groupBy(col("src"))
      .agg(sort_array(collect_list(col("dst"))).as("nbrs"))
    val closed = o
      .join(side(adj.select(col("src"), col("nbrs").as("nu"))), Seq("src"))
      .join(side(adj.select(col("src").as("dst"), col("nbrs").as("nv"))),
        Seq("dst"))
      .select(col("src").as("u"), col("dst").as("v"),
        graft.expressions.SortedLongIntersect(col("nu"), col("nv"))
          .as("ws"))
      .filter(size(col("ws")) > 0)
    // corner attribution: each w in the intersection is one triangle —
    // +1 to w, and +|ws| to both u and v. ONE explode over the fused
    // contribution array and ONE aggregation: the pre-r12 shape ran
    // two groupBys plus a union re-group (three shuffles) AND, with
    // two consumers of the unpersisted `closed`, computed the
    // GC-heavy array_intersect join twice — exactly the allocation
    // pressure the r11/r10 driver captures read as 2.5-3× inflation
    val per = closed
      .select(explode(concat(
        array(
          struct(col("u").as("id"), size(col("ws")).cast("long").as("t")),
          struct(col("v").as("id"), size(col("ws")).cast("long").as("t"))),
        transform(col("ws"),
          w => struct(w.as("id"), lit(1L).as("t"))))).as("c"))
      .groupBy(col("c.id").as("id")).agg(sum(col("c.t")).as("n_tri"))
    val out = deg.join(per, Seq("id"), "left")
      .select(col("id"), col("deg"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"),
        round(when(col("deg") >= 2,
            (lit(2) * coalesce(col("n_tri"), lit(0L)))
              .cast("double") / (col("deg") * (col("deg") - 1)))
          .otherwise(lit(0.0)), 6).as("lcc"))
    // evict any stale entry from a previous plan-identical call (the
    // pageRank/connectedComponents bug class), then materialize while
    // o is cached and release the intermediates
    out.unpersist()
    out.persist().count()
    o.unpersist()
    deg.unpersist()
    canon.unpersist()
    out
  }

  /** Community detection by SYNCHRONOUS label propagation over an
    * undirected simple graph: every node starts as its own label;
    * each round every node adopts the most frequent label among its
    * neighbors, ties broken by the SMALLEST label — so a FIXED round
    * count makes the result a pure function of (edges, rounds), with
    * none of classic LPA's update-order or random-tie
    * nondeterminism. Returns (id, lab) for every node with ≥1 edge.
    *
    * Scale shape: one equi-join of the static edge list against the
    * current labels + one (dst, lab) count + one per-node argmax per
    * round — all keyed shuffles on node id, volume bounded by the
    * edge count, no pair term. Lineage is localCheckpoint-capped on
    * the [[pageRankUndirected]] cadence contract (cadence < default
    * rounds, so the cap engages on a default run). */
  def labelPropagation(pairs: DataFrame, idA: String, idB: String,
      rounds: Int = 4, checkpointEvery: Int = 2): DataFrame = {
    require(rounds >= 1, "rounds must be >= 1")
    require(checkpointEvery >= 1, "checkpointEvery must be >= 1")
    val canon = pairs
      .select(least(col(idA), col(idB)).as("a"),
        greatest(col(idA), col(idB)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val und = canon.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(canon.select(col("b").as("src"), col("a").as("dst")))
      .persist()
    var labels = und.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("lab"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("c").desc, col("lab").asc)
    for (round <- 1 to rounds) {
      val cnt = und.join(labels, und("src") === labels("id"))
        .groupBy(und("dst"), col("lab"))
        .agg(count(lit(1)).as("c"))
        .select(col("dst").as("id"), col("lab"), col("c"))
      labels = cnt.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("id"), col("lab"))
      if (round % checkpointEvery == 0 && round < rounds)
        labels = labels.localCheckpoint(true)
    }
    labels.unpersist()
    val out = labels.persist()
    out.count()
    und.unpersist()
    out
  }
}
