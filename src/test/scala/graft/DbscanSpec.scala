package graft

import graft.operators.Dbscan

/** Semantics gate for the grid DBSCAN: a hand fixture where every
  * role and label is derivable on paper (the q239 oracle proves
  * ENGINE parity; this proves the ALGORITHM — core test counts the
  * point itself, chains connect across grid cells, border adopts the
  * min core neighbor's cluster, isolated points are noise), plus the
  * dense-cell occupancy cap (VERDICT r13 #4): under-cap inputs are
  * bit-identical to the exact path, and an over-dense cell that the
  * cap starves below minPts is rescued by the sub-cell auto-core
  * backstop with the exact labeling preserved. */
class DbscanSpec extends GraftSuite {
  import spark.implicits._

  private def labels(df: org.apache.spark.sql.DataFrame,
      eps: Double, minPts: Int,
      maxCell: Int = Dbscan.DefaultMaxCell) = {
    val out = Dbscan.label(df, eps, minPts, maxCell)
    val rows = out.collect()
      .map(r => (r.getLong(0), r.getString(3), r.getLong(4)))
      .sortBy(_._1).toSeq
    out.unpersist() // caller-owned persist (ADVICE r13)
    rows
  }

  test("hand fixture: two clusters, a border point, a noise point — " +
      "exact roles and min-core-id labels (eps=1, minPts=3)") {
    // cluster A: a CHAIN spanning several grid cells (0,0)-(1.5,0);
    // point 4 is border (one core neighbor, degree 2 < minPts);
    // cluster B: a separate triple at y=5; point 8 is noise
    val pts = Seq(
      (0L, 0.0, 0.0), (1L, 0.5, 0.0), (2L, 1.0, 0.0), (3L, 1.5, 0.0),
      (4L, 2.4, 0.0),
      (5L, 0.0, 5.0), (6L, 0.6, 5.0), (7L, 1.0, 5.0),
      (8L, 10.0, 10.0)).toDF("id", "x", "y")
    val want = Seq(
      (0L, "core", 0L), (1L, "core", 0L), (2L, "core", 0L),
      (3L, "core", 0L),
      (4L, "border", 0L),
      (5L, "core", 5L), (6L, "core", 5L), (7L, "core", 5L),
      (8L, "noise", -1L))
    assert(labels(pts, eps = 1.0, minPts = 3) === want)
    // under-cap bit-identity: the capped plan must not change a
    // single row vs the exact (cap-disabled) path
    assert(labels(pts, eps = 1.0, minPts = 3, maxCell = 0) === want)
  }

  test("exactly-eps distance is INSIDE the neighborhood (<=, the " +
      "paper's closed ball), and a lone pair below minPts is noise") {
    val pts = Seq((0L, 0.0, 0.0), (1L, 1.0, 0.0)).toDF("id", "x", "y")
    // d = exactly eps: neighbors of each other -> degree 2 each, but
    // minPts=3 -> both noise
    assert(labels(pts, eps = 1.0, minPts = 3) ===
      Seq((0L, "noise", -1L), (1L, "noise", -1L)))
    // same pair with minPts=2: both core, one cluster labeled 0
    assert(labels(pts, eps = 1.0, minPts = 2) ===
      Seq((0L, "core", 0L), (1L, "core", 0L)))
  }

  test("dense-cell cap engaged: a 50-point blob in one cell, cap=10, " +
      "minPts=15 — capped degree alone can't reach minPts, the " +
      "sub-cell auto-core backstop preserves the exact labeling") {
    // 50 points inside a 0.2-radius blob at (0.25, 0.25): one grid
    // cell (eps=1), one sub-cell (side 0.5) — every pair within eps,
    // so EXACT DBSCAN makes all 50 core in one cluster labeled 0.
    // With maxCell=10 each point sees only ~11 candidates (< minPts
    // 15): the counted core test fails for EVERY point and only the
    // auto-core rule (50 >= 15 in one eps/2 sub-cell) holds the
    // labeling together — the cap's documented one-sided degradation
    // being repaired by the triangle-inequality backstop.
    val pts = (0 until 50).map { i =>
      (i.toLong, 0.25 + 0.002 * (i % 10), 0.25 + 0.002 * (i / 10))
    }.toDF("id", "x", "y")
    val exact = labels(pts, eps = 1.0, minPts = 15, maxCell = 0)
    assert(exact.forall { case (_, role, c) =>
      role == "core" && c == 0L })
    val capped = labels(pts, eps = 1.0, minPts = 15, maxCell = 10)
    assert(capped === exact,
      "capped labeling diverged from exact on the dense blob")
  }

  test("empty input returns an empty labeled frame with the cap " +
      "enabled (ADVICE r14: max() over zero rows is NULL, not 0)") {
    val pts = Seq.empty[(Long, Double, Double)].toDF("id", "x", "y")
    assert(labels(pts, eps = 1.0, minPts = 3) === Seq.empty)
  }

  test("anchor edges reconnect cap-dropped auto-cores (ADVICE r14): " +
      "a far-corner trio whose every kept-member distance exceeds " +
      "eps must come out ONE cluster, not three singletons") {
    // one grid cell (eps=1) holding 5 low-id points at one corner and
    // a tight trio at the opposite corner, > eps apart. maxCell=5
    // keeps only the low five on the neighbor side, so the trio gets
    // ZERO candidate rows: it is core only via the sub-cell auto-core
    // rule, and pre-fix its members reached the component step
    // edge-less — three minted singleton clusters (the cap SPLITTING
    // a cluster). The sub-cell anchor edges ((5,6), (5,7): exact
    // ε-edges by the eps/√2 diameter certificate) reconnect them.
    val pts = (
      (0 until 5).map(i => (i.toLong, 0.05 + 0.002 * i, 0.05)) ++
        Seq((5L, 0.93, 0.93), (6L, 0.935, 0.93), (7L, 0.93, 0.935))
      ).toDF("id", "x", "y")
    val exact = labels(pts, eps = 1.0, minPts = 3, maxCell = 0)
    assert(exact === Seq(
      (0L, "core", 0L), (1L, "core", 0L), (2L, "core", 0L),
      (3L, "core", 0L), (4L, "core", 0L),
      (5L, "core", 5L), (6L, "core", 5L), (7L, "core", 5L)))
    val capped = labels(pts, eps = 1.0, minPts = 3, maxCell = 5)
    assert(capped === exact,
      "cap split the auto-core trio into singleton clusters")
  }

  test("cap degrades one-sided: no false cores, no invented " +
      "clusters — an over-dense cell plus a genuinely-noise outlier") {
    // the blob again (cap engaged) plus an isolated point: the
    // outlier must stay noise under the cap (capping can only REMOVE
    // candidates, never add)
    val pts = ((0 until 40).map { i =>
      (i.toLong, 0.25 + 0.002 * (i % 8), 0.25 + 0.002 * (i / 8))
    } :+ (99L, 50.0, 50.0)).toDF("id", "x", "y")
    val capped = labels(pts, eps = 1.0, minPts = 5, maxCell = 8)
    assert(capped.filter(_._1 == 99L) === Seq((99L, "noise", -1L)))
    assert(capped.filter(_._1 != 99L).forall { case (_, role, c) =>
      role == "core" && c == 0L })
  }
}
