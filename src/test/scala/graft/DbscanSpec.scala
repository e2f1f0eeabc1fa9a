package graft

import graft.operators.Dbscan

/** Semantics gate for the grid DBSCAN: a hand fixture where every
  * role and label is derivable on paper (the q239 oracle proves
  * ENGINE parity; this proves the ALGORITHM — core test counts the
  * point itself, chains connect across grid cells, border adopts the
  * min core neighbor's cluster, isolated points are noise). */
class DbscanSpec extends GraftSuite {
  import spark.implicits._

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
    val got = Dbscan.label(pts, eps = 1.0, minPts = 3)
      .collect()
      .map(r => (r.getLong(0), r.getString(3), r.getLong(4)))
      .sortBy(_._1)
    assert(got.toSeq === Seq(
      (0L, "core", 0L), (1L, "core", 0L), (2L, "core", 0L),
      (3L, "core", 0L),
      (4L, "border", 0L),
      (5L, "core", 5L), (6L, "core", 5L), (7L, "core", 5L),
      (8L, "noise", -1L)))
  }

  test("exactly-eps distance is INSIDE the neighborhood (<=, the " +
      "paper's closed ball), and a lone pair below minPts is noise") {
    val pts = Seq((0L, 0.0, 0.0), (1L, 1.0, 0.0)).toDF("id", "x", "y")
    // d = exactly eps: neighbors of each other -> degree 2 each, but
    // minPts=3 -> both noise
    val got = Dbscan.label(pts, eps = 1.0, minPts = 3)
      .collect().map(r => (r.getLong(0), r.getString(3), r.getLong(4)))
      .sortBy(_._1)
    assert(got.toSeq === Seq((0L, "noise", -1L), (1L, "noise", -1L)))
    // same pair with minPts=2: both core, one cluster labeled 0
    val got2 = Dbscan.label(pts, eps = 1.0, minPts = 2)
      .collect().map(r => (r.getLong(0), r.getString(3), r.getLong(4)))
      .sortBy(_._1)
    assert(got2.toSeq === Seq((0L, "core", 0L), (1L, "core", 0L)))
  }
}
