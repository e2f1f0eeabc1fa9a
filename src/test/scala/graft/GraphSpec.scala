package graft

import org.apache.spark.sql.functions._

import graft.operators.Graph

class GraphSpec extends GraftSuite {

  private def ranksOf(edges: Seq[(Long, Long)],
      iterations: Int = 10): Map[Long, Double] = {
    val s = spark
    import s.implicits._
    Graph.pageRankUndirected(edges.toDF("id_a", "id_b"), "id_a", "id_b",
        iterations)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
  }

  /** Driver-side reference power iteration (same fixed rounds). */
  private def localPageRank(edges: Seq[(Long, Long)],
      iterations: Int): Map[Long, Double] = {
    val und = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
    val deg = und.groupBy(_._1).map { case (k, v) => k -> v.size }
    val nodes = deg.keys.toSeq.sorted
    val n = nodes.size
    var rank = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iterations) {
      val in = und.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => rank(src) / deg(src) }.sum
      }
      rank = nodes.map(id =>
        id -> (0.15 / n + 0.85 * in.getOrElse(id, 0.0))).toMap
    }
    rank
  }

  test("star graph: hub outranks spokes; ranks sum to 1") {
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L))
    val got = ranksOf(star)
    assert(got.size === 5)
    assert(got(0L) > got(1L) * 2, s"hub not dominant: $got")
    Seq(2L, 3L, 4L).foreach(i => assert(math.abs(got(i) - got(1L)) < 1e-12))
    assert(math.abs(got.values.sum - 1.0) < 1e-9) // no dangling leak
  }

  test("matches a driver-side reference power iteration exactly") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L),
      (5L, 6L)) // two components
    val got = ranksOf(edges, iterations = 7)
    val want = localPageRank(edges, iterations = 7)
    assert(got.keySet === want.keySet)
    got.foreach { case (id, r) =>
      assert(math.abs(r - want(id)) < 1e-12, s"node $id: $r vs ${want(id)}")
    }
  }

  test("50 rounds: checkpoint cadence keeps parity with the reference") {
    // 50 iterations crosses the localCheckpoint cadence (every 5) nine
    // times — proves cutting lineage changes nothing numerically while
    // keeping the plan bounded at iteration counts where the unbroken
    // chain would blow up
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L),
      (5L, 6L), (6L, 7L))
    val got = ranksOf(edges, iterations = 50)
    val want = localPageRank(edges, iterations = 50)
    assert(got.keySet === want.keySet)
    got.foreach { case (id, r) =>
      assert(math.abs(r - want(id)) < 1e-12, s"node $id: $r vs ${want(id)}")
    }
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
  }

  test("plan depth is bounded by the checkpoint cadence, not the " +
      "iteration count") {
    // The returned frame's plan must contain at most one cadence
    // window's worth of join rounds on top of the last checkpoint —
    // 13 and 23 iterations at cadence 5 both leave a 3-round tail, so
    // their plans must be the SAME depth; without the cap, 23 rounds
    // would carry ~20 more joins than 13. Also pins the r7 audit fix:
    // the default cadence (5) actually fires on a default 10-round run
    // (10-round tail = 5 rounds < 10).
    val s = spark
    import s.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))
      .toDF("id_a", "id_b")
    def joinDepth(iters: Int): Int =
      Graph.pageRankUndirected(edges, "id_a", "id_b", iters)
        .queryExecution.optimizedPlan.collect {
          case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
        }.size
    val d13 = joinDepth(13)
    val d23 = joinDepth(23)
    assert(d13 === d23,
      s"plan depth grew with iterations: $d13 joins at 13 vs $d23 at 23")
    // one cadence window = at most 5 tail rounds, ONE join per round
    // (the round-8 rewrite dropped the redundant nodes completion join)
    assert(d23 <= 5, s"tail window exceeds one cadence: $d23 joins")
    val dDefault = joinDepth(10)
    assert(dDefault <= 5,
      s"default 10-round run not checkpoint-capped: $dDefault joins")
  }

  test("plan depth stays bounded at 50 production rounds — pagerank, " +
      "personalized, and LPA") {
    // the r8 verdict's production-iteration-count ask: 50 rounds
    // crosses the cadence 9-24 times; each op's plan must carry at
    // most ONE cadence window of tail rounds, same depth as any other
    // iteration count with the same tail
    val s = spark
    import s.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))
      .toDF("id_a", "id_b")
    def joins(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.optimizedPlan.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
      }.size
    // PR and PPR: cadence 5 → a 50-round run leaves a 5-round tail,
    // like a 25-round run
    val pr50 = joins(Graph.pageRankUndirected(edges, "id_a", "id_b", 50))
    assert(pr50 === joins(
      Graph.pageRankUndirected(edges, "id_a", "id_b", 25)))
    assert(pr50 <= 5, s"pagerank 50-round tail too deep: $pr50")
    val ppr50 = joins(Graph.personalizedPageRank(edges, "id_a", "id_b",
      seeds = Seq(1L), iterations = 50))
    assert(ppr50 === joins(Graph.personalizedPageRank(edges, "id_a",
      "id_b", seeds = Seq(1L), iterations = 25)))
    assert(ppr50 <= 5, s"ppr 50-round tail too deep: $ppr50")
    // LPA: cadence 2 → 50 and 20 rounds both leave a 2-round tail
    val lpa50 = joins(Graph.labelPropagation(edges, "id_a", "id_b", 50))
    assert(lpa50 === joins(Graph.labelPropagation(edges, "id_a", "id_b",
      20)))
    assert(lpa50 <= 2, s"lpa 50-round tail too deep: $lpa50")
  }

  test("ranking is placement-invariant at any partitioning") {
    val s = spark
    import s.implicits._
    val edges = (1L to 40L).map(i => (i, i % 7 + 100L))
    def run(parts: Int): Seq[(Long, Double)] =
      Graph.pageRankUndirected(
        edges.toDF("id_a", "id_b").repartition(parts), "id_a", "id_b")
        .select(col("id"), round(col("rank"), 8).as("r"))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).sorted.toSeq
    assert(run(3) === run(8))
  }

  /** Driver-side personalized reference (seed-indicator teleport). */
  private def localPpr(edges: Seq[(Long, Long)], seeds: Set[Long],
      iterations: Int): Map[Long, Double] = {
    val und = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
    val deg = und.groupBy(_._1).map { case (k, v) => k -> v.size }
    val nodes = deg.keys.toSeq.sorted
    val k = seeds.size
    var rank = nodes.map(id =>
      id -> (if (seeds(id)) 1.0 / k else 0.0)).toMap
    for (_ <- 1 to iterations) {
      val in = und.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => rank(src) / deg(src) }.sum
      }
      rank = nodes.map(id => id ->
        ((if (seeds(id)) (1 - 0.85) / k else 0.0) +
          0.85 * in.getOrElse(id, 0.0))).toMap
    }
    rank
  }

  test("personalized: mass concentrates near the seeds; matches the " +
      "reference exactly") {
    val s = spark
    import s.implicits._
    // two loosely-bridged cliques; seeds in clique A only
    val edges = (for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)) ++
      (for (a <- 10L to 13L; b <- (a + 1) to 13L) yield (a, b)) ++
      Seq((4L, 10L))
    val got = Graph.personalizedPageRank(edges.toDF("id_a", "id_b"),
        "id_a", "id_b", seeds = Seq(1L, 2L), iterations = 7)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = localPpr(edges, Set(1L, 2L), 7)
    assert(got.keySet === want.keySet)
    got.foreach { case (id, r) =>
      assert(math.abs(r - want(id)) < 1e-12, s"node $id") }
    // seed-side nodes outrank the far clique's interior
    assert(got(1L) > got(12L) * 3)
    assert(got(3L) > got(12L))
  }

  // ---------------------------------------------------- triangleCounts

  private def trianglesOf(edges: Seq[(Long, Long)])
      : Map[Long, (Long, Long, Double)] = {
    val s = spark
    import s.implicits._
    Graph.triangleCounts(edges.toDF("id_a", "id_b"), "id_a", "id_b")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
  }

  /** Driver-side reference: brute-force triangle enumeration over the
    * canonical edge set. */
  private def localTriangles(edges: Seq[(Long, Long)])
      : Map[Long, (Long, Long, Double)] = {
    val canon = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter { case (a, b) => a != b }.distinct
    val adj = (canon ++ canon.map(_.swap)).groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2).toSet }
    val nodes = adj.keys.toSeq.sorted
    val triPer = scala.collection.mutable.Map[Long, Long]()
      .withDefaultValue(0L)
    for {
      (a, b) <- canon
      c <- adj(a) if c > b && adj(b).contains(c)
    } { triPer(a) += 1; triPer(b) += 1; triPer(c) += 1 }
    nodes.map { id =>
      val d = adj(id).size.toLong
      val t = triPer(id)
      val lcc = if (d >= 2)
        BigDecimal(2.0 * t / (d * (d - 1)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      else 0.0
      id -> ((d, t, lcc))
    }.toMap
  }

  test("K4: every node in 3 triangles, lcc 1.0") {
    val k4 = for (a <- 0L to 3L; b <- (a + 1) to 3L) yield (a, b)
    val got = trianglesOf(k4)
    assert(got.size === 4)
    got.values.foreach { case (d, t, l) =>
      assert(d === 3L); assert(t === 3L); assert(l === 1.0)
    }
  }

  test("triangle with a pendant: pendant and apex coefficients") {
    // 1-2-3 triangle, 3-4 pendant edge
    val got = trianglesOf(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)))
    assert(got(1L) === ((2L, 1L, 1.0)))
    assert(got(2L) === ((2L, 1L, 1.0)))
    assert(got(3L) === ((3L, 1L, 0.333333)))
    assert(got(4L) === ((1L, 0L, 0.0)))
  }

  test("self-loops, duplicates and reversed duplicates are ignored") {
    val noisy = Seq((1L, 2L), (2L, 1L), (1L, 1L), (2L, 3L), (1L, 3L),
      (3L, 1L), (1L, 2L))
    val got = trianglesOf(noisy)
    assert(got(1L)._2 === 1L)
    assert(got.values.map(_._2).sum === 3L) // one triangle, 3 corners
  }

  test("matches a brute-force reference on a hub-skewed graph") {
    // hub 0 connected to all; ring among 1..12; a few chords — the
    // shape where naive wedge enumeration pays the d² hub term
    val edges = (1L to 12L).map(i => (0L, i)) ++
      (1L to 12L).map(i => (i, i % 12 + 1)) ++
      Seq((2L, 7L), (3L, 9L), (5L, 11L))
    assert(trianglesOf(edges) === localTriangles(edges))
  }

  test("shuffle-join closure (broadcastAdjacency=Some(false)) is " +
      "identical") {
    val s = spark
    import s.implicits._
    val edges = (1L to 12L).map(i => (0L, i)) ++
      (1L to 12L).map(i => (i, i % 12 + 1)) ++ Seq((2L, 7L), (3L, 9L))
    val a = Graph.triangleCounts(edges.toDF("id_a", "id_b"), "id_a",
      "id_b").collect().map(_.toSeq).sortBy(_.toString)
    val b = Graph.triangleCounts(edges.toDF("id_a", "id_b"), "id_a",
      "id_b", broadcastAdjacency = Some(false))
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(a.toSeq === b.toSeq)
  }

  test("auto adjacency strategy sizes the broadcast decision and both " +
      "physical plans agree") {
    val s = spark
    import s.implicits._
    val edges = (1L to 12L).map(i => (0L, i)) ++
      (1L to 12L).map(i => (i, i % 12 + 1)) ++ Seq((2L, 7L), (3L, 9L))
    val df = edges.toDF("id_a", "id_b")
    // the decision model, pinned at the ×10 sweep's calibration points
    // (BASELINE.md graph rows: broadcast measured 49.2 s vs 74.5 s
    // shuffle at 12 M edges): the measured-winner regime stays
    // broadcast under the default budget, a 100× node table does not
    assert(Graph.adjacencyFitsBroadcast(m = 12_000_000L, n = 1_000_000L),
      "the measured broadcast-winner regime must stay under the budget")
    assert(!Graph.adjacencyFitsBroadcast(
      m = 1_200_000_000L, n = 100_000_000L),
      "a 100x graph must auto-degrade to the shuffle closure")
    // both physical strategies agree on results: auto (broadcast here)
    // vs a 1-byte budget (forces the shuffle closure)
    val auto = Graph.triangleCounts(df, "id_a", "id_b")
    val forced = Graph.triangleCounts(df, "id_a", "id_b",
      broadcastAdjacency = None, broadcastBudgetBytes = 1L)
    assert(auto.collect().map(_.toSeq).sortBy(_.toString).toSeq ===
      forced.collect().map(_.toSeq).sortBy(_.toString).toSeq)
  }

  // -------------------------------------------------- labelPropagation

  private def labelsOf(edges: Seq[(Long, Long)], rounds: Int = 4)
      : Map[Long, Long] = {
    val s = spark
    import s.implicits._
    Graph.labelPropagation(edges.toDF("id_a", "id_b"), "id_a", "id_b",
      rounds).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  /** Driver-side reference: synchronous LPA, ties to smallest label. */
  private def localLpa(edges: Seq[(Long, Long)], rounds: Int)
      : Map[Long, Long] = {
    val canon = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter { case (a, b) => a != b }.distinct
    val adj = (canon ++ canon.map(_.swap)).groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2) }
    var lab = adj.keys.map(id => id -> id).toMap
    for (_ <- 1 to rounds) {
      lab = adj.map { case (id, nbrs) =>
        val counts = nbrs.groupBy(lab).map { case (l, v) => (l, v.size) }
        id -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    lab
  }

  test("two cliques with a bridge: each clique converges to its min id") {
    val cliqueA = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val cliqueB = for (a <- 10L to 13L; b <- (a + 1) to 13L) yield (a, b)
    val got = labelsOf(cliqueA ++ cliqueB ++ Seq((4L, 10L)))
    Seq(1L, 2L, 3L).foreach(i => assert(got(i) === 1L, s"node $i"))
    Seq(11L, 12L, 13L).foreach(i => assert(got(i) === 10L, s"node $i"))
  }

  test("label propagation matches the synchronous reference at 1..4 " +
      "rounds") {
    val edges = (for (a <- 1L to 5L; b <- (a + 1) to 5L) yield (a, b)) ++
      (for (a <- 20L to 24L; b <- (a + 1) to 24L) yield (a, b)) ++
      Seq((5L, 20L), (2L, 21L), (30L, 31L), (31L, 32L))
    (1 to 4).foreach { r =>
      assert(labelsOf(edges, r) === localLpa(edges, r), s"rounds=$r")
    }
  }

  test("labels are partitioning-invariant") {
    val s = spark
    import s.implicits._
    val edges = ((1L to 30L).map(i => (i, i % 6 + 50L)) ++
      (1L to 29L by 3).map(i => (i, i + 1))).toDF("id_a", "id_b")
    def run(parts: Int) =
      Graph.labelPropagation(edges.repartition(parts), "id_a", "id_b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(run(2) === run(7))
  }

  test("replication: triangles and labels reproduce per-replica exactly") {
    // three disjoint node-space replicas of a triangles+communities
    // graph: results must be the base result offset-shifted, bit-exact
    val base = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L),
      (5L, 6L), (4L, 6L), (10L, 11L))
    val off = 1000L
    val rep = (0 until 3).flatMap(k =>
      base.map { case (a, b) => (a + k * off, b + k * off) })
    val triBase = trianglesOf(base)
    val triRep = trianglesOf(rep)
    assert(triRep.size === 3 * triBase.size)
    triRep.foreach { case (id, row) =>
      assert(row === triBase(id % off), s"node $id diverged")
    }
    val labBase = labelsOf(base)
    val labRep = labelsOf(rep)
    assert(labRep.size === 3 * labBase.size)
    labRep.foreach { case (id, lab) =>
      assert(lab === labBase(id % off) + (id / off) * off,
        s"label of $id not offset-pure")
    }
  }

  test("triangles AND labels match brute force on random graphs") {
    val rnd = new scala.util.Random(166168)
    (1 to 6).foreach { trial =>
      val n = 8 + rnd.nextInt(12)
      val p = 0.15 + rnd.nextDouble() * 0.35
      val edges = (for {
        a <- 1L to n; b <- (a + 1) to n if rnd.nextDouble() < p
      } yield (a, b)).toSeq
      if (edges.nonEmpty) {
        assert(trianglesOf(edges) === localTriangles(edges),
          s"triangles diverged on trial $trial (n=$n, p=$p)")
        val r = 1 + rnd.nextInt(4)
        assert(labelsOf(edges, r) === localLpa(edges, r),
          s"LPA diverged on trial $trial (n=$n, rounds=$r)")
      }
    }
  }

  test("triangle counts are partitioning-invariant") {
    val s = spark
    import s.implicits._
    val edges = ((1L to 30L).map(i => (i, i % 5 + 50L)) ++
      (1L to 29L).map(i => (i, i + 1))).toDF("id_a", "id_b")
    def run(parts: Int) =
      Graph.triangleCounts(edges.repartition(parts), "id_a", "id_b")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3))).sorted.toSeq
    assert(run(2) === run(7))
  }
}
