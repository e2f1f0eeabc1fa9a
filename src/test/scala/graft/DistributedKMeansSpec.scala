package graft

import org.apache.spark.sql.functions._

import graft.ml.DistributedKMeans

/** The whole-corpus Lloyd's operator behind q158: never collects,
  * deterministic under any partitioning (the quantized-centroid
  * contract), recovers planted structure, and behaves sanely when a
  * centroid loses all its points. */
class DistributedKMeansSpec extends GraftSuite {
  import spark.implicits._

  // three well-separated 2-d blobs, 30 points each, ids interleaved so
  // the first-k init lands one seed per blob
  private def blobs = (0 until 90).map { i =>
    val blob = i % 3
    val (cx, cy) = Seq((0.0, 0.0), (10.0, 10.0), (-10.0, 5.0))(blob)
    // deterministic jitter in [-0.5, 0.5)
    val jx = ((i * 37 % 100) - 50) / 100.0
    val jy = ((i * 61 % 100) - 50) / 100.0
    (i.toLong, Array(cx + jx, cy + jy), blob)
  }

  test("recovers planted blobs; assignment agrees with blob identity") {
    val df = blobs.map { case (id, v, _) => (id, v) }.toDF("id", "v")
    val (asg, cents) = DistributedKMeans.fit(df, "id", "v", k = 3,
      iterations = 5)
    val got = asg.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every blob maps to exactly one cluster label and vice versa
    val byBlob = blobs.groupBy(_._3).view
      .mapValues(_.map(p => got(p._1)).distinct).toMap
    byBlob.foreach { case (blob, labels) =>
      assert(labels.size === 1, s"blob $blob split across $labels")
    }
    assert(byBlob.values.flatten.toSet.size === 3, "clusters merged")
    // centroids sit at the blob centers (jitter averages near zero)
    val cvs = cents.collect().map(_.getSeq[Double](1))
    val centers = Seq((0.0, 0.0), (10.0, 10.0), (-10.0, 5.0))
    centers.foreach { case (cx, cy) =>
      assert(cvs.exists(v =>
        math.abs(v(0) - cx) < 0.5 && math.abs(v(1) - cy) < 0.5),
        s"no centroid near ($cx, $cy): ${cvs.map(_.mkString(",")).mkString("; ")}")
    }
  }

  test("bit-identical across partition counts (quantized-centroid " +
      "contract)") {
    def run(parts: Int): (Seq[(Long, Long, Double)], Seq[Seq[Double]]) = {
      val df = blobs.map { case (id, v, _) => (id, v) }
        .toDF("id", "v").repartition(parts)
      val (asg, cents) = DistributedKMeans.fit(df, "id", "v", k = 3,
        iterations = 4)
      (asg.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy(_._1).toSeq,
        cents.collect().map(_.getSeq[Double](1).toSeq)
          .sortBy(_.mkString(",")).toSeq)
    }
    assert(run(3) === run(8))
  }

  test("a centroid that captures nothing drops out instead of NaN-ing") {
    // two tight far-apart pairs, k=3 with the first three points as
    // init: two seeds start inside the left pair, and after one update
    // the surviving left centroid captures both left points — the
    // starved centroid must vanish from the frame, never divide by zero
    val df = Seq(
      (0L, Array(0.0, 0.0)), (1L, Array(0.1, 0.0)),
      (2L, Array(100.0, 0.0)), (3L, Array(100.1, 0.0)))
      .toDF("id", "v")
    val (asg, cents) = DistributedKMeans.fit(df, "id", "v", k = 3,
      iterations = 3)
    val n = cents.count()
    assert(n >= 1 && n <= 3)
    assert(asg.count() === 4) // every point still assigned
    assert(!asg.collect().exists(r => r.getDouble(2).isNaN))
  }

  test("k-means|| seeding is a pure function of (data, seed) at any " +
      "partitioning") {
    def centers(parts: Int): Seq[(Long, Seq[Double])] = {
      val df = blobs.map { case (id, v, _) => (id, v) }
        .toDF("id", "v").repartition(parts)
      DistributedKMeans.initParallel(df, "id", "v", k = 3, seed = 7L)
        .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toSeq)
        .sortBy(_._1).toSeq
    }
    val a = centers(3)
    assert(a === centers(8))
    assert(a.size === 3)
  }

  test("initParallelMulti is bit-identical to per-k initParallel (the " +
      "grouped seeding contract)") {
    val df = blobs.map { case (id, v, _) => (id, v) }.toDF("id", "v")
    val ks = Seq(2, 3, 4)
    val grouped = DistributedKMeans
      .initParallelMulti(df, "id", "v", ks, seed = 7L)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Double](2).toSeq))
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).sortBy(_._1)
        .toSeq).toMap
    ks.foreach { k =>
      val solo = DistributedKMeans.initParallel(df, "id", "v", k, seed = 7L)
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toSeq))
        .sortBy(_._1).toSeq
      assert(grouped(k) === solo, s"seeding diverged at k=$k")
    }
  }

  test("distributed optimal-k sweep picks the planted k by simplified " +
      "silhouette") {
    val df = blobs.map { case (id, v, _) => (id, v) }.toDF("id", "v")
    val sweep = DistributedKMeans.sweepK(df, "id", "v", ks = Seq(2, 3, 4, 5))
    val best = sweep.maxBy(_._3)._1
    assert(best === 3, s"sweep chose k=$best: $sweep")
    // three tight well-separated blobs: near-perfect silhouette at k=3
    val silAt3 = sweep.find(_._1 == 3).get._3
    assert(silAt3 > 0.8, s"silhouette at k=3 only $silAt3")
    // WSSSE must fall monotonically in k over the swept range (the
    // elbow surface KPolicy consumes)
    val ws = sweep.map(_._2)
    assert(ws === ws.sorted.reverse, s"wssse not decreasing: $sweep")
  }

  test("sweepKReplayable: picks the planted k, falls in WSSSE, and is " +
      "bit-identical across partition counts") {
    def run(parts: Int): Seq[(Int, Double, Double, Boolean)] = {
      val df = blobs.map { case (id, v, _) => (id, v) }
        .toDF("id", "v").repartition(parts)
      DistributedKMeans.sweepKReplayable(df, "id", "v",
          ks = Seq(2, 3, 4), iterations = 3)
        .collect()
        .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2),
          r.getBoolean(3))).toSeq
    }
    val rows = run(3)
    assert(rows.map(_._1) === Seq(2, 3, 4))
    // exactly one winner, and it's the planted k=3
    assert(rows.count(_._4) === 1)
    assert(rows.find(_._4).get._1 === 3, s"chose wrong k: $rows")
    // WSSSE decreasing in k (the elbow surface)
    val ws = rows.map(_._2)
    assert(ws === ws.sorted.reverse, s"wssse not decreasing: $rows")
    // the decimal-sum contract: same numbers at any partitioning
    assert(rows === run(8))
  }

  test("fitMulti is bit-identical to |ks| separate fits (the grouped " +
      "sweep contract)") {
    val df = blobs.map { case (id, v, _) => (id, v) }.toDF("id", "v")
    val ks = Seq(2, 3, 4)
    val (afm, cm) = DistributedKMeans.fitMulti(df, "id", "v", ks,
      iterations = 3)
    val gotC = cm.collect()
      .map(r => ((r.getInt(0), r.getLong(1)), r.getSeq[Double](2).toSeq))
      .toMap
    val gotA = afm.collect()
      .map(r => ((r.getInt(0), r.getLong(1)), (r.getLong(2), r.getDouble(3))))
      .toMap
    ks.foreach { k =>
      val (af, cents) = DistributedKMeans.fit(df, "id", "v", k,
        iterations = 3)
      cents.collect().foreach { r =>
        assert(gotC((k, r.getLong(0))) === r.getSeq[Double](1).toSeq,
          s"centroid diverged at k=$k c=${r.getLong(0)}")
      }
      af.collect().foreach { r =>
        assert(gotA((k, r.getLong(0))) === ((r.getLong(1), r.getDouble(2))),
          s"assignment diverged at k=$k id=${r.getLong(0)}")
      }
      assert(gotC.keys.count(_._1 == k) === cents.count())
    }
  }

  test("fitGrouped is bit-identical to one fit per group (the grouped " +
      "subspace contract)") {
    // two groups = the two coordinate slices of the blobs, each fit
    // with k=2 — the PQ subspace shape
    val df = blobs.map { case (id, v, _) => (id, v) }.toDF("id", "v")
    val sub = df.select(col("id"), explode(array(
        struct(lit(0).as("g"), slice(col("v"), 1, 1).as("v")),
        struct(lit(1).as("g"), slice(col("v"), 2, 1).as("v")))).as("sv"))
      .select(col("sv.g").as("g"), col("id"), col("sv.v").as("v"))
    val inits = df.orderBy(col("id")).limit(2)
      .select(col("id"), col("v"))
      .crossJoin(spark.range(2).select(col("id").cast("int").as("g")))
      .select(col("g"), df("id").as("c"),
        slice(col("v"), col("g") + lit(1), lit(1)).as("cv"))
    val (gaf, gc) = DistributedKMeans.fitGrouped(sub, inits,
      iterations = 3)
    val gotC = gc.collect()
      .map(r => ((r.getInt(0), r.getLong(1)), r.getSeq[Double](2).toSeq))
      .toMap
    val gotA = gaf.collect()
      .map(r => ((r.getInt(0), r.getLong(1)),
        (r.getLong(2), r.getDouble(3)))).toMap
    (0 until 2).foreach { g =>
      val sliced = df.select(col("id"),
        slice(col("v"), g + 1, 1).as("v"))
      val (af, cents) = DistributedKMeans.fit(sliced, "id", "v", k = 2,
        iterations = 3)
      cents.collect().foreach { r =>
        assert(gotC((g, r.getLong(0))) === r.getSeq[Double](1).toSeq,
          s"centroid diverged at g=$g c=${r.getLong(0)}")
      }
      af.collect().foreach { r =>
        assert(gotA((g, r.getLong(0))) === ((r.getLong(1), r.getDouble(2))),
          s"assignment diverged at g=$g id=${r.getLong(0)}")
      }
      assert(gotC.keys.count(_._1 == g) === cents.count())
    }
  }

  test("fitLloydQuantized: first-k-distinct init by lex rank, blob " +
      "recovery, degenerate guard") {
    import graft.ml.LocalKMeans
    // sorted-by-x points: two tight groups; init = positions 1 and 2
    // (first two DISTINCT values), labels are those 1-based ranks
    val pts = Array(
      Array(0.0, 0.0), Array(0.1, 0.0), Array(0.1, 0.0),
      Array(9.9, 1.0), Array(10.0, 1.0))
    val Some((labels, d2s)) = LocalKMeans.fitLloydQuantized(pts, 2, 3)
    assert(labels.toSeq === Seq(1L, 1L, 1L, 2L, 2L))
    assert(d2s.forall(_ < 1.0))
    // <2 distinct points → None (the reference guard)
    assert(LocalKMeans.fitLloydQuantized(
      Array(Array(1.0), Array(1.0)), 2, 3).isEmpty)
  }

  test("runNdReplayable is partition-invariant and covers every " +
      "surviving segment row") {
    val df = blobs.map { case (id, v, blob) =>
      (s"seg${id % 2}", "all", id, v(0), v(1), blob) }
      .toDF("ma", "mi", "id", "x", "y", "blob")
    def run(parts: Int) = graft.engine.ClusterEngine.runNdReplayable(
        df.repartition(parts), "ma", "mi", Seq("x", "y"), "id",
        k = 2, iterations = 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).sortBy(_._3).toSeq
    val a = run(2)
    assert(a.size === 90) // every input row assigned, both segments
    assert(a === run(7))
    // within each segment exactly two cluster labels (k=2, 3 blobs
    // merged into 2 under the fixed-k fit)
    a.groupBy(_._1).values.foreach { g =>
      assert(g.map(_._4).distinct.size === 2)
    }
  }

  test("runGroupedReplayable is partition-invariant, covers every row, " +
      "and each segment equals a direct fit on that segment's scaled " +
      "points") {
    val df = blobs.map { case (id, v, blob) =>
      (s"seg${id % 2}", "all", id, v(0), v(1), blob) }
      .toDF("ma", "mi", "id", "x", "y", "blob")
    def run(parts: Int) = graft.engine.ClusterEngine.runGroupedReplayable(
        df.repartition(parts), "ma", "mi", Seq("x", "y"), "id",
        k = 2, iterations = 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).sortBy(_._3).toSeq
    val a = run(2)
    assert(a.size === 90)
    assert(a === run(7))
    // regime contract: segment seg0 alone, scaled the same way then fit
    // directly with the q158 fit, is bit-identical
    val scaled = graft.preprocess.Scaling.scaleSegments(
      df, "ma", "mi", Seq("x", "y"))
    val seg0 = scaled.filter(col("ma") === "seg0")
      .select(col("id"), array(
        col(graft.preprocess.Scaling.scaledName("x")).cast("double"),
        col(graft.preprocess.Scaling.scaledName("y")).cast("double"))
        .as("v"))
    val (af, _) = DistributedKMeans.fit(seg0, "id", "v", k = 2,
      iterations = 3)
    val direct = af.collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
    a.filter(_._1 == "seg0").foreach { case (_, _, id, c, d2) =>
      assert(direct(id) === ((c, d2)), s"segment fit diverged at id=$id")
    }
  }

  test("bisectOnce splits the largest child and yields three " +
      "consistent, partition-invariant leaves") {
    val df = blobs.map { case (id, v, _) => (id, v) }.toDF("id", "v")
    val out = DistributedKMeans.bisectOnce(df, "id", "v", iterations = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(out.length === 90)
    // exactly three (parent, child) leaves; the split parent carries two
    val leaves = out.map(r => (r._2, r._3)).distinct
    assert(leaves.length === 3, s"leaves=$leaves")
    val byParent = leaves.groupBy(_._1)
    assert(byParent.values.map(_.size).toSeq.sorted === Seq(1, 2))
    // the SPLIT parent was the larger level-1 child: its two leaves
    // together outnumber (or tie) the kept one — 2 blobs vs 1 here
    val sizes = out.groupBy(r => (r._2, r._3)).view.mapValues(_.size)
    val splitParent = byParent.collectFirst {
      case (p, ls) if ls.size == 2 => p }.get
    val splitTotal = sizes.filterKeys(_._1 == splitParent).values.sum
    assert(splitTotal >= 90 - splitTotal)
    // three planted blobs → the three leaves ARE the blobs
    val blobOf = blobs.map(p => p._1 -> p._3).toMap
    out.groupBy(r => (r._2, r._3)).foreach { case (leaf, rows) =>
      assert(rows.map(r => blobOf(r._1)).distinct.size === 1,
        s"leaf $leaf mixes blobs")
    }
    // partition-invariant (the q158 quantization contract end-to-end)
    val re = DistributedKMeans.bisectOnce(
        df.repartition(11), "id", "v", iterations = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(out.sortBy(_._1).toSeq === re.sortBy(_._1).toSeq)
  }

  test("emRoundReplayable responsibilities are valid, move toward the " +
      "planted structure, and are partition-invariant") {
    // two blobs only: component-0 seeds in blob 0, component-1 in blob 1
    val two = blobs.filter(_._3 < 2)
    val df = two.map { case (id, v, _) => (id, v) }.toDF("id", "v")
    val out = graft.ml.DistributedGmm.emRoundReplayable(df, "id", "v")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getInt(3)))
    assert(out.length === two.size)
    assert(out.forall(r => r._2 >= 0 && r._2 <= 1 && r._3 >= 0 && r._3 <= 1))
    // unit-covariance posteriors on well-separated blobs are decisive:
    // assignment equals blob identity (init: id0 ∈ blob0, id1 ∈ blob1)
    val blobOf = two.map(p => p._1 -> p._3).toMap
    out.foreach { case (id, _, _, a) => assert(a === blobOf(id)) }
    val re = graft.ml.DistributedGmm.emRoundReplayable(
        df.repartition(7), "id", "v")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getInt(3)))
    assert(out.sortBy(_._1).toSeq === re.sortBy(_._1).toSeq)
  }

  test("checkpoint cadence bounds the plan like the PageRank cadence") {
    val df = blobs.map { case (id, v, _) => (id, v) }.toDF("id", "v")
    def joins(iters: Int): Int =
      DistributedKMeans.fit(df, "id", "v", k = 3, iterations = iters)
        ._1.queryExecution.optimizedPlan.collect {
          case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
        }.size
    assert(joins(12) === joins(7),
      "plan depth grew with iterations across the cadence boundary")
  }
}

/** The replayable word2vec face behind q191: batch-GD SGNS with md5
  * init/negatives and the quantized-reduction contract — deterministic
  * at any partitioning, and training must IMPROVE the SGNS objective
  * (positive-pair sigmoid rises, negative-pair sigmoid falls). */
class DistributedWord2VecSpec extends GraftSuite {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private def docs = Tables.documents(spark, sf)

  test("bit-identical across partition counts") {
    def run(parts: Int) = graft.ml.DistributedWord2Vec.fitReplayable(
        docs.repartition(parts), "doc_id", "text",
        dim = 8, minCount = 5, rounds = 2, lr = 0.5)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
      .toSeq
    val a = run(3)
    assert(a.nonEmpty && a.size % 8 === 0)
    assert(a === run(11))
  }

  test("training rises the positive-pair sigmoid and sinks the " +
      "negative draw — the SGNS objective actually improves") {
    val w2v = graft.ml.DistributedWord2Vec
    def meanSig(rounds: Int): (Double, Double) = {
      val (u, v, pairs) = w2v.fitMatrices(docs, "doc_id", "text",
        dim = 8, minCount = 5, rounds = rounds, lr = 0.5)
      // matrices are (w, x: array<double>) end-to-end now — just rename
      def vec(m: org.apache.spark.sql.DataFrame, n: String) =
        m.select($"w", $"x".as(n))
      val dot = (a: org.apache.spark.sql.Column,
          b: org.apache.spark.sql.Column) =>
        aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0),
          (acc, x) => acc + x)
      val r = pairs
        .join(vec(u, "uc").select($"w".as("c"), $"uc"), "c")
        .join(vec(v, "vo").select($"w".as("o"), $"vo"), "o")
        .join(vec(v, "vn").select($"w".as("nw"), $"vn"), "nw")
        .agg(
          avg(lit(1.0) / (lit(1.0) + exp(-dot($"uc", $"vo")))).as("p"),
          avg(lit(1.0) / (lit(1.0) + exp(-dot($"uc", $"vn")))).as("n"))
        .head()
      (r.getDouble(0), r.getDouble(1))
    }
    // rounds = 1 vs 2: more training => positives score higher,
    // negatives lower (the loss the GD rounds descend)
    val (p1, n1) = meanSig(1)
    val (p2, n2) = meanSig(2)
    assert(p2 > p1, s"positive sigmoid did not rise: $p1 -> $p2")
    assert(n2 < n1, s"negative sigmoid did not fall: $n1 -> $n2")
  }
}
