package graft

import org.apache.spark.sql.functions._

import graft.engine.{ClusterEngine, EngineConf}

/** Degenerate-input robustness: empty frames, all-identical points,
  * all-null metrics, single segments — no crashes, sensible emptiness. */
class EdgeCaseSpec extends GraftSuite {

  private val conf = EngineConf("ma", "mi", "x", "y",
    fixedK = Some(2), iterNum = 1)

  test("empty input → empty results on both backends") {
    val s = spark
    import s.implicits._
    val empty = Seq.empty[(String, String, Double, Double)]
      .toDF("ma", "mi", "x", "y")
    assert(ClusterEngine.run(empty, conf).count() === 0)
    assert(ClusterEngine.runMl(empty, conf).count() === 0)
  }

  test("all-null metrics → rows dropped, empty results") {
    val s = spark
    import s.implicits._
    val nulls = Seq(("a", "b"), ("a", "b")).toDF("ma", "mi")
      .withColumn("x", lit(null).cast("double"))
      .withColumn("y", lit(null).cast("double"))
    assert(ClusterEngine.run(nulls, conf).count() === 0)
  }

  test("all-identical points in every segment → guard drops them all") {
    val s = spark
    import s.implicits._
    val flat = Seq.fill(20)(("a", "b", 5.0, 7.0)).toDF("ma", "mi", "x", "y")
    assert(ClusterEngine.run(flat, conf).count() === 0)
    assert(ClusterEngine.runMl(flat, conf).count() === 0)
  }

  test("single eligible segment works end to end") {
    val s = spark
    import s.implicits._
    val one = Seq(("a", "b", 1.0, 1.0), ("a", "b", 2.0, 5.0),
      ("a", "b", 9.0, 3.0)).toDF("ma", "mi", "x", "y")
    val r = ClusterEngine.run(one, conf).collect()
    assert(r.length === 1)
    assert(r(0).clusters.map(_.clusterSize).sum === 3)
  }

  test("rows-only registry queries are deterministic across runs (sf0.001)") {
    for (name <- Seq("q33_optimal_k_local", "q36_cluster_bisecting_local",
        "q37_cluster_gmm_local", "q42_multimodal_features",
        "q44_minhash_neardups", "q45_simhash_neardups", "q47_ann_recall",
        "q64_ann_topk", "q66_ivf_recall", "q38_tfidf_norm",
        "q93_pq_recall")) {
      val q = Registry.byName(name)
      val a = q.run(spark, sf).collect().toSeq
      val b = q.run(spark, sf).collect().toSeq
      assert(a === b, s"$name not deterministic")
    }
  }

  test("native as-of with an empty LEFT side returns no rows") {
    val s = spark
    import s.implicits._
    val left = Seq.empty[(Long, Long, Long)].toDF("id", "k", "ts")
    val right = Seq((1L, 1L, "v")).toDF("k", "ts2", "v")
      .withColumnRenamed("k", "k_r")
    val out = graft.plans.NativeAsOf.join(left,
      right.withColumnRenamed("k_r", "k"), Seq("k"), "ts", "ts2")
    assert(out.count() === 0)
  }

  test("z-order handles a constant column (zero span)") {
    val s = spark
    import s.implicits._
    val df = Seq((1.0, 5.0), (2.0, 5.0), (3.0, 5.0)).toDF("x", "y")
    val (withBounds, z) = graft.io.Layout.zvalue(df, Seq("x", "y"))
    // constant column ranks to 0 everywhere; no division by zero
    val zs = withBounds.select(z.as("z")).collect().map(_.getLong(0))
    assert(zs.length === 3 && zs.distinct.length === 3)
  }

  test("capped LSH on an empty corpus → empty candidates, no crash") {
    val s = spark
    import s.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val idx = graft.operators.Dedup.minhashIndex(empty, "doc_id", "text")
    assert(graft.operators.Dedup.lshCandidates(idx, 8, 32).count() === 0)
    assert(graft.operators.Dedup
      .simhashNearDups(empty, "doc_id", "text").count() === 0)
  }

  test("single-token docs: bigram signals defined, redaction no-ops") {
    val s = spark
    import s.implicits._
    val d = Seq((1L, "solo"), (2L, "a b")).toDF("doc_id", "text")
    val rows = d.select($"doc_id",
        graft.functions.TextFunctions.dupBigramFrac($"text").as("f"),
        graft.functions.TextFunctions.topBigramShare($"text").as("t"),
        graft.functions.TextFunctions.redactPii($"text").as("r"))
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2), r.getString(3))).toMap
    assert(rows(1L) === ((0.0, 1.0, "solo"))) // one "bigram" = the token
    assert(rows(2L)._1 === 0.0 && rows(2L)._3 === "a b")
  }

  test("keepCanonical with no duplicate pairs keeps the whole corpus") {
    val s = spark
    import s.implicits._
    val d = Seq((1L, "x y z"), (2L, "p q r")).toDF("doc_id", "text")
    val noPairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(graft.operators.Dedup
      .keepCanonical(d, "doc_id", noPairs).count() === 2)
  }

  test("span dedup degenerate inputs: empty corpus, all-short docs") {
    val s = spark
    import s.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(graft.operators.Dedup.duplicateSpans(empty, "doc_id", "text",
      w = 4).count() === 0)
    assert(graft.operators.Dedup.exciseDuplicateSpans(empty, "doc_id",
      "text", w = 4).count() === 0)
    // every doc shorter than w: no windows, nothing excised
    val short = Seq((1L, "a b"), (2L, "a b")).toDF("doc_id", "text")
    assert(graft.operators.Dedup.duplicateSpans(short, "doc_id", "text",
      w = 4).count() === 0)
    val kept = graft.operators.Dedup.exciseDuplicateSpans(short,
      "doc_id", "text", w = 4)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(kept === Map(1L -> "a b", 2L -> "a b"))
  }

  test("PCA guards: bad k, under-sized corpus, mismatched vectors") {
    val s = spark
    import s.implicits._
    val two = Seq((0L, Seq(1.0, 2.0)), (1L, Seq(3.0, 4.0)))
      .toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      graft.ml.Pca.fit(two, "embedding", dim = 2, k = 3) }
    val one = Seq((0L, Seq(1.0, 2.0))).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      graft.ml.Pca.fit(one, "embedding", dim = 2, k = 1) }
    // a wrong-length vector fails loudly, not silently
    val ragged = Seq((0L, Seq(1.0, 2.0)), (1L, Seq(3.0)))
      .toDF("vec_id", "embedding")
    intercept[Exception] {
      graft.ml.Pca.fit(ragged, "embedding", dim = 2, k = 1) }
  }

  test("PQ trains when sample is smaller than the codebook") {
    val s = spark
    import s.implicits._
    val tiny = Seq((0L, Seq.fill(8)(0.1)), (1L, Seq.fill(8)(0.9)))
      .toDF("vec_id", "embedding")
    val cb = graft.operators.PqIndex.train(tiny, "vec_id", "embedding",
      m = 4, k = 16, seed = 1L)
    assert(cb.m === 4 && cb.centers.forall(_.length <= 2))
    val codes = graft.operators.PqIndex
      .encode(tiny, "vec_id", "embedding", cb).collect()
    assert(codes.length === 2)
  }

  test("replayable ML faces refuse degenerate inputs loudly") {
    val s = spark
    import s.implicits._
    val one = Seq((0L, Seq.fill(4)(0.5))).toDF("id", "v")
    // GMM EM needs two init points
    intercept[IllegalArgumentException] {
      graft.ml.DistributedGmm.emRoundReplayable(one, "id", "v")
    }
    // power iteration: a dim mismatch between the stated dim and the
    // data must fail the mean-vector arity check, not mis-project
    intercept[Exception] {
      graft.ml.Pca.powerIterationTopPc(
        Seq((0L, Seq.fill(4)(0.1)), (1L, Seq.fill(4)(0.9)),
          (2L, Seq.fill(4)(0.4))).toDF("id", "v"),
        "id", "v", dim = 8, iterations = 2)
    }
  }

  test("bisectOnce on two identical points still yields consistent " +
      "leaves") {
    val s = spark
    import s.implicits._
    // 4 points, two coincident pairs: the level-1 split separates the
    // pairs; the chosen child (tie → smaller label) splits into two
    // leaves that may share a centroid — labels must still partition
    // the ids and d2 stay finite
    val df = Seq((0L, Seq(0.0, 0.0)), (1L, Seq(1.0, 1.0)),
      (2L, Seq(0.0, 0.0)), (3L, Seq(1.0, 1.0))).toDF("id", "v")
    val out = graft.ml.DistributedKMeans.bisectOnce(df, "id", "v",
      iterations = 2).collect()
    assert(out.map(_.getLong(0)).sorted === Array(0L, 1L, 2L, 3L))
    assert(out.forall(r => !r.getDouble(3).isNaN &&
      !r.getDouble(3).isInfinite))
  }
}
