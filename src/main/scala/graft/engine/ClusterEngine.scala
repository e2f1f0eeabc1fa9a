package graft.engine

import org.apache.spark.ml.clustering.{BisectingKMeans, GaussianMixture, KMeans}
import org.apache.spark.ml.evaluation.ClusteringEvaluator
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import scala.util.Random
import scala.util.hashing.MurmurHash3

import graft.ksearch.KPolicy
import graft.ml.{LocalKMeans, LocalMetrics}
import graft.preprocess.Scaling

/** The clustering engine — reproduces the reference pipeline
  * (`/root/reference/scripts/cluster.py:98-170` + `optimal_k.py:103-192`)
  * with two execution backends:
  *
  *  - [[run]] (default, 100 TB path): segment in ONE shuffle via
  *    `groupByKey(macro, micro).flatMapGroups` and fit each segment with
  *    the in-JVM seed-deterministic [[LocalKMeans]]. Replaces the
  *    reference's O(#segments) `distinct().collect()` + filtered-scan job
  *    storm (`scripts/preprocess.py:114-170`) — segment count can be in
  *    the millions and the plan is still scan → shuffle → map.
  *
  *  - [[runMl]] (parity path): one `spark.ml` fit per segment, for runs
  *    with FEW, HUGE segments where a single segment itself needs the
  *    cluster. Architecturally the reference's shape, minus its
  *    per-metric job storms (entropy/radius/centers are each one
  *    aggregation here).
  *
  * Reference quirks preserved: seed search keeps the FIRST strictly-best
  * silhouette (`optimal_k.py:46`); radius = sqrt(max sqdist); silhouette
  * = squared-Euclidean with 0.0 fallback for <2 labels; ≥2-distinct-points
  * guard drops degenerate segments (`cluster.py:115-119`); GMM "centers"
  * are per-cluster data means, not gaussian means (`metrics.py:32-54`).
  */
object ClusterEngine extends Serializable {

  /** Deterministic per-segment RNG: same (seed, segment) → same seeds
    * regardless of partitioning or arrival order. */
  private def segmentRng(conf: EngineConf, ma: String, mi: String): Random =
    new Random(conf.seed ^ (MurmurHash3.stringHash(s"$ma|$mi").toLong << 17))

  /** Value hash of a point (xxhash64-style avalanche over the raw double
    * bits, mixed with the seed) — the ranking key for [[capDeterministic]].
    * Depends only on the point VALUES and the seed, never on position. */
  private[graft] def pointHash(p: Array[Double], seed: Long): Long = {
    var h = seed ^ 0x9E3779B97F4A7C15L
    var i = 0
    while (i < p.length) {
      h ^= java.lang.Double.doubleToLongBits(p(i)) * 0xC2B2AE3D27D4EB4FL
      h = java.lang.Long.rotateLeft(h, 31) * 0x9E3779B185EBCA87L
      i += 1
    }
    h ^= h >>> 33; h *= 0xFF51AFD7ED558CCDL; h ^= h >>> 33
    h
  }

  /** Lexicographic point compare (hash tie-break; ties between IDENTICAL
    * points are harmless — the retained multiset is the same either way). */
  private[graft] def lexCompare(a: Array[Double], b: Array[Double]): Int = {
    var i = 0
    while (i < a.length && i < b.length && a(i) == b(i)) i += 1
    if (i < a.length && i < b.length) java.lang.Double.compare(a(i), b(i))
    else Integer.compare(a.length, b.length)
  }

  /** Deterministic per-segment down-sample: keep the `maxPts` points with
    * the smallest `(pointHash, lexicographic)` key, via a bounded max-heap
    * over the streaming iterator — O(n log maxPts) time, O(maxPts) memory.
    *
    * The selection is a pure function of (point values, seed): unlike the
    * naive `it.take(maxPts)` (which keeps whatever arrived first and so
    * made over-cap segments depend on the input partitioning), the same
    * multiset of points yields the same retained subset no matter how the
    * rows were partitioned or ordered. This is what makes the engine's
    * partition-invariance guarantee hold ABOVE the cap, not just below it.
    */
  private[graft] def capDeterministic(it: Iterator[Array[Double]],
      maxPts: Int, seed: Long): Array[Array[Double]] = {
    require(maxPts > 0, s"maxPointsPerSegment must be positive, got $maxPts")
    val ord = new Ordering[(Long, Array[Double])] {
      def compare(x: (Long, Array[Double]), y: (Long, Array[Double])): Int = {
        val c = java.lang.Long.compare(x._1, y._1)
        if (c != 0) c else lexCompare(x._2, y._2)
      }
    }
    // max-heap on the key: head is the current worst keeper
    val heap = new scala.collection.mutable.PriorityQueue[(Long, Array[Double])]()(ord)
    while (it.hasNext) {
      val p = it.next()
      if (heap.size < maxPts) heap.enqueue((pointHash(p, seed), p))
      else {
        val h = pointHash(p, seed)
        if (h <= heap.head._1) { // cheap reject: most rows fail this once full
          val key = (h, p)
          if (ord.compare(key, heap.head) < 0) { heap.dequeue(); heap.enqueue(key) }
        }
      }
    }
    heap.iterator.map(_._2).toArray
  }

  private def nextSeed(rnd: Random): Long =
    (rnd.nextInt(Int.MaxValue - 1) + 1).toLong // mirrors np.random.randint(1, 2^31-1)

  // ---------------------------------------------------------------- local

  private def localFit(points: Array[Array[Double]], k: Int, alg: String,
      seed: Long): LocalKMeans.Model = alg match {
    case "BisectingKMeans" => LocalKMeans.fitBisecting(points, k, seed)
    case "GaussianMixture" => graft.ml.LocalGMM.fit(points, k, seed)
    case _                 => LocalKMeans.fit(points, k, seed)
  }

  /** Seed search (`optimal_k.py:16-72`): iterNum random seeds, keep the
    * first strictly-best silhouette. */
  private def optimalLocalModel(points: Array[Array[Double]], k: Int,
      conf: EngineConf, rnd: Random): (LocalKMeans.Model, Double) = {
    var bestSil = -1.0
    var best: LocalKMeans.Model = null
    for (_ <- 0 until conf.iterNum) {
      val m = localFit(points, k, conf.algorithm, nextSeed(rnd))
      val sil = LocalMetrics.silhouette(points, m.labels)
      if (sil > bestSil) { bestSil = sil; best = m }
    }
    (best, bestSil)
  }

  /** k-sweep + selection policy (`optimal_k.py:103-192`) run locally
    * inside the segment's task. */
  private def searchK(points: Array[Array[Double]], conf: EngineConf,
      rnd: Random): Int = {
    val distinctN = LocalKMeans.distinctPoints(points).length
    val stop = math.min(conf.stopK, math.max(conf.startK, distinctN))
    var wssse = Map.empty[Int, Double]
    var sils = List.empty[KPolicy.KScore]
    for (k <- conf.startK to stop) {
      val (m, sil) = optimalLocalModel(points, k, conf, rnd)
      wssse += k -> m.cost(points)
      sils = KPolicy.KScore(k, sil) :: sils
    }
    if (sils.isEmpty) return conf.startK
    if (conf.startK == stop) return conf.startK
    val (k, _) = KPolicy.optimalK(wssse, sils.reverse,
      conf.algorithm == "GaussianMixture", conf.startK, stop,
      conf.silhouetteThreshold)
    k
  }

  /** Thresholded seed search (`optimal_k.py:75-100`): retry fresh seeds
    * until the silhouette reaches oldSilhouette·threshold or the retry
    * budget runs out, keeping the best model seen. Unlike the reference
    * (which can return no model when oldSilhouette ≤ 0 — a latent crash),
    * at least one fit always happens. */
  private def thresholdedModel(points: Array[Array[Double]], k: Int,
      conf: EngineConf, rnd: Random,
      oldSil: Double): (LocalKMeans.Model, Double) = {
    var iter = conf.thresholdedIterNum
    var bestSil = -1.0
    var best: LocalKMeans.Model = null
    var sil = 0.0
    var first = true
    while (first || (iter > 0 && sil < oldSil * conf.oldSilhouetteThreshold)) {
      first = false
      val m = localFit(points, k, conf.algorithm, nextSeed(rnd))
      sil = LocalMetrics.silhouette(points, m.labels)
      if (sil > bestSil) { bestSil = sil; best = m }
      iter -= 1
    }
    (best, bestSil)
  }

  private def segmentResult(ma: String, mi: String,
      points: Array[Array[Double]], conf: EngineConf,
      kOverride: Option[KEntry]): Option[SegmentResult] = {
    // ≥2-distinct guard (cluster.py:115-119 / optimal_k.py:297)
    if (points.length < 2 ||
      LocalKMeans.distinctPoints(points).length < 2) return None
    val rnd = segmentRng(conf, ma, mi)
    // cached-k fast path with quality re-check (cluster.py:98-136):
    // cluster with the cached k via the thresholded seed search (M8); if
    // quality degraded below oldSilhouette·threshold, re-derive k and
    // re-cluster (M11). No cache → k-search (or fixedK) + plain search.
    val (model, sil) = kOverride match {
      case Some(KEntry(cachedK, oldSil)) =>
        val (m0, s0) = thresholdedModel(points, cachedK, conf, rnd, oldSil)
        if (s0 < oldSil * conf.oldSilhouetteThreshold) {
          val newK = conf.fixedK.getOrElse(searchK(points, conf, rnd))
          optimalLocalModel(points, newK, conf, rnd)
        } else (m0, s0)
      case None =>
        val k = conf.fixedK.getOrElse(searchK(points, conf, rnd))
        optimalLocalModel(points, k, conf, rnd)
    }
    val byCluster = model.labels.zipWithIndex.groupBy(_._1)
    val clusters = byCluster.toSeq.sortBy(_._1).map { case (c, members) =>
      val pts = members.map(m => points(m._2))
      ClusterInfo(c, model.centers(c).toSeq, members.length.toLong,
        LocalMetrics.radius(pts, model.centers(c)))
    }
    val ent = LocalMetrics.entropy(clusters.map(_.clusterSize))
    Some(SegmentResult(ma, mi, conf.algorithm, clusters.size, sil, ent,
      clusters))
  }

  /** Scalable backend: all segments clustered in one shuffle.
    *
    * `kStore` (optional) is the cached-k broadcast replacing the
    * reference's per-segment Mongo `find_one` (S6, `cluster.py:19-41`);
    * misses fall through to the in-task k-search, exactly like the
    * reference's recompute-on-miss (`cluster.py:105-109`).
    */
  def run(df: DataFrame, conf: EngineConf,
      kStore: Map[(String, String), KEntry] = Map.empty): Dataset[SegmentResult] =
    runNd(df, conf, Seq(conf.xCol, conf.yCol), kStore)

  /** n-dimensional variant of [[run]]: cluster on ANY number of metric
    * columns (the local kernels — k-means++/Lloyd, bisecting, GMM EM,
    * silhouette/entropy/radius — are dimension-agnostic; the reference's
    * 2-column shape is just its config convention). */
  def runNd(df: DataFrame, conf: EngineConf, metricCols: Seq[String],
      kStore: Map[(String, String), KEntry] = Map.empty): Dataset[SegmentResult] = {
    require(metricCols.nonEmpty, "need at least one metric column")
    val spark = df.sparkSession
    import spark.implicits._
    val scaled = Scaling.scaleSegments(df, conf.macroCol, conf.microCol,
      metricCols, conf.dontScale)
    val vec = array(metricCols.map(c =>
      col(Scaling.scaledName(c)).cast("double")): _*)
    val kStoreB = spark.sparkContext.broadcast(kStore)
    val maxPts = conf.maxPointsPerSegment
    val seed = conf.seed
    scaled.select(
        col(conf.macroCol).cast("string"),
        col(conf.microCol).cast("string"),
        vec.as("v"))
      .as[(String, String, Seq[Double])]
      .groupByKey(t => (t._1, t._2))
      .flatMapGroups { (key: (String, String),
          it: Iterator[(String, String, Seq[Double])]) =>
        val (ma, mi) = key
        // Deterministic cap (selection by value-hash, not arrival order),
        // then sort in-task (lexicographic over all dims): groupByKey
        // iterator order depends on the input partitioning, and k-means++
        // init is order-sensitive — cap + sort together make results
        // invariant to how the data arrived, including above the cap.
        val pts = capDeterministic(it.map(_._3.toArray), maxPts, seed)
          .sortWith(lexCompare(_, _) < 0)
        segmentResult(ma, mi, pts, conf, kStoreB.value.get((ma, mi))).iterator
      }
  }

  /** The HUGE-SEGMENT regime (q205): per-segment k-means where a single
    * segment is too large to collect into one task ([[run]]'s
    * `flatMapGroups` needs the segment in executor memory) and the
    * segments too few to amortize one spark.ml job each ([[runMl]]).
    * Built on [[graft.ml.DistributedKMeans.fitGrouped]]: the segment
    * key is the Lloyd group, so every round is ONE scan + ONE shuffle
    * for ALL segments and no row is ever collected — the third point
    * of the segmentation design space (many-small → [[run]], few-huge
    * → THIS, midpoints → [[runMl]]). The centroid frame it broadcasts
    * per round is segments × k rows — right for the few-huge regime
    * this serves, wrong for a million tiny segments (that's [[run]]).
    *
    * Fully replayable (the q158 contract per segment: init = each
    * segment's first k points by id, fixed rounds, 6-dp centroid
    * quantization, d2/cluster-id argmin tie-break), so DuckDB replays
    * scaling + init + every round + every final assignment. Same
    * three-way scaling front door as [[runNdReplayable]]. Returns
    * (ma, mi, id, cluster, d2) — cluster = the init point's id. */
  def runGroupedReplayable(df: DataFrame, macroCol: String,
      microCol: String, metricCols: Seq[String], idCol: String, k: Int,
      iterations: Int): DataFrame = {
    require(metricCols.nonEmpty, "need at least one metric column")
    require(k >= 1, "k must be >= 1")
    val scaled = Scaling.scaleSegments(df, macroCol, microCol, metricCols)
    val vec = array(metricCols.map(c =>
      col(Scaling.scaledName(c)).cast("double")): _*)
    val pts = scaled.select(
      struct(col(macroCol).cast("string").as("ma"),
        col(microCol).cast("string").as("mi")).as("g"),
      col(idCol).cast("long").as("id"), vec.as("v"))
    // per-segment first-k-by-id init: one window pass (hash by segment,
    // sort by id within) — the only per-segment ordering the fit needs
    val inits = pts
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("g")).orderBy(col("id"))))
      .filter(col("rn") <= k)
      .select(col("g"), col("id").as("c"), col("v").as("cv"))
    val (af, _) = graft.ml.DistributedKMeans.fitGrouped(pts, inits,
      iterations, checkpointFinal = false)
    af.select(col("g.ma").as("ma"), col("g.mi").as("mi"), col("id"),
      col("cluster"), col("d2"))
  }

  /** The REPLAYABLE slice through the segmentation path (q190) — G1/G2's
    * oracle-able face: the SAME one-shuffle pipeline as [[runNd]]
    * (per-segment three-way scaling → `groupByKey.flatMapGroups` →
    * in-task lexicographic sort → local fit), but with the seeded
    * k-means++ kernel swapped for [[LocalKMeans.fitLloydQuantized]]
    * (first-k-distinct init labelled by lex rank, fixed rounds, 6-dp
    * HALF_UP centroid quantization) so every per-point assignment is
    * relationally verifiable. The production path ([[run]]/[[runNd]])
    * keeps its seed-search semantics; THIS face pins scaling +
    * segmentation + sort + Lloyd in one green row. Segments with <2
    * distinct points drop (the reference guard). Returns (ma, mi, id,
    * cluster, d2) — cluster = the init point's 1-based lex rank. */
  def runNdReplayable(df: DataFrame, macroCol: String, microCol: String,
      metricCols: Seq[String], idCol: String, k: Int,
      iterations: Int): DataFrame = {
    require(metricCols.nonEmpty, "need at least one metric column")
    val spark = df.sparkSession
    import spark.implicits._
    val scaled = Scaling.scaleSegments(df, macroCol, microCol, metricCols)
    val vec = array(metricCols.map(c =>
      col(Scaling.scaledName(c)).cast("double")): _*)
    scaled.select(
        col(macroCol).cast("string"),
        col(microCol).cast("string"),
        col(idCol).cast("long"),
        vec.as("v"))
      .as[(String, String, Long, Seq[Double])]
      .groupByKey(t => (t._1, t._2))
      .flatMapGroups { (key: (String, String),
          it: Iterator[(String, String, Long, Seq[Double])]) =>
        // total in-task order: lexicographic on the scaled vector, id
        // tie-break — the SQL replay's row_number(ORDER BY x, y, id)
        val rows = it.map(t => (t._3, t._4.toArray)).toArray
          .sortWith { (a, b) =>
            val c = lexCompare(a._2, b._2)
            if (c != 0) c < 0 else a._1 < b._1
          }
        LocalKMeans.fitLloydQuantized(rows.map(_._2), k, iterations) match {
          case None => Iterator.empty
          case Some((labels, d2s)) =>
            rows.indices.iterator.map { i =>
              (key._1, key._2, rows(i)._1, labels(i), d2s(i))
            }
        }
      }
      .toDF("ma", "mi", "id", "cluster", "d2")
  }

  // ------------------------------------------------------------- spark.ml

  private def mlFit(df: DataFrame, k: Int, alg: String, seed: Long,
      maxIter: Option[Int]) = {
    val model = alg match {
      case "KMeans" =>
        val km = new KMeans().setFeaturesCol("features").setK(k).setSeed(seed)
        maxIter.foreach(km.setMaxIter)
        km.fit(df)
      case "BisectingKMeans" =>
        val bk = new BisectingKMeans().setFeaturesCol("features").setK(k)
          .setSeed(seed)
        maxIter.foreach(bk.setMaxIter)
        bk.fit(df)
      case "GaussianMixture" =>
        val gm = new GaussianMixture().setFeaturesCol("features").setK(k)
          .setSeed(seed)
        maxIter.foreach(gm.setMaxIter)
        gm.fit(df)
      case other => throw new IllegalArgumentException(s"algorithm: $other")
    }
    model.asInstanceOf[org.apache.spark.ml.Model[_]]
  }

  private def mlTransform(model: org.apache.spark.ml.Model[_],
      df: DataFrame): DataFrame =
    model.transform(df).asInstanceOf[DataFrame]

  /** Silhouette with the reference's <2-distinct-labels → 0.0 guard
    * (`metrics.py:140-148`). */
  private def mlSilhouette(predictions: DataFrame): Double = {
    val nLabels = predictions.select("prediction").distinct().count()
    if (nLabels < 2) 0.0
    else new ClusteringEvaluator()
      .setPredictionCol("prediction").setFeaturesCol("features")
      .evaluate(predictions)
  }

  /** Parity backend: per-segment spark.ml fits. Segment keys are collected
    * to the driver (keys only, never data rows) — intended for runs with
    * few, large segments.
    */
  def runMl(df: DataFrame, conf: EngineConf): Dataset[SegmentResult] = {
    val spark = df.sparkSession
    import spark.implicits._
    val xs = Scaling.scaledName(conf.xCol)
    val ys = Scaling.scaledName(conf.yCol)
    val scaled = Scaling.scaleSegments(df, conf.macroCol, conf.microCol,
      Seq(conf.xCol, conf.yCol), conf.dontScale)
      .select(col(conf.macroCol).cast("string").as("__macro"),
        col(conf.microCol).cast("string").as("__micro"),
        col(xs).cast("double").as(xs), col(ys).cast("double").as(ys))
    val assembled = new VectorAssembler().setInputCols(Array(xs, ys))
      .setOutputCol("features").transform(scaled)
      .persist() // reused by every segment fit below
    try {
      // M12 guard for ALL segments in one aggregation (the reference runs
      // one distinct().count() job per segment; this is a single job)
      val keys = assembled.groupBy($"__macro", $"__micro")
        .agg(countDistinct(struct(col(xs), col(ys))).as("nd"))
        .as[(String, String, Long)].collect().sortBy(t => (t._1, t._2))
      val results = keys.toSeq.collect {
        case (ma, mi, nd) if nd >= 2 =>
          val seg = assembled.filter($"__macro" === ma && $"__micro" === mi)
          mlSegmentResult(seg, ma, mi, conf, xs, ys, nd)
      }.flatten
      spark.createDataset(results)
    } finally assembled.unpersist()
  }

  private def mlSegmentResult(seg: DataFrame, ma: String, mi: String,
      conf: EngineConf, xs: String, ys: String,
      distinctPts: Long): Option[SegmentResult] = {
    val spark = seg.sparkSession
    import spark.implicits._
    val rnd = segmentRng(conf, ma, mi)
    val k0 = conf.fixedK.getOrElse(conf.startK)
    val kEff = math.min(k0, distinctPts.toInt)
    // seed search (optimal_k.py:16-72)
    var bestSil = -1.0
    var bestPred: DataFrame = null
    var bestModel: org.apache.spark.ml.Model[_] = null
    for (_ <- 0 until conf.iterNum) {
      val m = mlFit(seg, kEff, conf.algorithm, nextSeed(rnd), conf.mlMaxIter)
      val pred = mlTransform(m, seg)
      val sil = mlSilhouette(pred)
      if (sil > bestSil) { bestSil = sil; bestPred = pred; bestModel = m }
    }
    val pred = bestPred.persist()
    try {
      // A4/A5/A6 as single aggregations (not the reference's k+1 jobs):
      // per-cluster count + data-mean; centers for KMeans/BKM come from the
      // model, for GMM from the data means (reference semantics).
      val modelCenters: Map[Int, Array[Double]] = bestModel match {
        case km: org.apache.spark.ml.clustering.KMeansModel =>
          km.clusterCenters.zipWithIndex.map { case (v, i) => i -> v.toArray }.toMap
        case bk: org.apache.spark.ml.clustering.BisectingKMeansModel =>
          bk.clusterCenters.zipWithIndex.map { case (v, i) => i -> v.toArray }.toMap
        case _ => Map.empty
      }
      val stats = pred.groupBy($"prediction")
        .agg(count(lit(1)).as("n"), avg(col(xs)).as("mx"), avg(col(ys)).as("my"))
        .collect()
        .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
        .toMap
      val centers: Map[Int, Array[Double]] = stats.map { case (c, (_, mx, my)) =>
        c -> modelCenters.getOrElse(c, Array(mx, my))
      }
      // radius: one pass over predictions with a per-cluster center lookup
      val centerRows = centers.toSeq.map { case (c, arr) => (c, arr(0), arr(1)) }
      val centersDf = spark.createDataset(centerRows).toDF("prediction", "cx", "cy")
      val radii = pred.join(broadcast(centersDf), "prediction")
        .groupBy($"prediction")
        .agg(max(pow(col(xs) - $"cx", 2) + pow(col(ys) - $"cy", 2)).as("maxSq"))
        .collect().map(r => r.getInt(0) -> math.sqrt(r.getDouble(1))).toMap
      val clusters = stats.toSeq.sortBy(_._1).map { case (c, (n, _, _)) =>
        ClusterInfo(c, centers(c).toSeq, n, radii.getOrElse(c, 0.0))
      }
      val ent = LocalMetrics.entropy(clusters.map(_.clusterSize))
      Some(SegmentResult(ma, mi, conf.algorithm, clusters.size, bestSil, ent,
        clusters))
    } finally pred.unpersist()
  }
}
