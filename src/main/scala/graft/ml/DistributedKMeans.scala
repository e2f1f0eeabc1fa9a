package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Whole-corpus Lloyd's k-means as pure DataFrame algebra — the
  * 100 TB complement to [[LocalKMeans]] (which collects a SEGMENT's
  * points to the driver and is the right tool when segments are small
  * and numerous). Here nothing is ever collected: per round,
  * assignment is a broadcast join of the points against the k-row
  * centroid frame and the update is ONE aggregation of (cluster, dim)
  * partial means — the same shuffle key every round.
  *
  * Determinism contract (what makes the fit oracle-able, q158):
  *  - init is explicit (caller-supplied frame or the first k points by
  *    id) — no seeded sampling;
  *  - every centroid coordinate is re-quantized to `roundDp` decimals
  *    at each round boundary, so the one order-sensitive reduction
  *    (the mean) cannot leak partition-order FP wobble into the next
  *    round: any two runs — or two engines — agree bit-for-bit on the
  *    quantized centroids;
  *  - argmin ties break on cluster id (min_by on the (d2, c) struct).
  *
  * Lineage: a fixed unroll builds one join+agg per round; past
  * `checkpointEvery` rounds the centroid frame is localCheckpoint'ed,
  * the PageRank cadence reasoning ([[graft.operators.Graph]]) applied
  * to the k-row frame — cheap at any k, and the plan depth stays
  * bounded by the cadence window.
  */
object DistributedKMeans {

  /** Squared L2 between two array<double> columns as the textbook
    * zip_with/aggregate fold — rewritten to the fused native kernel by
    * [[graft.expressions.L2Fusion]] when the rule is ensured. */
  private def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)

  /** Fit: returns (assignments, centroids) where assignments =
    * (id, cluster, d2) for every input row against the FINAL centroids
    * and centroids = (c, cv) after `iterations` rounds.
    *
    * `points` must carry (`idCol`: long-castable, `vecCol`:
    * array<double>). `init` defaults to the first k points by id — the
    * explicit, replayable choice; pass a frame (c, cv) for k-means++
    * or any other seeding computed elsewhere. */
  def fit(points: DataFrame, idCol: String, vecCol: String, k: Int,
      iterations: Int, init: Option[DataFrame] = None,
      roundDp: Int = 6, checkpointEvery: Int = 5)
      : (DataFrame, DataFrame) = {
    require(k >= 1, "k must be >= 1")
    require(iterations >= 1, "iterations must be >= 1")
    require(checkpointEvery >= 1, "checkpointEvery must be >= 1")
    val spark = points.sparkSession
    org.apache.spark.sql.GraftExprBridge.ensureOptimization(spark,
      graft.expressions.L2Fusion)
    val vecs = points
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
    val c0 = init.getOrElse {
      // first k by id: explicit and replayable (SQL: WHERE id < kth id)
      vecs.orderBy(col("id")).limit(k)
        .select(col("id").as("c"), col("v").as("cv"))
    }
    var cents = c0
    for (iter <- 1 to iterations) {
      cents = vecs.crossJoin(broadcast(cents))
        .withColumn("d2", sqDist(col("v"), col("cv")))
        .groupBy(col("id"))
        .agg(min_by(struct(col("c"), col("v")),
          struct(col("d2"), col("c"))).as("a"))
        .select(col("a.c").as("c"), posexplode(col("a.v")).as(Seq("p", "x")))
        .groupBy(col("c"), col("p"))
        .agg(round(avg(col("x")), roundDp).as("m"))
        .groupBy(col("c"))
        .agg(array_sort(collect_list(struct(col("p"), col("m")))).as("pm"))
        .select(col("c"), transform(col("pm"), e => e.getField("m")).as("cv"))
      if (iter % checkpointEvery == 0 && iter < iterations)
        cents = cents.localCheckpoint(true)
    }
    val assignments = vecs.crossJoin(broadcast(cents))
      .withColumn("d2", sqDist(col("v"), col("cv")))
      .groupBy(col("id"))
      .agg(min_by(struct(col("c"), col("d2")),
        struct(col("d2"), col("c"))).as("a"))
      .select(col("id"), col("a.c").as("cluster"), col("a.d2").as("d2"))
    (assignments, cents)
  }

  /** One REPLAYABLE bisecting step — the distributed, oracle-able face
    * of the reference's BisectingKMeans family ([[LocalKMeans
    * .fitBisecting]] stays the per-segment production path): fit k=2 on
    * the full input (init = first two points by id, `iterations`
    * unrolled Lloyd rounds under the q158 quantization contract), pick
    * the LARGEST child (count desc, cluster-id asc — fitBisecting's
    * largest-splittable rule made total), then fit k=2 on that child's
    * members (init = its first two members by id). Output: (id, parent,
    * child, d2) — parent = the level-1 label, child = the final leaf
    * label within it (= parent for the unsplit cluster), d2 = squared
    * distance to the final centroid. The (parent, child) PAIR is the
    * leaf key: labels are init-point ids, which can collide across
    * levels. Only bounded artifacts reach the driver (a 2-row count). */
  def bisectOnce(points: DataFrame, idCol: String, vecCol: String,
      iterations: Int = 3, roundDp: Int = 6): DataFrame = {
    // persisted: the two fits + the selection + the member join scan
    // this frame ~2·(iterations+1) times — at these widths the cache is
    // a clear win and changes nothing numerically (quantized contract)
    val vecs = points
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .persist()
    val (a1u, _) = fit(vecs, "id", "v", k = 2, iterations = iterations,
      roundDp = roundDp)
    val a1 = a1u.persist()
    val chosen = a1.groupBy(col("cluster"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("cluster"))
      .limit(1).collect()(0).getLong(0)
    val sub = vecs.join(
      a1.filter(col("cluster") === chosen).select("id"), "id")
    val (a2, _) = fit(sub, "id", "v", k = 2, iterations = iterations,
      roundDp = roundDp)
    val out = a1.filter(col("cluster") =!= chosen)
      .select(col("id"), col("cluster").as("parent"),
        col("cluster").as("child"), col("d2"))
      .unionByName(a2.select(col("id"), lit(chosen).as("parent"),
        col("cluster").as("child"), col("d2")))
    out.unpersist()
    val res = out.persist()
    res.count()
    a1.unpersist()
    vecs.unpersist()
    res
  }

  /** k-means|| (Bahmani et al., VLDB'12) seeding, fully distributed and
    * DETERMINISTIC: instead of k sequential k-means++ draws (k driver
    * round-trips, unusable at 100 TB), each of `rounds` passes samples
    * every point independently with probability min(1, oversample·d²/
    * cost) — the d²-weighting that gives the k-means++ guarantee, but
    * one shuffle per round. Randomness is seeded xxhash64 uniforms, so
    * the chosen candidate set is a pure function of (data, seed) — same
    * on every run and every partitioning. The bounded candidate set
    * (≈ rounds·oversample, NOT data-sized) is then weighted by how many
    * points it attracts and reduced to k centers driver-side with a
    * deterministic greedy weighted farthest-point pass (max-weight
    * start, weighted-d² farthest next, ids break ties) — the standard
    * KMeans|| finisher shape with the RNG replaced by argmax. */
  def initParallel(points: DataFrame, idCol: String, vecCol: String,
      k: Int, seed: Long, rounds: Int = 2, oversampleFactor: Int = 2)
      : DataFrame = {
    require(k >= 1 && rounds >= 1)
    val spark = points.sparkSession
    import spark.implicits._
    val vecs = points
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
    val l = (oversampleFactor.toLong * k).toDouble
    // start from the minimum seeded-hash point: arbitrary but pure.
    // The candidate set stays a COLLECTED local relation throughout —
    // it is bounded (≈ rounds·oversample·k rows), each round's cross
    // join broadcasts it, and keeping it local avoids a lineage chain
    // and a driver action per round beyond the unavoidable cost sum.
    var centers: Seq[(Long, Seq[Double])] = vecs
      .orderBy(xxhash64(col("id"), lit(seed)), col("id")).limit(1)
      .select(col("id").as("c"), col("v").as("cv"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
    for (r <- 1 to rounds) {
      val centersDf = broadcast(centers.toDF("c", "cv"))
      val d2min = vecs.crossJoin(centersDf)
        .withColumn("d2", sqDist(col("v"), col("cv")))
        .groupBy(col("id")).agg(min(col("d2")).as("d2"),
          first(col("v")).as("v"))
      // uniform in [0,1) from the top 53 bits of the seeded hash; the
      // cost sum rides the same pass via a window-free global agg
      val u = shiftrightunsigned(
        xxhash64(col("id"), lit(seed + r)), 11)
        .cast("double") / lit(9007199254740992.0)
      val chosen = d2min
        .crossJoin(broadcast(d2min.agg(sum(col("d2")).as("cost"))))
        .filter(col("cost") > 0 &&
          u < least(lit(1.0), lit(l) * col("d2") / col("cost")))
        .select(col("id"), col("v"))
        .collect().map(row => (row.getLong(0), row.getSeq[Double](1)))
      centers = (centers ++ chosen).distinctBy(_._1).sortBy(_._1)
    }
    // weight candidates by attraction, reduce to k deterministically
    val weightRows = vecs.crossJoin(broadcast(centers.toDF("c", "cv")))
      .withColumn("d2", sqDist(col("v"), col("cv")))
      .groupBy(col("id"))
      .agg(min_by(col("c"), struct(col("d2"), col("c"))).as("c"))
      .groupBy(col("c")).agg(count(lit(1)).as("w"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cand = centers
      .map { case (c, cv) =>
        (c, cv.toArray, weightRows.getOrElse(c, 0L))
      }
      .sortBy(_._1)
    val picked = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Array[Double])]
    if (cand.nonEmpty) {
      def d2(a: Array[Double], b: Array[Double]): Double = {
        var s = 0.0; var i = 0
        while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
        s
      }
      // max weight first (id-asc tie-break via stable sorted input)
      picked += { val m = cand.maxBy(_._3); (m._1, m._2) }
      while (picked.size < math.min(k, cand.size)) {
        val next = cand
          .filterNot(c => picked.exists(_._1 == c._1))
          .maxBy { c =>
            (c._3.toDouble * picked.map(p => d2(c._2, p._2)).min, -c._1)
          }
        picked += ((next._1, next._2))
      }
    }
    picked.toSeq.map { case (c, cv) => (c, cv.toSeq) }.toDF("c", "cv")
  }

  /** Simplified silhouette of an assignment (Hruschka et al.): per
    * point, a = distance to its OWN centroid, b = distance to the
    * nearest OTHER centroid, s = (b − a)/max(a, b); the corpus score
    * is the mean. O(n·k) — centroid distances instead of pairwise —
    * which is what makes silhouette usable at corpus scale; the
    * driver-side [[LocalMetrics.silhouette]] stays the per-segment
    * exact tool. Returns NaN-free 0 for k = 1 (the <2-labels guard the
    * reference applies). */
  def simplifiedSilhouette(points: DataFrame, idCol: String,
      vecCol: String, centroids: DataFrame): Double = {
    val spark = points.sparkSession
    if (centroids.count() < 2) return 0.0
    val vecs = points
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
    val row = vecs.crossJoin(broadcast(centroids))
      .withColumn("d", sqrt(sqDist(col("v"), col("cv"))))
      .groupBy(col("id"))
      .agg(min(col("d")).as("a"),
        sort_array(collect_list(col("d"))).getItem(1).as("b"))
      // a = nearest centroid (own, by definition of the assignment);
      // b = second-nearest = nearest OTHER
      .select(avg(when(greatest(col("a"), col("b")) > 0,
        (col("b") - col("a")) / greatest(col("a"), col("b")))
        .otherwise(lit(0.0))).as("s"))
      .head()
    if (row.isNullAt(0)) 0.0 else row.getDouble(0)
  }

  /** The REPLAYABLE k-sweep — M9/A9's oracle-able face (q189): fit
    * every k under the q158 determinism contract (first-k-by-id init,
    * fixed unrolled rounds, 6-dp centroid quantization), score each fit
    * with WSSSE and the simplified silhouette, and apply the selection
    * policy (max silhouette, smaller k on ties) — the n-way
    * generalization of [[bisectOnce]]'s 2-way choice, with every number
    * relationally verifiable. The seeded-k-means|| production sweep
    * ([[sweepK]]) stays rows-only; THIS face pins sweep + scoring +
    * argmax.
    *
    * Cross-engine determinism beyond the fit itself: WSSSE and the
    * silhouette mean are order-sensitive double reductions, so each
    * per-point term is quantized at 6 dp and summed as DECIMAL(20,6) —
    * decimal addition is exact and order-insensitive (the q177
    * contract) — then converted to double once at the end. Returns one
    * row per k: (k, wssse, silhouette, chosen), ordered by k. */
  def sweepKReplayable(points: DataFrame, idCol: String, vecCol: String,
      ks: Seq[Int], iterations: Int = 3): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.types.DecimalType
    val vecs = points
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .persist()
    val rows = ks.sorted.map { k =>
      val (af, cents) = fit(vecs, "id", "v", k, iterations)
      val wssse = af
        .agg(sum(round(col("d2"), 6).cast(DecimalType(20, 6)))
          .cast("double"))
        .head().getDouble(0)
      val sil = vecs.crossJoin(broadcast(cents))
        .withColumn("dd", sqrt(sqDist(col("v"), col("cv"))))
        .groupBy(col("id"))
        .agg(sort_array(collect_list(col("dd"))).as("ds"))
        .select(col("ds").getItem(0).as("a"), col("ds").getItem(1).as("b"))
        .agg(
          sum(round(when(greatest(col("a"), col("b")) > 0,
            (col("b") - col("a")) / greatest(col("a"), col("b")))
            .otherwise(lit(0.0)), 6).cast(DecimalType(20, 6)))
            .cast("double").as("ss"),
          count(lit(1)).as("n"))
        .select(round(col("ss") / col("n"), 6))
        .head().getDouble(0)
      (k, wssse, sil)
    }
    vecs.unpersist()
    // selection policy, total: max silhouette, smaller k on ties —
    // applied to the already-quantized scores so any engine replays it
    val bestK = rows.maxBy { case (k, _, s) => (s, -k) }._1
    rows.map { case (k, w, s) => (k, w, s, k == bestK) }
      .toDF("k", "wssse", "silhouette", "chosen")
      .orderBy(col("k"))
  }

  /** The reference's optimal-k sweep re-expressed for one huge corpus:
    * fit every k with the deterministic k-means|| seeding, score with
    * the simplified silhouette, report WSSSE for the elbow — the same
    * decision surface `ksearch.KPolicy` consumes, computed without
    * ever collecting the data. WSSSE and silhouette ride ONE scoring
    * pass per k (per-point min d² and the two nearest centroid
    * distances come from the same aggregation) — the sweep is
    * driver-round-trip-bound, not data-bound, so every saved action
    * counts. Returns (k, wssse, silhouette) rows. */
  def sweepK(points: DataFrame, idCol: String, vecCol: String,
      ks: Seq[Int], iterations: Int = 5, seed: Long = 42L)
      : Seq[(Int, Double, Double)] = {
    val spark = points.sparkSession
    import spark.implicits._
    // NOT persisted, by measurement: the sweep re-reads the point set
    // across ~6 jobs × |ks|, but caching the projection made the sweep
    // ~25% SLOWER at sf0.1 (8.8 → 10–11.8 s isolated medians) — Spark's
    // columnar cache serializes array<double> rows generically, and
    // re-reading that beats the parquet vectorized scan only when the
    // source scan itself is expensive, which a sliced embeddings
    // projection is not. Revisit only with a measured win.
    val vecs = points
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
    ks.map { k =>
      val init = initParallel(vecs, "id", "v", k, seed)
      val (_, centsDf) = fit(vecs, "id", "v", k, iterations,
        init = Some(init))
      val cents = centsDf.collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
      val kEff = cents.size
      val scored = vecs.crossJoin(broadcast(cents.toDF("c", "cv")))
        .withColumn("d2", sqDist(col("v"), col("cv")))
        .groupBy(col("id"))
        .agg(min(col("d2")).as("w"),
          sort_array(collect_list(sqrt(col("d2")))).as("ds"))
        .select(col("w"), col("ds").getItem(0).as("a"),
          (if (kEff >= 2) col("ds").getItem(1) else lit(0.0)).as("b"))
        .agg(sum(col("w")).as("wssse"),
          avg(when(greatest(col("a"), col("b")) > 0,
            (col("b") - col("a")) / greatest(col("a"), col("b")))
            .otherwise(lit(0.0))).as("sil"))
        .head()
      (k, scored.getDouble(0), if (kEff < 2) 0.0 else scored.getDouble(1))
    }
  }
}
