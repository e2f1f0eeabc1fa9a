package graft.ml

import scala.util.Random

/** In-JVM, seed-deterministic clustering for the scalable per-segment
  * backend (SURVEY.md §2.10 scale note): when an engine run has millions of
  * *small* segments, fitting one `spark.ml` model per segment means
  * millions of Spark jobs. Instead the engine shuffles once
  * (`groupByKey(macro, micro)`) and runs these local fits inside
  * `flatMapGroups` tasks — embarrassingly parallel across executors.
  *
  * Semantics mirror `org.apache.spark.ml.clustering`: k-means++ ("k-means||"
  * degenerates to k-means++ locally) init + Lloyd iterations; bisecting
  * k-means = recursive largest-cluster 2-splits (same policy as
  * `BisectingKMeans`: split the cluster with most points).
  */
object LocalKMeans extends Serializable {

  final case class Model(centers: Array[Array[Double]], labels: Array[Int]) {
    def k: Int = centers.length
    /** Within-set sum of squared errors — the reference's WSSSE / elbow
      * input (`scripts/optimal_k.py:129-131`, `computeCost`). */
    def cost(points: Array[Array[Double]]): Double = {
      var c = 0.0
      var i = 0
      while (i < points.length) { c += sqdist(points(i), centers(labels(i))); i += 1 }
      c
    }
  }

  /** Content-based dedup — Array equality is referential in Scala, so a
    * plain `.distinct` over points is a bug (it never dedupes). */
  def distinctPoints(points: Array[Array[Double]]): Array[Array[Double]] = {
    val seen = scala.collection.mutable.LinkedHashSet.empty[Seq[Double]]
    points.foreach(p => seen += p.toSeq)
    seen.iterator.map(_.toArray).toArray
  }

  def sqdist(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** The REPLAYABLE per-segment Lloyd fit (q190's kernel) — the q158
    * determinism contract applied to the in-JVM segment path: init =
    * the first k DISTINCT points in the caller's order, each labelled
    * with its 1-based position (so SQL can re-derive labels as lex
    * row_numbers); fixed `iterations` rounds; every centroid
    * coordinate re-quantized HALF_UP at 6 dp per round (BigDecimal —
    * the same rounding Spark's and DuckDB's `round(x, 6)` apply to the
    * non-negative scaled coordinates this face feeds it); argmin ties
    * break on the lower label; a centroid that captures nothing drops
    * out. Returns None for <2 distinct points (the reference's
    * ≥2-distinct guard), else (label, final-d2) per point in input
    * order. */
  def fitLloydQuantized(points: Array[Array[Double]], k: Int,
      iterations: Int): Option[(Array[Long], Array[Double])] = {
    require(k >= 2 && iterations >= 1)
    val chosen = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Double])]
    val seen = scala.collection.mutable.HashSet.empty[Seq[Double]]
    var i = 0
    while (i < points.length && chosen.size < k) {
      val key = points(i).toSeq
      if (!seen(key)) { seen += key; chosen += (((i + 1).toLong, points(i))) }
      i += 1
    }
    if (chosen.size < 2) return None
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    var cents: Seq[(Long, Array[Double])] = chosen.toSeq // label-ascending
    // first strict minimum in label order == ORDER BY d2, c
    def assign(): Array[(Int, Double)] = points.map { p =>
      var best = 0
      var bd = sqdist(p, cents(0)._2)
      var ci = 1
      while (ci < cents.length) {
        val dd = sqdist(p, cents(ci)._2)
        if (dd < bd) { bd = dd; best = ci }
        ci += 1
      }
      (best, bd)
    }
    for (_ <- 1 to iterations) {
      val lab = assign()
      // groupBy over ascending indices keeps in-group order = the
      // caller's (lexicographic) order — the summation order contract
      val byC = points.indices.groupBy(ix => lab(ix)._1)
      cents = cents.indices.flatMap { ci =>
        byC.get(ci).map { members =>
          val dim = points(0).length
          val nv = Array.tabulate(dim) { j =>
            var s = 0.0
            members.foreach(mi => s += points(mi)(j))
            r6(s / members.size)
          }
          (cents(ci)._1, nv)
        }
      }
    }
    val fin = assign()
    Some((fin.map(a => cents(a._1)._1), fin.map(_._2)))
  }

  /** Lloyd's algorithm with k-means++ init. Deterministic for a given
    * (points-order, k, seed). k is capped at the number of distinct points.
    */
  def fit(points: Array[Array[Double]], k: Int, seed: Long,
      maxIter: Int = 20, tol: Double = 1e-6): Model = {
    require(points.nonEmpty, "empty segment")
    val distinct = distinctPoints(points)
    val kEff = math.max(1, math.min(k, distinct.length))
    val rnd = new Random(seed)
    var centers = initPlusPlus(distinct, kEff, rnd)
    val labels = new Array[Int](points.length)
    var iter = 0
    var moved = Double.MaxValue
    while (iter < maxIter && moved > tol) {
      // assignment
      var i = 0
      while (i < points.length) { labels(i) = nearest(points(i), centers); i += 1 }
      // update
      val sums = Array.fill(kEff)(new Array[Double](points(0).length))
      val counts = new Array[Long](kEff)
      i = 0
      while (i < points.length) {
        val c = labels(i); counts(c) += 1
        val s = sums(c); val p = points(i)
        var d = 0
        while (d < p.length) { s(d) += p(d); d += 1 }
        i += 1
      }
      moved = 0.0
      val next = Array.tabulate(kEff) { c =>
        if (counts(c) == 0) centers(c) // keep empty-cluster center fixed
        else {
          val nc = sums(c).map(_ / counts(c))
          moved = math.max(moved, sqdist(nc, centers(c)))
          nc
        }
      }
      centers = next
      iter += 1
    }
    var i = 0
    while (i < points.length) { labels(i) = nearest(points(i), centers); i += 1 }
    Model(centers, labels)
  }

  /** Bisecting k-means: start with one cluster, repeatedly 2-split the
    * largest cluster until k clusters exist. */
  def fitBisecting(points: Array[Array[Double]], k: Int, seed: Long): Model = {
    val distinctN = distinctPoints(points).length
    val kEff = math.max(1, math.min(k, distinctN))
    var assignment = Array.fill(points.length)(0)
    var nClusters = 1
    val rnd = new Random(seed)
    while (nClusters < kEff) {
      // pick largest splittable cluster (≥2 distinct points)
      val sizes = Array.fill(nClusters)(0)
      assignment.foreach(c => sizes(c) += 1)
      val order = (0 until nClusters).sortBy(c => -sizes(c))
      val target = order.find { c =>
        val pts = points.indices.filter(assignment(_) == c).map(points)
        distinctPoints(pts.toArray).length >= 2
      }
      target match {
        case None => return relabel(points, assignment, nClusters)
        case Some(c) =>
          val idx = points.indices.filter(assignment(_) == c).toArray
          val sub = idx.map(points)
          val m = fit(sub, 2, rnd.nextLong())
          var j = 0
          while (j < idx.length) {
            if (m.labels(j) == 1) assignment(idx(j)) = nClusters
            j += 1
          }
          nClusters += 1
      }
    }
    relabel(points, assignment, nClusters)
  }

  private def relabel(points: Array[Array[Double]], labels: Array[Int],
      n: Int): Model = {
    val dim = points(0).length
    val sums = Array.fill(n)(new Array[Double](dim))
    val counts = new Array[Long](n)
    var i = 0
    while (i < points.length) {
      val c = labels(i); counts(c) += 1
      var d = 0
      while (d < dim) { sums(c)(d) += points(i)(d); d += 1 }
      i += 1
    }
    val centers = Array.tabulate(n)(c =>
      if (counts(c) == 0) new Array[Double](dim) else sums(c).map(_ / counts(c)))
    Model(centers, labels.clone())
  }

  private def nearest(p: Array[Double], centers: Array[Array[Double]]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < centers.length) {
      val d = sqdist(p, centers(c))
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  private def initPlusPlus(points: Array[Array[Double]], k: Int,
      rnd: Random): Array[Array[Double]] = {
    val centers = new Array[Array[Double]](k)
    centers(0) = points(rnd.nextInt(points.length))
    val minD = Array.fill(points.length)(Double.MaxValue)
    var c = 1
    while (c < k) {
      var i = 0
      var total = 0.0
      while (i < points.length) {
        minD(i) = math.min(minD(i), sqdist(points(i), centers(c - 1)))
        total += minD(i)
        i += 1
      }
      if (total == 0.0) {
        centers(c) = points(rnd.nextInt(points.length))
      } else {
        var r = rnd.nextDouble() * total
        var j = 0
        while (j < points.length - 1 && r > minD(j)) { r -= minD(j); j += 1 }
        centers(c) = points(j)
      }
      c += 1
    }
    centers
  }
}
