package graft.ml

/** Per-segment metric kernels for the flatMapGroups backend. Formula
  * parity with the reference:
  *  - entropy: -Σ p·log_b(p) over cluster sizes, base 2
  *    (`/root/reference/scripts/metrics.py:113-137`, base fixed at
  *    `scripts/cluster.py:145`);
  *  - radius: sqrt of MAX squared distance to the center
  *    (`scripts/metrics.py:12-29` — sqrt-of-max-sqdist, not max distance
  *    squared-rooted per point; numerically identical, preserved);
  *  - silhouette: squared-Euclidean silhouette, the default measure of
  *    `org.apache.spark.ml.evaluation.ClusteringEvaluator` the reference
  *    relies on (`scripts/metrics.py:140-148`), with the same
  *    "<2 distinct labels → 0.0" guard.
  */
object LocalMetrics extends Serializable {

  def entropy(sizes: Iterable[Long], base: Double = 2.0): Double = {
    val total = sizes.sum.toDouble
    if (total == 0) return 0.0
    var e = 0.0
    sizes.foreach { c =>
      if (c > 0) { val p = c / total; e += p * math.log(p) / math.log(base) }
    }
    -e
  }

  def radius(points: Iterable[Array[Double]], center: Array[Double]): Double = {
    var maxSq = 0.0
    points.foreach { p =>
      val d = LocalKMeans.sqdist(p, center)
      if (d > maxSq) maxSq = d
    }
    math.sqrt(maxSq)
  }

  /** Exact squared-Euclidean silhouette, mean over all points — matches
    * ClusteringEvaluator("squaredEuclidean") semantics using the
    * cluster-aggregate identity it exploits: for squared Euclidean
    * distance, mean_{q∈C} ||p-q||² = ||p||² - 2·p·mean(C) + mean_{q∈C}||q||²,
    * so each point needs only per-cluster (mean vector, mean squared norm)
    * — O(n·k), no pairwise pass, same value as the naive O(n²) form.
    * Single-point "other" clusters contribute their exact distance; points
    * in singleton clusters get s=0. Returns 0.0 with <2 distinct labels.
    */
  def silhouette(points: Array[Array[Double]], labels: Array[Int]): Double = {
    val n = points.length
    if (n == 0) return 0.0
    val ks = labels.distinct
    if (ks.length < 2) return 0.0
    val kMax = labels.max + 1
    val dim = points(0).length
    val counts = new Array[Long](kMax)
    val means = Array.fill(kMax)(new Array[Double](dim))
    val meanSqNorm = new Array[Double](kMax)
    var i = 0
    while (i < n) {
      val c = labels(i); counts(c) += 1
      var d = 0
      var sq = 0.0
      while (d < dim) {
        means(c)(d) += points(i)(d); sq += points(i)(d) * points(i)(d); d += 1
      }
      meanSqNorm(c) += sq
      i += 1
    }
    var c = 0
    while (c < kMax) {
      if (counts(c) > 0) {
        var d = 0
        while (d < dim) { means(c)(d) /= counts(c); d += 1 }
        meanSqNorm(c) /= counts(c)
      }
      c += 1
    }
    var sSum = 0.0
    i = 0
    while (i < n) {
      val p = points(i)
      val own = labels(i)
      var pSq = 0.0
      var d = 0
      while (d < dim) { pSq += p(d) * p(d); d += 1 }
      // mean squared distance from p to cluster c:
      def meanSqDist(c: Int): Double = {
        var dot = 0.0
        var dd = 0
        while (dd < dim) { dot += p(dd) * means(c)(dd); dd += 1 }
        pSq - 2.0 * dot + meanSqNorm(c)
      }
      if (counts(own) == 1) {
        // singleton: silhouette contribution 0 (sklearn + Spark convention)
      } else {
        // a(i): mean over own cluster EXCLUDING self
        val aInc = meanSqDist(own)
        val a = aInc * counts(own) / (counts(own) - 1.0)
        var b = Double.MaxValue
        var cc = 0
        while (cc < kMax) {
          if (cc != own && counts(cc) > 0) b = math.min(b, meanSqDist(cc))
          cc += 1
        }
        val m = math.max(a, b)
        if (m > 0) sSum += (b - a) / m
      }
      i += 1
    }
    sSum / n
  }
}
