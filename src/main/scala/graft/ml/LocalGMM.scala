package graft.ml

import breeze.linalg.{det, inv, DenseMatrix, DenseVector}

import scala.util.Random

/** In-JVM full-covariance Gaussian Mixture EM for the scalable per-segment
  * backend — the GaussianMixture leg of the engine's local path (the
  * reference's third algorithm, `scripts/cluster.py:245`). Deterministic
  * for a given (points-order, k, seed): initialized from the (seeded)
  * k-means++ result, then EM to convergence.
  *
  * Output contract matches the engine's use of GMM: hard labels by argmax
  * responsibility; "centers" downstream are per-cluster DATA MEANS, the
  * reference's semantics (`scripts/metrics.py:32-54`), not the gaussian
  * means.
  */
object LocalGMM extends Serializable {

  private val MinCovariance = 1e-6

  def fit(points: Array[Array[Double]], k: Int, seed: Long,
      maxIter: Int = 50, tol: Double = 1e-4): LocalKMeans.Model = {
    val distinct = LocalKMeans.distinctPoints(points)
    val kEff = math.max(1, math.min(k, distinct.length))
    val n = points.length
    val dim = points(0).length
    if (kEff == 1)
      return LocalKMeans.fit(points, 1, seed)
    // init from seeded k-means++
    val km = LocalKMeans.fit(points, kEff, seed)
    val means = km.centers.map(c => DenseVector(c.clone()))
    val weights = {
      val counts = new Array[Double](kEff)
      km.labels.foreach(counts(_) += 1.0)
      counts.map(c => math.max(c, 1.0) / n)
    }
    val covs = Array.fill(kEff)(initialCov(points, km, dim))
    val resp = Array.ofDim[Double](n, kEff)
    var prevLl = Double.NegativeInfinity
    var iter = 0
    var done = false
    while (iter < maxIter && !done) {
      // E-step
      var ll = 0.0
      var i = 0
      while (i < n) {
        val x = DenseVector(points(i))
        var total = 0.0
        var c = 0
        while (c < kEff) {
          val p = weights(c) * gaussianPdf(x, means(c), covs(c))
          resp(i)(c) = p
          total += p
          c += 1
        }
        if (total <= 0 || total.isNaN) {
          // degenerate: uniform responsibility
          java.util.Arrays.fill(resp(i), 1.0 / kEff)
          total = 1.0
        } else {
          c = 0
          while (c < kEff) { resp(i)(c) /= total; c += 1 }
        }
        ll += math.log(total)
        i += 1
      }
      // M-step
      var c = 0
      while (c < kEff) {
        var rSum = 0.0
        val mu = DenseVector.zeros[Double](dim)
        i = 0
        while (i < n) {
          rSum += resp(i)(c)
          mu += DenseVector(points(i)) * resp(i)(c)
          i += 1
        }
        rSum = math.max(rSum, 1e-12)
        mu /= rSum
        val cov = DenseMatrix.zeros[Double](dim, dim)
        i = 0
        while (i < n) {
          val diff = DenseVector(points(i)) - mu
          cov += (diff * diff.t) * resp(i)(c)
          i += 1
        }
        cov /= rSum
        var d0 = 0
        while (d0 < dim) { cov(d0, d0) += MinCovariance; d0 += 1 }
        means(c) = mu
        covs(c) = cov
        weights(c) = rSum / n
        c += 1
      }
      if (math.abs(ll - prevLl) < tol * math.abs(prevLl + 1e-12)) done = true
      prevLl = ll
      iter += 1
    }
    val labels = Array.tabulate(n) { i =>
      var best = 0
      var bestP = Double.NegativeInfinity
      var c = 0
      while (c < kEff) {
        if (resp(i)(c) > bestP) { bestP = resp(i)(c); best = c }
        c += 1
      }
      best
    }
    LocalKMeans.Model(means.map(_.toArray), labels)
  }

  private def initialCov(points: Array[Array[Double]],
      km: LocalKMeans.Model, dim: Int): DenseMatrix[Double] = {
    // pooled within-cluster covariance of the k-means init (stable start)
    val cov = DenseMatrix.zeros[Double](dim, dim)
    var i = 0
    while (i < points.length) {
      val diff = DenseVector(points(i)) - DenseVector(km.centers(km.labels(i)))
      cov += diff * diff.t
      i += 1
    }
    cov /= math.max(1, points.length).toDouble
    var d0 = 0
    while (d0 < dim) { cov(d0, d0) += 1e-3; d0 += 1 }
    cov
  }

  private def gaussianPdf(x: DenseVector[Double], mu: DenseVector[Double],
      cov: DenseMatrix[Double]): Double = {
    val d = x.length
    val dt = det(cov)
    if (dt <= 0) return 0.0
    val diff = x - mu
    val expo = -0.5 * (diff.t * (inv(cov) * diff))
    math.exp(expo) / math.sqrt(math.pow(2 * math.Pi, d) * dt)
  }
}
