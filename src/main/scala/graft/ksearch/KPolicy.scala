package graft.ksearch

/** Pure-function port of the reference's optimal-k selection policy
  * (`/root/reference/scripts/optimal_k.py:141-192`) and the elbow helper
  * `distanceToLine` (`scripts/preprocess.py:173-188`). Ported 1:1,
  * including the quirks:
  *  - candidates = top-3 silhouettes, where ties keep the reference's
  *    Python stable-sort-ascending-then-reverse order (equal silhouettes
  *    appear in REVERSED original k order);
  *  - non-GMM: elbow (perpendicular distance of (k, WSSSE) to the
  *    startK–stopK chord) only breaks near-ties, gated by
  *    silhouetteThreshold;
  *  - GMM: plain argmax silhouette (no WSSSE available).
  */
object KPolicy extends Serializable {

  final case class KScore(k: Int, silhouette: Double)

  /** Perpendicular distance from `point` to the line through p1, p2.
    * Undefined (division by zero) when x1 == x2 — the reference never hits
    * it because startK < stopK; we require it.
    */
  def distanceToLine(point: (Double, Double), p1: (Double, Double),
      p2: (Double, Double)): Double = {
    val (x0, y0) = point
    val (x1, y1) = p1
    val (x2, y2) = p2
    require(x2 != x1, "degenerate elbow line (startK == stopK)")
    val a = -((y2 - y1) / (x2 - x1))
    val b = 1.0
    val c = -y1 + (-a * x1)
    math.abs(a * x0 + b * y0 + c) / math.sqrt(a * a + b * b)
  }

  /** Returns (optimal k, its silhouette). `wssse` must contain startK and
    * stopK for non-GMM algorithms (as produced by the k-sweep).
    */
  def optimalK(wssse: Map[Int, Double], silhouettes: Seq[KScore],
      isGaussianMixture: Boolean, startK: Int, stopK: Int,
      silhouetteThreshold: Double): (Int, Double) = {
    require(silhouettes.nonEmpty, "empty k-sweep")
    // Python list.sort is stable ascending; .reverse() then flips ties too.
    val sorted = silhouettes.sortBy(_.silhouette).reverse
    if (isGaussianMixture) {
      val best = sorted.head
      return (best.k, best.silhouette)
    }
    val dist: Map[Int, Double] = wssse.map { case (k, w) =>
      k -> distanceToLine((k.toDouble, w), (startK.toDouble, wssse(startK)),
        (stopK.toDouble, wssse(stopK)))
    }
    val best = sorted.take(3)
    var opt =
      if (best.length < 2 ||
          best(0).silhouette * silhouetteThreshold > best(1).silhouette) {
        best(0)
      } else if (dist(best(1).k) > dist(best(0).k)) {
        best(1)
      } else {
        best(0)
      }
    if (best.length >= 3 &&
        opt.silhouette * silhouetteThreshold < best(2).silhouette &&
        dist(best(2).k) > dist(opt.k)) {
      opt = best(2)
    }
    (opt.k, opt.silhouette)
  }
}
