package graft

import graft.ksearch.KPolicy
import graft.ksearch.KPolicy.KScore

class KPolicySpec extends GraftSuite {

  test("distanceToLine: point on the line → 0") {
    assert(KPolicy.distanceToLine((5.0, 5.0), (0.0, 0.0), (10.0, 10.0))
      === 0.0 +- 1e-12)
  }

  test("distanceToLine: known perpendicular distance") {
    // horizontal line y=0, point at (3, 4) → distance 4
    assert(KPolicy.distanceToLine((3.0, 4.0), (0.0, 0.0), (10.0, 0.0))
      === 4.0 +- 1e-12)
  }

  test("clear silhouette winner is chosen (threshold gate)") {
    val sils = Seq(KScore(2, 0.9), KScore(3, 0.5), KScore(4, 0.4),
      KScore(5, 0.3))
    val wssse = Map(2 -> 100.0, 3 -> 50.0, 4 -> 30.0, 5 -> 25.0)
    val (k, s) = KPolicy.optimalK(wssse, sils, isGaussianMixture = false,
      startK = 2, stopK = 5, silhouetteThreshold = 0.9)
    assert(k === 2 && s === 0.9)
  }

  test("near-tie falls back to elbow distance") {
    // k=2 and k=3 silhouettes within threshold; k=3 has bigger elbow dist
    val sils = Seq(KScore(2, 0.80), KScore(3, 0.79), KScore(4, 0.1),
      KScore(5, 0.05))
    val wssse = Map(2 -> 100.0, 3 -> 20.0, 4 -> 15.0, 5 -> 10.0)
    val (k, _) = KPolicy.optimalK(wssse, sils, isGaussianMixture = false,
      startK = 2, stopK = 5, silhouetteThreshold = 0.9)
    assert(k === 3)
  }

  test("GMM path is plain argmax silhouette") {
    val sils = Seq(KScore(2, 0.3), KScore(3, 0.8), KScore(4, 0.5))
    val (k, s) = KPolicy.optimalK(Map.empty, sils, isGaussianMixture = true,
      startK = 2, stopK = 4, silhouetteThreshold = 0.9)
    assert(k === 3 && s === 0.8)
  }

  test("tie order matches Python stable-sort + reverse (higher k first)") {
    // all-equal silhouettes: reference picks the LAST k of the sweep
    val sils = Seq(KScore(2, 0.0), KScore(3, 0.0), KScore(4, 0.0))
    val (k, _) = KPolicy.optimalK(Map.empty, sils, isGaussianMixture = true,
      startK = 2, stopK = 4, silhouetteThreshold = 0.9)
    assert(k === 4)
  }

  test("property: chosen k is always from the sweep range (500 random sweeps)") {
    val rnd = new scala.util.Random(1234L)
    for (_ <- 0 until 500) {
      val startK = 2 + rnd.nextInt(3)
      val n = 3 + rnd.nextInt(6)
      val stopK = startK + n - 1
      val scores = (0 until n).map(i =>
        KScore(startK + i, rnd.nextDouble() * 2 - 1))
      val wssse = (0 until n).map(i =>
        (startK + i) -> (1.0 + rnd.nextDouble() * 999)).toMap
      val gmm = rnd.nextBoolean()
      val (k, s) = KPolicy.optimalK(wssse, scores, gmm, startK, stopK, 0.9)
      assert(k >= startK && k <= stopK)
      assert(scores.find(_.k == k).get.silhouette === s)
    }
  }
}
