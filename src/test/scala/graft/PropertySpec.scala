package graft

import org.scalacheck.{Gen, Prop, Properties}

import graft.ksearch.KPolicy
import graft.ml.{LocalKMeans, LocalMetrics}

/** ScalaCheck property suites (run natively by sbt's scalacheck
  * framework) for the pure kernels. */
object LocalMetricsProps extends Properties("LocalMetrics") {

  private val sizesGen = Gen.nonEmptyListOf(Gen.choose(1L, 10000L))

  property("entropy is non-negative and bounded by log2(k)") =
    Prop.forAll(sizesGen) { sizes =>
      val e = LocalMetrics.entropy(sizes)
      e >= -1e-12 && e <= math.log(sizes.length.toDouble) / math.log(2.0) + 1e-9
    }

  property("uniform sizes maximize entropy") =
    Prop.forAll(Gen.choose(2, 16), Gen.choose(1L, 500L)) { (k, n) =>
      val uniform = LocalMetrics.entropy(Seq.fill(k)(n))
      math.abs(uniform - math.log(k.toDouble) / math.log(2.0)) < 1e-9
    }

  private val pointsGen = for {
    n <- Gen.choose(4, 60)
    pts <- Gen.listOfN(n, Gen.zip(Gen.choose(-100.0, 100.0),
      Gen.choose(-100.0, 100.0)))
  } yield pts.map(p => Array(p._1, p._2)).toArray

  property("silhouette of any k-means labeling lies in [-1, 1]") =
    Prop.forAll(pointsGen, Gen.choose(2, 5), Gen.choose(0L, 1000L)) {
      (pts, k, seed) =>
        val m = LocalKMeans.fit(pts, k, seed)
        val s = LocalMetrics.silhouette(pts, m.labels)
        s >= -1.0 - 1e-9 && s <= 1.0 + 1e-9
    }

  property("radius covers every point of the cluster") =
    Prop.forAll(pointsGen) { pts =>
      val c = Array(pts.map(_(0)).sum / pts.length,
        pts.map(_(1)).sum / pts.length)
      val r = LocalMetrics.radius(pts, c)
      pts.forall(p => math.sqrt(LocalKMeans.sqdist(p, c)) <= r + 1e-9)
    }
}

object KPolicyProps extends Properties("KPolicy") {
  private val sweepGen = for {
    startK <- Gen.choose(2, 5)
    n <- Gen.choose(3, 9)
    sils <- Gen.listOfN(n, Gen.choose(-1.0, 1.0))
    ws <- Gen.listOfN(n, Gen.choose(1.0, 1e6))
    gmm <- Gen.oneOf(true, false)
  } yield (startK, sils, ws, gmm)

  property("chosen k comes from the sweep with its own silhouette") =
    Prop.forAll(sweepGen) { case (startK, sils, ws, gmm) =>
      val stopK = startK + sils.length - 1
      val scores = sils.zipWithIndex.map { case (s, i) =>
        KPolicy.KScore(startK + i, s)
      }
      val wssse = ws.zipWithIndex.map { case (w, i) => (startK + i) -> w }.toMap
      val (k, s) = KPolicy.optimalK(wssse, scores, gmm, startK, stopK, 0.9)
      k >= startK && k <= stopK &&
        scores.find(_.k == k).exists(_.silhouette == s)
    }
}
