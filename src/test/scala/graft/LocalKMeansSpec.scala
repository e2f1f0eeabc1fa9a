package graft

import org.apache.spark.ml.evaluation.ClusteringEvaluator
import org.apache.spark.ml.linalg.Vectors

import graft.ml.{LocalKMeans, LocalMetrics}

class LocalKMeansSpec extends GraftSuite {

  private def blob(cx: Double, cy: Double, n: Int, seed: Long) = {
    val r = new scala.util.Random(seed)
    Array.fill(n)(Array(cx + r.nextGaussian() * 0.5,
      cy + r.nextGaussian() * 0.5))
  }

  private val threeBlobs =
    blob(0, 0, 50, 1) ++ blob(50, 0, 50, 2) ++ blob(0, 50, 50, 3)

  test("fit is deterministic for a given seed") {
    val a = LocalKMeans.fit(threeBlobs, 3, 42L)
    val b = LocalKMeans.fit(threeBlobs, 3, 42L)
    assert(a.labels.toSeq === b.labels.toSeq)
    assert(a.centers.map(_.toSeq).toSeq === b.centers.map(_.toSeq).toSeq)
  }

  test("separable blobs are recovered") {
    val m = LocalKMeans.fit(threeBlobs, 3, 42L)
    // each blob should be label-pure
    val purity = threeBlobs.indices.grouped(50).map { idx =>
      idx.map(m.labels).groupBy(identity).values.map(_.size).max / 50.0
    }.toSeq
    assert(purity.forall(_ === 1.0), s"purity=$purity")
  }

  test("k capped at distinct point count") {
    val pts = Array(Array(1.0, 1.0), Array(1.0, 1.0), Array(2.0, 2.0))
    val m = LocalKMeans.fit(pts, 5, 7L)
    assert(m.k === 2)
  }

  test("bisecting produces exactly k clusters on separable data") {
    val m = LocalKMeans.fitBisecting(threeBlobs, 3, 42L)
    assert(m.labels.distinct.length === 3)
  }

  test("entropy matches closed form") {
    // sizes 2,2 → 1 bit; 1,1,1,1 → 2 bits
    assert(LocalMetrics.entropy(Seq(2L, 2L)) === 1.0 +- 1e-12)
    assert(LocalMetrics.entropy(Seq(1L, 1L, 1L, 1L)) === 2.0 +- 1e-12)
    assert(LocalMetrics.entropy(Seq(4L)) === 0.0 +- 1e-12)
  }

  test("radius = sqrt of max squared distance") {
    val c = Array(0.0, 0.0)
    val pts = Seq(Array(3.0, 4.0), Array(1.0, 0.0)) // max dist 5
    assert(LocalMetrics.radius(pts, c) === 5.0 +- 1e-12)
  }

  test("local silhouette matches Spark ClusteringEvaluator (squaredEuclidean)") {
    val spark2 = spark
    import spark2.implicits._
    val m = LocalKMeans.fit(threeBlobs, 3, 42L)
    val rows = threeBlobs.zip(m.labels).toSeq
      .map { case (p, l) => (Vectors.dense(p), l) }
    val df = rows.toDF("features", "prediction")
    val sparkSil = new ClusteringEvaluator()
      .setFeaturesCol("features").setPredictionCol("prediction")
      .evaluate(df)
    val localSil = LocalMetrics.silhouette(threeBlobs, m.labels)
    assert(localSil === sparkSil +- 1e-6,
      s"local=$localSil spark=$sparkSil")
  }

  test("silhouette guard: single cluster → 0.0") {
    assert(LocalMetrics.silhouette(threeBlobs,
      Array.fill(threeBlobs.length)(0)) === 0.0)
  }
}

class LocalGMMSpec extends GraftSuite {
  private def blob(cx: Double, cy: Double, n: Int, seed: Long) = {
    val r = new scala.util.Random(seed)
    Array.fill(n)(Array(cx + r.nextGaussian() * 0.5,
      cy + r.nextGaussian() * 0.5))
  }

  test("GMM recovers separable blobs deterministically") {
    val pts = blob(0, 0, 60, 1) ++ blob(30, 0, 60, 2) ++ blob(0, 30, 60, 3)
    val a = graft.ml.LocalGMM.fit(pts, 3, 42L)
    val b = graft.ml.LocalGMM.fit(pts, 3, 42L)
    assert(a.labels.toSeq === b.labels.toSeq)
    val purity = pts.indices.grouped(60).map { idx =>
      idx.map(a.labels).groupBy(identity).values.map(_.size).max / 60.0
    }.toSeq
    assert(purity.forall(_ >= 0.95), s"purity=$purity")
  }

  test("GMM handles k > distinct points and k == 1") {
    val tiny = Array(Array(1.0, 1.0), Array(1.0, 1.0), Array(2.0, 2.0))
    assert(graft.ml.LocalGMM.fit(tiny, 5, 7L).k <= 2)
    assert(graft.ml.LocalGMM.fit(tiny, 1, 7L).k === 1)
  }

  test("engine local backend runs GaussianMixture end-to-end") {
    val conf = graft.engine.EngineConf(
      macroCol = "l_returnflag", microCol = "l_linestatus",
      xCol = "l_quantity", yCol = "l_extendedprice",
      algorithm = "GaussianMixture", fixedK = Some(2), iterNum = 1,
      maxPointsPerSegment = 500)
    val res = graft.engine.ClusterEngine.run(
      Tables.lineitem(spark, sf), conf).collect()
    assert(res.length === 6)
    assert(res.forall(r => r.silhouette >= -1.0 && r.silhouette <= 1.0))
  }
}
