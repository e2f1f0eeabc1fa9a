package graft

import org.apache.spark.sql.functions._

import graft.operators.{IvfIndex, Similarity}

class IvfSpec extends GraftSuite {

  private lazy val e = Tables.embeddings(spark, sf)

  test("IVF assigns every candidate to a bucket in [1, nlist]") {
    val s = spark
    import s.implicits._
    val cents = IvfIndex.trainCentroids(
      e.select($"vec_id", $"embedding".as("cv")), "vec_id", "cv", 8, 42L)
    assert(cents.length === 8)
    val buckets = e.select(IvfIndex.bucketOf(
        Similarity.asDouble($"embedding"), cents).as("b"))
      .agg(min($"b"), max($"b")).first()
    assert(buckets.getLong(0) >= 1 && buckets.getLong(1) <= 8)
  }

  test("probeBuckets returns nprobe distinct buckets, best first") {
    val s = spark
    import s.implicits._
    val cents = IvfIndex.trainCentroids(
      e.select($"vec_id", $"embedding".as("cv")), "vec_id", "cv", 8, 42L)
    val probes = e.limit(5)
      .select(IvfIndex.probeBuckets(
        Similarity.asDouble($"embedding"), cents, 3).as("p"))
      .collect().map(_.getAs[scala.collection.Seq[Long]]("p"))
    assert(probes.forall(p => p.length === 3 && p.distinct.length === 3))
    // the top probe must equal the assignment bucket
    val both = e.limit(20).select(
      IvfIndex.bucketOf(Similarity.asDouble($"embedding"), cents).as("b"),
      IvfIndex.probeBuckets(Similarity.asDouble($"embedding"), cents, 1)
        .getItem(0).as("p"))
    assert(both.filter($"b" =!= $"p").count() === 0)
  }

  test("training sample is seeded-uniform: order-independent, not first-N") {
    val s = spark
    import s.implicits._
    val cands = e.select($"vec_id", $"embedding".as("cv"))
    def sampleIds(df: org.apache.spark.sql.DataFrame): Seq[Double] =
      IvfIndex.seededSample(df, "vec_id", "cv", 20, 42L).map(_.head).toSeq
    val base = sampleIds(cands)
    // deterministic and independent of physical row order / partitioning
    assert(sampleIds(cands.repartition(13)) === base)
    assert(sampleIds(cands.orderBy($"vec_id".desc)) === base)
    // NOT the first-N-by-id sample: xxhash64 spreads the picks, so the
    // sampled rows differ from the 20 smallest ids (which would bias
    // training whenever ids correlate with content)
    val firstN = cands.orderBy($"vec_id").limit(20)
      .select(Similarity.asDouble($"cv").getItem(0)).as[Double].collect().toSeq
    assert(base !== firstN)
    // different seed → different (still deterministic) sample
    assert(IvfIndex.seededSample(cands, "vec_id", "cv", 20, 43L)
      .map(_.head).toSeq !== base)
  }

  test("persisted IVF index answers identically to the direct path") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf").toString
    val cands = e.select($"vec_id", $"embedding".as("cv"))
    IvfIndex.writeIndex(cands, "vec_id", "cv", s"$dir/ivf",
      nlist = 8, seed = 42L)
    val (centroids, buckets) = IvfIndex.readIndex(spark, s"$dir/ivf")
    assert(centroids.length === 8)
    assert(buckets.count() === cands.count())
    val q = e.filter($"vec_id" < 3)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"))
    val viaIndex = IvfIndex.topKAgainstIndex(q, centroids, buckets,
      "query_id", "qv", k = 5, nprobe = 3)
      .select($"query_id", $"cand_id", $"rk")
    val direct = IvfIndex.topK(q, cands, "query_id", "qv", "vec_id", "cv",
      k = 5, nlist = 8, nprobe = 3, seed = 42L)
      .select($"query_id", $"vec_id".as("cand_id"), $"rk")
    assert(viaIndex.exceptAll(direct).count() === 0)
    assert(direct.exceptAll(viaIndex).count() === 0)
  }

  test("IVF recall improves with nprobe and hits 1.0 at nprobe = nlist") {
    val s = spark
    import s.implicits._
    val q = e.filter($"vec_id" < 3)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"))
    val c = e.select($"vec_id", $"embedding".as("cv"))
    def meanRecall(nprobe: Int): Double =
      IvfIndex.recall(q, c, "query_id", "qv", "vec_id", "cv",
        k = 5, nlist = 8, nprobe = nprobe, seed = 42L)
        .agg(avg($"recall")).first().getDouble(0)
    val r1 = meanRecall(1)
    val rAll = meanRecall(8)
    assert(rAll === 1.0 +- 1e-9) // probing all lists = exact
    assert(r1 <= rAll + 1e-9)
  }
}
