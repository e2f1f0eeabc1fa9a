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

  test("seededSample hash-threshold prefilter returns the exact full-rank sample") {
    val s = spark
    import s.implicits._
    val cands = e.select($"vec_id", $"embedding".as("cv"))
    val total = cands.count()
    // n small enough that total > OverselectFactor^2 * n → prefilter path
    val n = math.max(1, (total / 150).toInt)
    assert(total > 100L * n, s"fixture too small: $total rows, n=$n")
    val viaPrefilter = IvfIndex.seededSample(cands, "vec_id", "cv", n, 42L)
    // ground truth: the unfiltered global rank
    val full = cands
      .select($"vec_id", graft.operators.Similarity.asDouble($"cv").as("v"))
      .orderBy(xxhash64($"vec_id", lit(42L)), $"vec_id").limit(n)
      .collect().map(_.getAs[scala.collection.Seq[Double]]("v").toArray)
    assert(viaPrefilter.length === n)
    assert(viaPrefilter.map(_.toSeq).toSeq === full.map(_.toSeq).toSeq)
  }

  test("persisted-IVF probes read ONLY the probed bucket partitions") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfp").toString
    val cands = e.select($"vec_id", $"embedding".as("cv"))
    IvfIndex.writeIndex(cands, "vec_id", "cv", s"$dir/ivf",
      nlist = 8, seed = 42L)
    val (centroids, buckets) = IvfIndex.readIndex(spark, s"$dir/ivf")
    val q = e.filter($"vec_id" < 2)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"))
    val nprobe = 2
    val res = IvfIndex.topKAgainstIndex(q, centroids, buckets,
      "query_id", "qv", k = 3, nprobe = nprobe)
    val probed = q.select(explode(IvfIndex.probeBuckets(
        graft.operators.Similarity.asDouble($"qv"), centroids, nprobe)))
      .distinct().count()
    val scans = res.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    val bucketScan = scans.find(_.output.exists(_.name == "cv"))
      .getOrElse(fail("no parquet scan over the bucket table in the plan"))
    // static bucket IN (...) partition filter, evaluated at listing time
    assert(bucketScan.partitionFilters.nonEmpty,
      "probe join carries no partition filter — the whole index is read")
    val read = bucketScan.selectedPartitions.partitionCount
    assert(read <= probed && read < 8,
      s"scan read $read partitions, probed $probed of 8")
    // and the pruned path still answers correctly
    assert(res.groupBy($"query_id").count().collect().forall(_.getLong(1) <= 3))
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

  test("appendVectors ingests a batch the index then serves, no retrain") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_in").toString
    val half1 = e.filter($"vec_id" % 2 === 0)
      .select($"vec_id", $"embedding".as("cv"))
    val half2 = e.filter($"vec_id" % 2 === 1)
      .select($"vec_id", $"embedding".as("cv"))
    IvfIndex.writeIndex(half1, "vec_id", "cv", s"$dir/ivf",
      nlist = 8, seed = 42L)
    val centsBefore = IvfIndex.readIndex(spark, s"$dir/ivf")._1
    IvfIndex.appendVectors(spark, s"$dir/ivf", half2, "vec_id", "cv")
    val (cents, buckets) = IvfIndex.readIndex(spark, s"$dir/ivf")
    assert(cents === centsBefore) // centroids untouched — no retraining
    assert(buckets.count() === e.count()) // index grew by the batch
    // an ingested vector is served: query with ITS OWN embedding (fresh
    // query id so the self-exclusion filter doesn't drop it) → top-1
    val probe = e.filter($"vec_id" === 7).select(
      lit(-1L).as("query_id"), $"embedding".as("qv"))
    val top1 = IvfIndex.topKAgainstIndex(probe, cents, buckets,
      "query_id", "qv", k = 1, nprobe = 2)
      .select($"cand_id").head().getLong(0)
    assert(top1 === 7L)
    // and the appended rows landed in the SAME buckets the stored
    // centroids dictate (partition layout stays consistent)
    val expected = half2.select($"vec_id",
      IvfIndex.bucketOf(Similarity.asDouble($"cv"), cents).cast("long")
        .as("b"))
    val stored = buckets.filter($"cand_id" % 2 === 1)
      .select($"cand_id".as("vec_id"), $"bucket".cast("long").as("b"))
    assert(stored.exceptAll(expected).count() === 0)
    assert(expected.exceptAll(stored).count() === 0)
    // retry idempotence: re-appending the same batch (redelivery, crash
    // before a checkpoint commit) must not duplicate candidates
    IvfIndex.appendVectors(spark, s"$dir/ivf", half2, "vec_id", "cv")
    assert(IvfIndex.readIndex(spark, s"$dir/ivf")._2.count()
      === e.count())
  }
}
