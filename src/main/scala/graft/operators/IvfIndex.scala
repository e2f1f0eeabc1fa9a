package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ml.LocalKMeans

/** IVF (inverted-file) approximate nearest neighbour index: train `nlist`
  * coarse centroids on a bounded sample, assign every candidate to its
  * nearest centroid (one map-side pass — centroids ride along as a
  * literal), then answer queries by scoring ONLY the `nprobe` closest
  * centroid buckets. The standard coarse-quantization trade: candidate
  * cost drops from n to ~n·nprobe/nlist per query, recall is tunable via
  * nprobe. Deterministic for a given seed (LocalKMeans training, stable
  * assignment tie-breaks).
  */
object IvfIndex extends Serializable {

  /** Seeded uniform training sample: rank rows by `xxhash64(id, seed)`
    * (id as tie-break) and take the first `n`. Deterministic for a given
    * seed yet independent of id ORDER — "first n by id" would bias the
    * sample whenever ids correlate with insertion order or content, which
    * they usually do. Bounded driver materialization (n vectors), the
    * standard shape for codebook/centroid training.
    *
    * Large corpora don't pay a full top-n rank: when the (parquet-
    * metadata-cheap) row count exceeds `OverselectFactor² · n`, a hash-
    * THRESHOLD prefilter keeps only rows whose rank key falls in the
    * smallest ~`OverselectFactor · n / total` fraction of the hash range
    * before the rank runs. The filter is a pure function of (id, seed) —
    * partition-invariant, unlike `df.sample` whose per-partition RNG
    * changes with layout — and since it keeps a superset of the n
    * smallest keys (with margin `OverselectFactor`, short only with
    * probability ≈ exp(-Ω(n))), the selected sample is IDENTICAL to the
    * unfiltered rank's. A row-count guard falls back to the full rank in
    * the astronomically-unlikely short case. */
  private val OverselectFactor = 10L

  private[graft] def seededSample(candidates: DataFrame, candId: String,
      candVec: String, n: Int, seed: Long): Array[Array[Double]] = {
    val base = candidates
      .select(col(candId), Similarity.asDouble(col(candVec)).as("v"))
    val rankKey = xxhash64(col(candId), lit(seed))
    def ranked(df: DataFrame): Array[Array[Double]] =
      df.orderBy(rankKey, col(candId)).limit(n)
        .collect()
        .map(_.getAs[scala.collection.Seq[Double]]("v").toArray)
    val total = candidates.count()
    if (total <= OverselectFactor * OverselectFactor * n) ranked(base)
    else {
      // keep hash <= Long.MinValue + frac·2^64, frac = Overselect·n/total
      val frac = BigDecimal(OverselectFactor * n.toLong) / BigDecimal(total)
      val bound = (BigDecimal(Long.MinValue) +
        BigDecimal(2).pow(64) * frac).toBigInt
      val boundL =
        if (bound >= BigInt(Long.MaxValue)) Long.MaxValue else bound.toLong
      val sample = ranked(base.filter(rankKey <= lit(boundL)))
      if (sample.length >= math.min(n.toLong, total)) sample
      else ranked(base) // short prefilter (≈ never): exact fallback
    }
  }

  /** Train coarse centroids from a seeded uniform sample of the candidate
    * vectors (see [[seededSample]]). */
  def trainCentroids(candidates: DataFrame, candId: String, candVec: String,
      nlist: Int, seed: Long, sampleN: Int = 10000): Seq[Seq[Double]] = {
    val sample = seededSample(candidates, candId, candVec, sampleN, seed)
    LocalKMeans.fit(sample, nlist, seed).centers.map(_.toSeq).toSeq
  }

  /** Cosine of a vector column against each centroid (array<double> of
    * length nlist). */
  private def centroidCosines(vec: Column,
      centroids: Seq[Seq[Double]]): Column =
    array(centroids.map(c =>
      Similarity.cosine(vec, typedLit(c))): _*)

  /** 1-based index of the best (max-cosine) centroid — first max wins,
    * deterministic. */
  def bucketOf(vec: Column, centroids: Seq[Seq[Double]]): Column = {
    val cosines = centroidCosines(vec, centroids)
    array_position(cosines, array_max(cosines))
  }

  /** The `nprobe` best buckets for a query vector, as an array. */
  def probeBuckets(vec: Column, centroids: Seq[Seq[Double]],
      nprobe: Int): Column = {
    val nlist = centroids.length
    val cosines = centroidCosines(vec, centroids)
    val idx = sequence(lit(1), lit(nlist))
    val ranked = array_sort(
      zip_with(cosines, idx, (c, i) => struct(c.as("c"), i.as("i"))),
      (l, r) => when(l.getField("c") > r.getField("c"), -1)
        .when(l.getField("c") < r.getField("c"), 1)
        .otherwise(l.getField("i") - r.getField("i")))
    transform(slice(ranked, 1, nprobe), s => s.getField("i"))
  }

  /** Squared-L2 distance of a vector column to each centroid. */
  private def centroidSqDists(vec: Column,
      centroids: Seq[Seq[Double]]): Column =
    array(centroids.map(c =>
      aggregate(zip_with(vec, typedLit(c), (a, b) => (a - b) * (a - b)),
        lit(0.0), (acc, x) => acc + x)): _*)

  /** 1-based index of the nearest (min squared-L2) centroid — first min
    * wins. Use this variant when downstream scoring is L2 (e.g. PQ/ADC)
    * so coarse pruning and fine scoring agree on the metric for
    * unnormalized embeddings. */
  def bucketOfL2(vec: Column, centroids: Seq[Seq[Double]]): Column = {
    val d2 = centroidSqDists(vec, centroids)
    array_position(d2, array_min(d2))
  }

  /** The `nprobe` nearest buckets under squared-L2 — the coarse probe to
    * pair with ADC scoring ([[graft.operators.PqIndex.ivfPqTopK]]). */
  def probeBucketsL2(vec: Column, centroids: Seq[Seq[Double]],
      nprobe: Int): Column = {
    val nlist = centroids.length
    val d2 = centroidSqDists(vec, centroids)
    val idx = sequence(lit(1), lit(nlist))
    val ranked = array_sort(
      zip_with(d2, idx, (d, i) => struct(d.as("d"), i.as("i"))),
      (l, r) => when(l.getField("d") < r.getField("d"), -1)
        .when(l.getField("d") > r.getField("d"), 1)
        .otherwise(l.getField("i") - r.getField("i")))
    transform(slice(ranked, 1, nprobe), s => s.getField("i"))
  }

  /** JVM twin of [[probeBucketsL2]] for a LOCAL query vector (serving
    * paths hold the bounded query set on the driver): same left-to-right
    * distance accumulation and same (distance, index) tie-break, so the
    * probed buckets are bit-identical to the expression's. 1-based. */
  private[graft] def probeBucketsL2Local(qv: Array[Double],
      centroids: Seq[Seq[Double]], nprobe: Int): Seq[Long] = {
    val d2 = centroids.map { c =>
      var s = 0.0
      var i = 0
      while (i < qv.length) { val d = qv(i) - c(i); s += d * d; i += 1 }
      s
    }
    d2.zipWithIndex.sortBy { case (d, i) => (d, i) }
      .take(nprobe).map(_._2 + 1L)
  }

  /** Persist the IVF index: the trained centroids (one row, as an
    * `array<array<double>>`) and the per-candidate bucket assignment
    * alongside its vector. Both are one map-side pass; at query time the
    * index is the ONLY thing read — no retraining, no corpus re-scan —
    * which is the production shape for a 100 TB embedding store (the
    * bucket table can additionally be partitioned by `bucket` on disk so
    * probes prune files). */
  def writeIndex(candidates: DataFrame, candId: String, candVec: String,
      path: String, nlist: Int = 16, seed: Long = 42L,
      metric: String = "cosine"): Unit = {
    require(metric == "cosine" || metric == "l2", s"metric: $metric")
    val spark = candidates.sparkSession
    import spark.implicits._
    val centroids = trainCentroids(candidates, candId, candVec, nlist, seed)
    Seq((centroids.map(_.toSeq), metric))
      .toDF("centroids", "metric")
      .write.mode("overwrite").parquet(s"$path/centroids")
    val cv = Similarity.asDouble(col(candVec))
    val bucket =
      if (metric == "l2") bucketOfL2(cv, centroids) else bucketOf(cv, centroids)
    candidates
      .select(col(candId).as("cand_id"), cv.as("cv"), bucket.as("bucket"))
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$path/buckets")
  }

  /** Ingest NEW vectors into a persisted index WITHOUT retraining:
    * assign each to its bucket under the STORED centroids (and the
    * stored metric, so coarse geometry stays consistent) and append to
    * the bucket-partitioned parquet. O(batch) work per ingest — one
    * map-side projection + a partitioned append; the corpus already in
    * the index is never re-read. The centroids drift from the true
    * k-means of the grown corpus over time — the standard IVF trade;
    * retrain (writeIndex) when recall floors degrade. MEASURED drift
    * (AnnDriftProbe, BASELINE.md r15): through 5 append batches of
    * 5% each (33% growth over the base), served recall@8 holds
    * WITHIN NOISE of a full retrain at the same geometry (clustered
    * 1.000 at every stage vs retrain's 0.97–1.00; near-uniform
    * corpus 0.35–0.37 both) — stale centroids cost nothing at this
    * growth scale; schedule retrains past ~30% growth or on a
    * distribution shift, verified with the probe. Idempotent: ids
    * already present in the index are skipped (one anti-join against
    * the pruned cand_id column), so a redelivered/retried batch —
    * e.g. a crash between this append and a streaming checkpoint
    * commit — never duplicates candidates in served top-k. */
  def appendVectors(spark: org.apache.spark.sql.SparkSession,
      path: String, newVecs: DataFrame, idCol: String,
      vecCol: String): Unit = {
    val (centroids, existing) = readIndex(spark, path)
    val metric = readIndexMetric(spark, path)
    val cv = Similarity.asDouble(col(vecCol))
    val bucket =
      if (metric == "l2") bucketOfL2(cv, centroids) else bucketOf(cv, centroids)
    newVecs
      .join(existing.select(col("cand_id").as(idCol)), Seq(idCol),
        "left_anti")
      .select(col(idCol).as("cand_id"), cv.as("cv"), bucket.as("bucket"))
      .write.mode("append").partitionBy("bucket")
      .parquet(s"$path/buckets")
  }

  /** Read a persisted IVF index back: (centroids, bucketed candidates). */
  def readIndex(spark: org.apache.spark.sql.SparkSession,
      path: String): (Seq[Seq[Double]], DataFrame) = {
    val centroids = spark.read.parquet(s"$path/centroids")
      .head().getAs[scala.collection.Seq[scala.collection.Seq[Double]]](
        "centroids")
      .map(_.toSeq).toSeq
    (centroids, spark.read.parquet(s"$path/buckets"))
  }

  /** The metric a persisted index was bucketed under ("cosine" | "l2") —
    * serving paths must score with the SAME metric the coarse
    * quantization pruned with. */
  def readIndexMetric(spark: org.apache.spark.sql.SparkSession,
      path: String): String =
    spark.read.parquet(s"$path/centroids").head().getAs[String]("metric")

  /** IVF top-k against a PERSISTED index: probe buckets from the stored
    * centroids, read only those bucket partitions. Same ranking and
    * tie-breaks as [[topK]], so results are identical for the same
    * (nlist, seed) geometry.
    *
    * Partition pruning is EXPLICIT, not left to dynamic pruning: the
    * probed bucket ids are evaluated first (bounded — queries are the
    * probe set, ≤ |queries|·nprobe values) and pushed as a static
    * `bucket IN (...)` partition filter, so the parquet scan lists only
    * the probed directories no matter what the optimizer decides about
    * the broadcast join. At 100 TB this is the difference between
    * reading nprobe/nlist of the index and reading all of it. */
  def topKAgainstIndex(queries: DataFrame, centroids: Seq[Seq[Double]],
      buckets: DataFrame, queryId: String, queryVec: String,
      k: Int, nprobe: Int = 4): DataFrame = {
    val qb = queries.select(col(queryId), col(queryVec),
      explode(probeBuckets(Similarity.asDouble(col(queryVec)), centroids,
        nprobe)).as("bucket"))
    val probed = qb.select(col("bucket").cast("long")).distinct()
      .collect().map(_.getLong(0)).sorted
    val scored = buckets.filter(col("bucket").isin(probed: _*))
      .join(broadcast(qb), "bucket")
      .filter(col("cand_id") =!= col(queryId))
      .select(col(queryId), col("cand_id"),
        Similarity.cosine(col(queryVec), col("cv")).as("cos"))
    val w = Window.partitionBy(col(queryId))
      .orderBy(col("cos").desc, col("cand_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }

  /** Recall@k served from a PERSISTED index: the approximate side probes
    * only `nprobe` bucket partitions; the exact baseline scans the
    * index's own stored vectors — the corpus is never re-read and the
    * centroids are never retrained. `exact` optionally injects a
    * precomputed exact top-k table ((query_id, cand_id) rows) so several
    * recall queries over the same corpus can share one baseline. */
  def recallAgainstIndex(queries: DataFrame, centroids: Seq[Seq[Double]],
      buckets: DataFrame, queryId: String, queryVec: String,
      k: Int, nprobe: Int = 4,
      exact: Option[DataFrame] = None): DataFrame = {
    val exactTop = exact.getOrElse(
      Similarity.bruteForceTopK(queries,
        buckets.select(col("cand_id"), col("cv")),
        queryId, queryVec, "cand_id", "cv", k)
        .select(col(queryId).as("query_id"), col("cand_id")))
    val approx = topKAgainstIndex(queries, centroids, buckets, queryId,
      queryVec, k, nprobe)
      .select(col(queryId).as("query_id"), col("cand_id"))
    val hits = exactTop.join(approx, Seq("query_id", "cand_id"), "left_semi")
      .groupBy(col("query_id")).agg(count(lit(1)).as("hits"))
    queries.select(col(queryId).as("query_id")).distinct()
      .join(hits, Seq("query_id"), "left_outer")
      .select(col("query_id").as(queryId),
        (coalesce(col("hits"), lit(0L)).cast("double") / k).as("recall"))
  }

  /** IVF top-k: candidates scored only inside the query's probed buckets.
    */
  def topK(queries: DataFrame, candidates: DataFrame,
      queryId: String, queryVec: String, candId: String, candVec: String,
      k: Int, nlist: Int = 16, nprobe: Int = 4, seed: Long = 42L): DataFrame = {
    val centroids = trainCentroids(candidates, candId, candVec, nlist, seed)
    val cb = candidates.withColumn("bucket",
      bucketOf(Similarity.asDouble(col(candVec)), centroids))
    val qb = queries.select(col(queryId), col(queryVec),
      explode(probeBuckets(Similarity.asDouble(col(queryVec)), centroids,
        nprobe)).as("bucket"))
    val scored = cb.join(broadcast(qb), "bucket")
      .filter(col(candId) =!= col(queryId))
      .select(col(queryId), col(candId),
        Similarity.cosine(col(queryVec), col(candVec)).as("cos"))
    val w = Window.partitionBy(col(queryId))
      .orderBy(col("cos").desc, col(candId))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }

  /** Recall@k of IVF vs the exact top-k. */
  def recall(queries: DataFrame, candidates: DataFrame,
      queryId: String, queryVec: String, candId: String, candVec: String,
      k: Int, nlist: Int = 16, nprobe: Int = 4, seed: Long = 42L): DataFrame = {
    val exact = Similarity.bruteForceTopK(queries, candidates, queryId,
      queryVec, candId, candVec, k).select(col(queryId), col(candId))
    val approx = topK(queries, candidates, queryId, queryVec, candId,
      candVec, k, nlist, nprobe, seed).select(col(queryId), col(candId))
    val hits = exact.join(approx, Seq(queryId, candId), "left_semi")
      .groupBy(col(queryId)).agg(count(lit(1)).as("hits"))
    queries.select(col(queryId)).distinct()
      .join(hits, Seq(queryId), "left_outer")
      .select(col(queryId),
        (coalesce(col("hits"), lit(0L)).cast("double") / k).as("recall"))
  }
}
