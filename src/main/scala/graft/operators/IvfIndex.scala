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

  /** Train coarse centroids from a deterministic sample of the candidate
    * vectors (first `sampleN` by id — bounded driver materialization). */
  def trainCentroids(candidates: DataFrame, candId: String, candVec: String,
      nlist: Int, seed: Long, sampleN: Int = 10000): Seq[Seq[Double]] = {
    val sample = candidates
      .select(col(candId), Similarity.asDouble(col(candVec)).as("v"))
      .orderBy(col(candId)).limit(sampleN)
      .collect()
      .map(_.getAs[scala.collection.Seq[Double]]("v").toArray)
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
