package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Semantic deduplication over an embedding column (SemDeDup, Abbas et
  * al. 2023, arXiv:2303.09540): cluster the embedding space coarsely,
  * then find near-duplicate pairs ONLY within each cluster — total
  * pairwise work is Σ|cluster|², not n², and each cluster's self-join is
  * an independent shuffle partition. The coarse clusters reuse the IVF
  * machinery ([[IvfIndex.trainCentroids]] / [[IvfIndex.bucketOf]]): a
  * seeded deterministic k-means on a seeded sample, so the whole
  * pipeline is a pure function of (data, seed) — partition-count
  * invariant like every other operator here.
  *
  * Scale shape (100 TB): centroid training reads a bounded sample;
  * assignment is one map-side projection; the within-cluster self-join
  * shuffles on the cluster id; `maxCluster` bounds the worst cluster's
  * quadratic work exactly like [[Dedup.lshCandidates]]'s bucket cap —
  * oversized clusters degrade to a linear star around their min-id
  * representative (family stays connected through the rep; rep pairs
  * still pass the cosine test; member↔member pairs are the accepted
  * recall loss, counted via [[CapObserver]]).
  */
object SemDedup {

  /** Assign each vector to its semantic cluster (1-based id, max-cosine
    * centroid, first max wins — deterministic). */
  def assignClusters(vectors: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[Seq[Double]]): DataFrame =
    vectors.select(col(idCol),
      Similarity.asDouble(col(vecCol)).as("v"))
      .withColumn("cluster",
        IvfIndex.bucketOf(col("v"), centroids).cast("long"))

  /** Semantic near-duplicate pairs: (id_a < id_b, cluster, cos) for every
    * same-cluster pair with cosine ≥ `tau`. */
  def nearDupPairs(vectors: DataFrame, idCol: String, vecCol: String,
      nClusters: Int = 16, tau: Double = 0.95, seed: Long = 42L,
      maxCluster: Int = Dedup.DefaultMaxBucket): DataFrame = {
    val centroids = IvfIndex.trainCentroids(vectors, idCol, vecCol,
      nClusters, seed)
    val assigned = assignClusters(vectors, idCol, vecCol, centroids)
    pairsWithin(assigned, idCol, tau, maxCluster)
  }

  /** Pairwise cosine ≥ tau within each cluster of a pre-assigned
    * (id, v, cluster) table, bucket-capped like the LSH candidate join. */
  private[graft] def pairsWithin(assigned: DataFrame, idCol: String,
      tau: Double, maxCluster: Int): DataFrame = {
    val cosOk: Column = Similarity.cosine(col("va"), col("vb")) >= tau
    val a = assigned.select(col("cluster"), col(idCol).as("id_a"),
      col("v").as("va"))
    val b = assigned.select(col("cluster"), col(idCol).as("id_b"),
      col("v").as("vb"))
    val pairs =
      if (maxCluster <= 0)
        a.join(b, Seq("cluster")).filter(col("id_a") < col("id_b"))
      else {
        val sizes = CapObserver.observeCapped(
          assigned.groupBy(col("cluster"))
            .agg(count(lit(1)).as("n"), min(col(idCol)).as("rep")),
          "semdedup", maxCluster)
        val sized = assigned.join(sizes, Seq("cluster"))
        val small = sized.filter(col("n") <= maxCluster)
        val smallPairs = small
          .select(col("cluster"), col(idCol).as("id_a"), col("v").as("va"))
          .join(small.select(col("cluster"), col(idCol).as("id_b"),
            col("v").as("vb")), Seq("cluster"))
          .filter(col("id_a") < col("id_b"))
        // rep = min(id) per cluster: star edges are already ordered
        val reps = sized.filter(col(idCol) === col("rep"))
          .select(col("cluster"), col("rep").as("id_a"), col("v").as("va"))
        val starPairs = sized
          .filter(col("n") > maxCluster && col(idCol) =!= col("rep"))
          .select(col("cluster"), col(idCol).as("id_b"), col("v").as("vb"))
          .join(reps, Seq("cluster"))
        smallPairs.unionByName(starPairs)
      }
    pairs.filter(cosOk)
      .select(col("cluster"), col("id_a"), col("id_b"),
        Similarity.cosine(col("va"), col("vb")).as("cos"))
  }

  /** Keep one representative (min id) per semantic-duplicate family:
    * connected components over the pair edges, then one anti-join — same
    * finalization as the text dedup stack ([[Dedup.keepCanonical]]). */
  def keep(vectors: DataFrame, idCol: String, pairs: DataFrame): DataFrame =
    Dedup.keepCanonical(vectors, idCol,
      pairs.select(col("id_a"), col("id_b")))
}
