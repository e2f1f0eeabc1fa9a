package graft

import org.apache.spark.sql.functions._

import graft.operators.{IvfIndex, SemDedup}

/** Semantic dedup: planted-clone recovery on real embeddings, cap
  * degradation, and keep-one family semantics. */
class SemDedupSpec extends GraftSuite {

  test("planted near-identical clones are found and deduped") {
    val s = spark
    import s.implicits._
    val e = Tables.embeddings(spark, sf).select($"vec_id", $"embedding")
    val clones = e.filter($"vec_id" % 20 === 0)
      .select(($"vec_id" + 1000000L).as("vec_id"),
        transform($"embedding",
          (x, i) => x + when(i === 0, lit(0.05f)).otherwise(lit(0.0f)))
          .as("embedding"))
    val nClones = clones.count()
    assert(nClones > 0)
    val corpus = e.unionByName(clones)
    val pairs = SemDedup.nearDupPairs(corpus, "vec_id", "embedding",
      nClusters = 8, tau = 0.95, seed = 42L)

    // every found pair is a planted (id, id+1e6) edge, and every planted
    // edge is found (clone cosine ≈ 0.999+, everything else < 0.6 in
    // this table, and a near-identical pair lands in the same max-cosine
    // cluster)
    val found = pairs.select($"id_a", $"id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = clones.select($"vec_id").collect()
      .map(r => { val c = r.getLong(0); (c - 1000000L, c) }).toSet
    assert(found === planted)

    // keep-one removes exactly the clones (min id = the original)
    val kept = SemDedup.keep(corpus, "vec_id", pairs)
    assert(kept.count() === e.count())
    assert(kept.filter($"vec_id" >= 1000000L).count() === 0)
  }

  test("oversized clusters degrade to a star but families stay connected") {
    val s = spark
    import s.implicits._
    // 5 identical vectors: one cluster of 5; cap 2 forces the star path
    val vecs = (1L to 5L).map(i => (i, Array(1.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val centroids = Seq(Seq(1.0, 0.0, 0.0))
    val assigned = SemDedup.assignClusters(vecs, "vec_id", "embedding",
      centroids)
    val pairs = SemDedup.pairsWithin(assigned, "vec_id", tau = 0.99,
      maxCluster = 2)
    val found = pairs.select($"id_a", $"id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // star around min id 1: (1,2),(1,3),(1,4),(1,5) — linear, connected
    assert(found === Set((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L)))
    val kept = SemDedup.keep(vecs, "vec_id", pairs)
    assert(kept.select($"vec_id").collect().map(_.getLong(0)).toSeq
      === Seq(1L))
  }

  test("clustering bounds the pairwise work: no cross-cluster pairs") {
    val s = spark
    import s.implicits._
    val e = Tables.embeddings(spark, sf).select($"vec_id", $"embedding")
    val centroids = IvfIndex.trainCentroids(e, "vec_id", "embedding",
      nlist = 8, seed = 42L)
    val assigned = SemDedup.assignClusters(e, "vec_id", "embedding",
      centroids)
    // tau = -1 accepts EVERY same-cluster pair: the pair count must be
    // exactly sum n_c·(n_c-1)/2 — the Σ|c|² bound, not n²
    val pairs = SemDedup.pairsWithin(assigned, "vec_id", tau = -1.0,
      maxCluster = 0)
    val perCluster = assigned.groupBy($"cluster").count()
      .collect().map(_.getLong(1))
    val expected = perCluster.map(n => n * (n - 1) / 2).sum
    assert(pairs.count() === expected)
    val n = e.count()
    assert(expected < n * (n - 1) / 2) // strictly better than all-pairs
  }
}
