package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ml.LocalKMeans

/** Product quantization (PQ) for approximate nearest neighbour search:
  * split each D-dim vector into `m` subvectors, k-means a tiny codebook
  * per subspace, and store every vector as `m` small codes — here
  * 64×float → 8×byte-scale codes (32× compression). Queries score
  * candidates with ADC (asymmetric distance computation): one
  * m×k lookup table per query, then each candidate costs m table adds —
  * no float vector is ever touched at query time. This is the
  * memory-bound scale path: at 100 TB of embeddings the PQ codes fit in
  * a fraction of the footprint, and the exact re-rank (IVF/brute) runs
  * only on the short list.
  *
  * Deterministic: codebooks come from a seeded [[LocalKMeans]] on a
  * bounded seeded-uniform sample; encoding ties break on the first
  * minimum.
  */
object PqIndex extends Serializable {

  /** [subspace][centroid][dim] */
  final case class Codebook(m: Int, subDim: Int,
      centers: Array[Array[Array[Double]]]) extends Serializable

  /** Train per-subspace codebooks on a seeded uniform sample
    * ([[IvfIndex.seededSample]] — deterministic but id-order-independent;
    * bounded driver materialization, standard for codebook training). */
  def train(candidates: DataFrame, idCol: String, vecCol: String,
      m: Int, k: Int, seed: Long, sampleN: Int = 10000): Codebook = {
    val sample = IvfIndex.seededSample(candidates, idCol, vecCol,
      sampleN, seed)
    require(sample.nonEmpty, "empty training sample")
    val d = sample.head.length
    require(d % m == 0, s"dim $d not divisible by m=$m")
    val subDim = d / m
    val centers = Array.tabulate(m) { s =>
      val sub = sample.map(v => v.slice(s * subDim, (s + 1) * subDim))
      LocalKMeans.fit(sub, math.min(k, sub.length), seed + s).centers
    }
    Codebook(m, subDim, centers)
  }

  /** Reference encoder (plain JVM) — kept for spec cross-checks. */
  private[graft] def encodeVec(cb: Codebook, v: Seq[Double]): Seq[Int] =
    (0 until cb.m).map { s =>
      val off = s * cb.subDim
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < cb.centers(s).length) {
        var d2 = 0.0
        var i = 0
        while (i < cb.subDim) {
          val diff = v(off + i) - cb.centers(s)(c)(i)
          d2 += diff * diff
          i += 1
        }
        if (d2 < bestD) { bestD = d2; best = c } // first-min tie-break
        c += 1
      }
      best
    }

  /** PQ code of a vector column as PURE higher-order expressions, no UDF:
    * for each subspace, squared distances to its centroids ride a
    * `transform` over the centroid literal, and `array_position(d2,
    * array_min(d2))` picks the winner — array_position returns the FIRST
    * match, preserving the reference encoder's first-min tie-break.
    * Addition order inside each distance matches the hand loop
    * (`aggregate` folds left), so codes are bit-identical. */
  private[graft] def encodeExpr(vec: Column, cb: Codebook): Column =
    // let-bound: an unbound `vec` (an array cast) inside the centroid
    // lambda would be re-evaluated per centroid — m·k casts of the
    // full vector per row (the HOF-CSE term, BASELINE.md round 8)
    graft.functions.TextFunctions.bound(vec) { v =>
      array((0 until cb.m).map { s =>
        val d2s = graft.functions.TextFunctions.bound(
          slice(v, s * cb.subDim + 1, cb.subDim)) { sub =>
          transform(
            typedLit(cb.centers(s).map(_.toSeq).toSeq),
            c => aggregate(zip_with(sub, c, (a, b) => (a - b) * (a - b)),
              lit(0.0), (acc, x) => acc + x))
        }
        (array_position(d2s, array_min(d2s)) - 1L).cast("int")
      }: _*)
    }

  /** Encode every candidate vector into its PQ code (array<int> of
    * length m; values < k fit a byte at rest). One map-side pass of
    * built-in expressions. */
  def encode(candidates: DataFrame, idCol: String, vecCol: String,
      cb: Codebook): DataFrame =
    candidates.select(col(idCol).as("cand_id"),
      encodeExpr(Similarity.asDouble(col(vecCol)), cb).as("code"))

  /** Persist the PQ index: the codebook (one row) and the per-candidate
    * codes. At query time the codes table + codebook answer ADC searches
    * with no float vector and no retraining — the memory-bound scale
    * artifact (32× smaller than the embeddings it indexes). */
  def writeIndex(candidates: DataFrame, idCol: String, vecCol: String,
      path: String, m: Int, k: Int, seed: Long): Unit = {
    val spark = candidates.sparkSession
    import spark.implicits._
    val cb = train(candidates, idCol, vecCol, m, k, seed)
    Seq((cb.m, cb.subDim,
        cb.centers.map(_.map(_.toSeq).toSeq).toSeq))
      .toDF("m", "subDim", "centers")
      .write.mode("overwrite").parquet(s"$path/codebook")
    encode(candidates, idCol, vecCol, cb)
      .write.mode("overwrite").parquet(s"$path/codes")
  }

  /** Ingest NEW vectors into a persisted PQ index WITHOUT retraining:
    * encode the batch under the STORED codebook and append the codes —
    * O(batch) work, the indexed corpus (and its codes) is never
    * re-read. Same trade as [[IvfIndex.appendVectors]]: the codebook
    * drifts from the grown corpus's optimum; retrain when recall floors
    * degrade. */
  def appendVectors(spark: SparkSession, path: String,
      newVecs: DataFrame, idCol: String, vecCol: String): Unit = {
    // idempotent like IvfIndex.appendVectors: already-indexed ids are
    // anti-joined away so a retried batch never duplicates codes
    val (cb, existing) = readIndex(spark, path)
    encode(newVecs.join(existing.select(col("cand_id").as(idCol)),
        Seq(idCol), "left_anti"),
      idCol, vecCol, cb)
      .write.mode("append").parquet(s"$path/codes")
  }

  /** Read a persisted PQ index back: (codebook, codes). The codes
    * DataFrame plugs straight into [[adcTopK]]. */
  def readIndex(spark: SparkSession, path: String): (Codebook, DataFrame) = {
    val r = spark.read.parquet(s"$path/codebook").head()
    val centers = r.getAs[scala.collection.Seq[
        scala.collection.Seq[scala.collection.Seq[Double]]]]("centers")
      .map(_.map(_.toArray).toArray).toArray
    (Codebook(r.getAs[Int]("m"), r.getAs[Int]("subDim"), centers),
      spark.read.parquet(s"$path/codes"))
  }

  /** ADC top-k: per query, an m×k table of partial squared distances is
    * computed once (driver-side — queries are the bounded probe set) and
    * broadcast; every candidate then costs m lookups. Returns
    * (query_id, cand_id, adc_dist, rk). */
  def adcTopK(spark: SparkSession, queries: Seq[(Long, Array[Double])],
      encoded: DataFrame, cb: Codebook, k: Int): DataFrame = {
    import spark.implicits._
    val qDf = queries.map(_._1).toDF("query_id")
    val pairs = qDf.crossJoin(encoded)
      .filter($"query_id" =!= $"cand_id")
      .select($"query_id", $"cand_id", $"code")
    scoreAdc(spark, queries, pairs, cb, k)
  }

  /** IVF-PQ: coarse quantization prunes the candidate set to the
    * query's `nprobe` nearest IVF buckets, then PQ/ADC scores only those
    * — the FAISS-style pairing where candidate COUNT drops by
    * ~nprobe/nlist and candidate COST drops to m table adds. Index
    * artifacts (bucket id + PQ code per vector) are both one map-side
    * pass; at 100 TB they are the only thing read at query time. */
  def ivfPqTopK(spark: SparkSession, candidates: DataFrame, idCol: String,
      vecCol: String, queryIds: Seq[Long], nlist: Int, nprobe: Int,
      m: Int, kCent: Int, seed: Long, topK: Int): DataFrame = {
    import spark.implicits._
    val centroids = IvfIndex.trainCentroids(candidates, idCol, vecCol,
      nlist, seed)
    val cb = train(candidates, idCol, vecCol, m, kCent, seed)
    // Coarse quantization uses squared-L2 (bucketOfL2/probeBucketsL2) so
    // it ranks buckets with the SAME metric ADC scores candidates with —
    // cosine pruning over unnormalized embeddings could discard true L2
    // nearest neighbours before ADC ever sees them.
    val indexed = encode(candidates, idCol, vecCol, cb)
      .join(candidates.select(col(idCol).as("cand_id"),
        IvfIndex.bucketOfL2(Similarity.asDouble(col(vecCol)), centroids)
          .as("bucket")), "cand_id")
    val vecs = candidates.select(col(idCol).cast("long").as("id"),
      Similarity.asDouble(col(vecCol)).as("v"))
    val queries = vecs.filter($"id".isin(queryIds: _*)).collect()
      .map(r => r.getLong(0) ->
        r.getAs[scala.collection.Seq[Double]]("v").toArray)
      .toSeq.sortBy(_._1)
    val qBuckets = candidates.filter(col(idCol).isin(queryIds: _*))
      .select(col(idCol).cast("long").as("query_id"),
        explode(IvfIndex.probeBucketsL2(
          Similarity.asDouble(col(vecCol)), centroids, nprobe))
          .as("bucket"))
    val pruned = qBuckets.join(indexed, "bucket")
      .filter($"query_id" =!= $"cand_id")
      .select($"query_id", $"cand_id", $"code")
    scoreAdc(spark, queries, pruned, cb, topK)
  }

  /** ADC scoring with NO UDF: the per-query m×k lookup table rides along
    * as an `array<array<double>>` column on a broadcast-joined one-row-
    * per-query table, and the score is pure higher-order expressions —
    * `zip_with(code, adc, (c, t) => t[c+1])` then an ordered `aggregate`
    * sum (same left-to-right addition order as a hand loop, so results
    * are bit-identical and deterministic). No driver-side broadcast
    * variable, and the plan shows the join + projection instead of an
    * opaque function call. */
  private[graft] def scoreAdc(spark: SparkSession,
      queries: Seq[(Long, Array[Double])], pairs: DataFrame, cb: Codebook,
      k: Int): DataFrame = {
    import spark.implicits._
    val adcDf = queries
      .map { case (qid, qv) => (qid, adcTable(qv, cb).map(_.toSeq).toSeq) }
      .toDF("query_id", "adc")
    val w = Window.partitionBy($"query_id")
      .orderBy($"adc_dist".asc, $"cand_id".asc)
    pairs.join(broadcast(adcDf), "query_id")
      .select($"query_id", $"cand_id",
        aggregate(
          zip_with($"code", $"adc", (c, t) => element_at(t, c + lit(1))),
          lit(0.0), (acc, x) => acc + x).as("adc_dist"))
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= k)
  }

  /** Per-query ADC table: partial squared distance of each subvector to
    * every centroid of its subspace. */
  private def adcTable(qv: Array[Double],
      cb: Codebook): Array[Array[Double]] =
    Array.tabulate(cb.m) { s =>
      val off = s * cb.subDim
      cb.centers(s).map { c =>
        var d2 = 0.0
        var i = 0
        while (i < cb.subDim) {
          val diff = qv(off + i) - c(i)
          d2 += diff * diff
          i += 1
        }
        d2
      }
    }

  /** IVF-PQ served entirely from PERSISTED artifacts: the L2-bucketed
    * IVF index ([[IvfIndex.writeIndex]] with `metric = "l2"`) prunes to
    * the `nprobe` probed bucket partitions (explicit `bucket IN (...)`
    * partition filter — nothing else is read), and the persisted PQ
    * codes + codebook score the survivors via ADC. No retraining, no
    * float-vector scan: exactly the artifacts, which is the point of the
    * index at 100 TB. Results are identical to [[ivfPqTopK]] for the
    * same geometry and seed. */
  def ivfPqTopKAgainstIndex(spark: SparkSession,
      queries: Seq[(Long, Array[Double])], centroids: Seq[Seq[Double]],
      buckets: DataFrame, cb: Codebook, codes: DataFrame,
      nprobe: Int, topK: Int): DataFrame = {
    import spark.implicits._
    val qProbe = queries.flatMap { case (qid, qv) =>
      IvfIndex.probeBucketsL2Local(qv, centroids, nprobe).map(b => (qid, b))
    }
    val probed = qProbe.map(_._2).distinct.sorted
    val qbDf = qProbe.toDF("query_id", "bucket")
    val pruned = buckets.filter(col("bucket").isin(probed: _*))
      .select(col("cand_id"), col("bucket"))
      .join(broadcast(qbDf), "bucket")
      .filter($"query_id" =!= $"cand_id")
      .join(codes, "cand_id")
      .select($"query_id", $"cand_id", $"code")
    scoreAdc(spark, queries, pruned, cb, topK)
  }

  /** The REPLAYABLE PQ search — codebook fit + encode + ADC ranking
    * under the q158 determinism contract, so every stage is
    * relationally verifiable (the q188 oracle): per subspace, a
    * [[graft.ml.DistributedKMeans.fit]] (init = first k subvectors by
    * id, fixed unrolled rounds, 6-dp centroid quantization) both
    * TRAINS the subspace codebook and ENCODES every vector (the fit's
    * final argmin IS the first-min PQ code); queries (id < maxQueryId)
    * score candidates with ADC — per subspace a k-row query-to-centroid
    * distance table, per candidate m broadcast-join lookups summed
    * left-to-right. The seeded-sample production path ([[train]]/
    * [[adcTopK]]) keeps its LocalKMeans codebooks; THIS face pins the
    * split → per-subspace-fit → code-lookup → ADC-sum pipeline.
    * Returns (query_id, cand_id, adc_d2 rounded 6 dp, rk ≤ topK).
    *
    * 100 TB shape: codes never leave their partitions until the final
    * per-query top-k; the m id-joins building the wide code table
    * share one shuffle key (id), and every ADC join broadcasts a
    * (queries × k)-row table. */
  def adcTopKReplayable(points: DataFrame, idCol: String, vecCol: String,
      m: Int, k: Int, iterations: Int, maxQueryId: Long, topK: Int,
      dim: Int = 64): DataFrame = {
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val spark = points.sparkSession
    import spark.implicits._
    val subDim = dim / m
    val vecs = points
      .select(col(idCol).cast("long").as("id"),
        Similarity.asDouble(col(vecCol)).as("v"))
      .persist()
    val out = adcScoreReplayable(vecs, m, k, iterations, subDim,
      maxQueryId, topK, candFilter = None)
    out.persist().count()
    vecs.unpersist()
    out
  }

  /** The REPLAYABLE IVF-PQ composite (q195): the q185 coarse stage —
    * a full-dim [[graft.ml.DistributedKMeans.fit]] (first-`nlist`
    * init, q158 contract) whose per-query `nprobe` nearest lists
    * (d², centroid-id tie-break) prune the candidate set — feeding the
    * q188 ADC stage, which scores ONLY the surviving candidates. The
    * FAISS pairing, relationally verified end-to-end: candidate COUNT
    * drops by ~nprobe/nlist, candidate COST drops to m table adds,
    * and DuckDB replays both prunes and every ADC sum. The
    * seeded-codebook production composite ([[ivfPqTopK]]) stays
    * rows-only. */
  def ivfAdcTopKReplayable(points: DataFrame, idCol: String,
      vecCol: String, m: Int, k: Int, iterations: Int, nlist: Int,
      nprobe: Int, maxQueryId: Long, topK: Int,
      dim: Int = 64): DataFrame = {
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val spark = points.sparkSession
    import spark.implicits._
    val vecs = points
      .select(col(idCol).cast("long").as("id"),
        Similarity.asDouble(col(vecCol)).as("v"))
      .persist()
    val (caf, ccents) = graft.ml.DistributedKMeans.fit(
      vecs, "id", "v", nlist, iterations)
    val qd = vecs.filter($"id" < maxQueryId)
      .crossJoin(broadcast(ccents))
      .select($"id".as("qid"), $"c",
        aggregate(zip_with($"v", $"cv", (a, b) => (a - b) * (a - b)),
          lit(0.0), (acc, x) => acc + x).as("d2"))
    val wp = Window.partitionBy($"qid").orderBy($"d2".asc, $"c".asc)
    val probed = qd.withColumn("rk", row_number().over(wp))
      .filter($"rk" <= nprobe).select($"qid", $"c")
    val cands = probed
      .join(caf.select($"cluster".as("c"), $"id"), "c")
      .select($"qid", $"id")
    val out = adcScoreReplayable(vecs, m, k, iterations, dim / m,
      maxQueryId, topK, candFilter = Some(cands))
    out.persist().count()
    vecs.unpersist()
    out
  }

  /** Shared ADC stage of the replayable faces: per-subspace q158 fits
    * (codebook + codes from the same fit), wide code table, m
    * broadcast-join table lookups summed left-to-right; `candFilter`
    * (qid, id) restricts scoring to pruned candidates (the IVF-PQ
    * composite) — None scores everything (the flat-PQ face). */
  private def adcScoreReplayable(vecs: DataFrame, m: Int, k: Int,
      iterations: Int, subDim: Int, maxQueryId: Long, topK: Int,
      candFilter: Option[DataFrame]): DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    // ALL m subspace codebooks fit in one grouped Lloyd
    // ([[graft.ml.DistributedKMeans.fitGrouped]]): the corpus is sliced
    // once into (g, id, subvector) rows and every round is ONE scan +
    // ONE shuffle for the whole product quantizer — not m fits of
    // `iterations` rounds each. Init mirrors fit's default per slice:
    // the first k ids' subvectors (the id set is shared by every
    // slice, so one k-row limit seeds all m groups). Per-subspace math
    // is unchanged (PqSpec pins fitGrouped ≡ per-slice fit), so the
    // q188/q195 oracles hold verbatim.
    val sliceStructs = (0 until m).map(s =>
      struct(lit(s).as("g"), slice($"v", s * subDim + 1, subDim).as("v")))
    val sub = vecs.select($"id", explode(array(sliceStructs: _*)).as("sv"))
      .select($"sv.g".as("g"), $"id", $"sv.v".as("v"))
    val inits = vecs.orderBy($"id").limit(k)
      .select($"id", $"v")
      .crossJoin(spark.range(m).select($"id".cast("int").as("g")))
      .select($"g", $"id".as("c"),
        slice($"v", $"g" * lit(subDim) + 1, lit(subDim)).as("cv"))
    // checkpointFinal = false: everything here funnels into the ONE
    // persist().count() action of the caller, so the lazy lineage keeps
    // intra-plan exchange reuse and cross-repeat cache reuse intact
    // (see fitGrouped's scaladoc for the measured 2.9-vs-1.1 s A/B)
    val (gaf, gcents) = graft.ml.DistributedKMeans.fitGrouped(
      sub, inits, iterations, checkpointFinal = false)
    // wide code table: one row per candidate, m code columns — a
    // single pivot by id replaces the m-way self-join chain
    val wide0 = gaf.groupBy($"id")
      .pivot("g", 0 until m)
      .agg(first($"cluster"))
      .select($"id" +: (0 until m).map(s => col(s"$s").as(s"c$s")): _*)
    // per-query ADC tables: every subspace's query-to-centroid
    // distances off the checkpointed centroid frame; LAZY — the per-s
    // filters below re-derive from the persisted vecs cache inside the
    // one final action, exactly like the pre-grouped shape did
    val qds = sub.filter($"id" < maxQueryId)
      .join(broadcast(gcents), "g")
      .select($"g", $"id".as("qid"), $"c",
        aggregate(zip_with($"v", $"cv", (a, b) => (a - b) * (a - b)),
          lit(0.0), (acc, x) => acc + x).as("t"))
    val parts = (0 until m).map { s =>
      qds.filter($"g" === s)
        .select($"qid", $"c".as(s"c$s"), $"t".as(s"t$s"))
    }
    // IVF prune (when present) BEFORE the ADC lookups: only surviving
    // (qid, cand) rows pay the m joins
    val wide = candFilter match {
      case Some(cands) => wide0.join(cands, "id")
      case None        => wide0
    }
    // ADC: each subspace lookup is a broadcast join against the
    // (queries × k)-row distance table; with no prune the first join
    // introduces qid
    val scored = parts.zipWithIndex.foldLeft(wide) {
      case (acc, (qd, s)) =>
        if (s == 0 && candFilter.isEmpty)
          acc.join(broadcast(qd), Seq(s"c$s"))
        else acc.join(broadcast(qd), Seq("qid", s"c$s"))
    }
    val adc = (0 until m).map(s => col(s"t$s")).reduceLeft(_ + _)
    val w = Window.partitionBy($"qid").orderBy($"adc".asc, $"id".asc)
    scored.filter($"id" =!= $"qid")
      .select($"qid", $"id", adc.as("adc"))
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= topK)
      .select($"qid".as("query_id"), $"id".as("cand_id"),
        round($"adc", 6).as("adc_d2"), $"rk")
      .orderBy($"query_id", $"rk")
  }

  /** Recall@k of the ADC short list against the exact (brute-force
    * squared-L2) top-k, with the quantization side served from PREBUILT
    * artifacts (codebook + codes — persisted or cached): only the exact
    * baseline touches float vectors. */
  def recallAgainstIndex(spark: SparkSession, candidates: DataFrame,
      idCol: String, vecCol: String, queryIds: Seq[Long], cb: Codebook,
      encoded: DataFrame, topK: Int): DataFrame = {
    import spark.implicits._
    val vecs = candidates
      .select(col(idCol).cast("long").as("id"),
        Similarity.asDouble(col(vecCol)).as("v"))
    val queries = vecs.filter($"id".isin(queryIds: _*))
      .collect()
      .map(r => r.getLong(0) ->
        r.getAs[scala.collection.Seq[Double]]("v").toArray)
      .toSeq.sortBy(_._1)
    val approx = adcTopK(spark, queries, encoded, cb, topK)
      .select($"query_id", $"cand_id")
    // exact squared-L2 top-k over the same candidates
    val q = vecs.filter($"id".isin(queryIds: _*))
      .select($"id".as("query_id"), $"v".as("qv"))
    val exact = q.crossJoin(vecs.select($"id".as("cand_id"), $"v".as("cv")))
      .filter($"query_id" =!= $"cand_id")
      .select($"query_id", $"cand_id",
        aggregate(zip_with($"qv", $"cv", (a, b) => (a - b) * (a - b)),
          lit(0.0), (acc, x) => acc + x).as("d2"))
      .withColumn("rk", row_number().over(
        Window.partitionBy($"query_id").orderBy($"d2".asc, $"cand_id".asc)))
      .filter($"rk" <= topK)
      .select($"query_id", $"cand_id")
    approx.join(exact, Seq("query_id", "cand_id"))
      .groupBy($"query_id").agg(count(lit(1)).as("hits"))
      .select($"query_id",
        round($"hits".cast("double") / topK, 4).as("recall"))
      .orderBy($"query_id")
  }

  /** Recall@k of the ADC short list against the exact (brute-force
    * squared-L2) top-k, training + encoding in-query (the one-shot
    * form; production callers pass persisted artifacts to
    * [[recallAgainstIndex]]). */
  def recall(spark: SparkSession, candidates: DataFrame, idCol: String,
      vecCol: String, queryIds: Seq[Long], m: Int, kCent: Int, seed: Long,
      topK: Int): DataFrame = {
    val cb = train(candidates, idCol, vecCol, m, kCent, seed)
    recallAgainstIndex(spark, candidates, idCol, vecCol, queryIds, cb,
      encode(candidates, idCol, vecCol, cb), topK)
  }
}
