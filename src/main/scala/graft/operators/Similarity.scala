package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import scala.util.Random

/** Similarity search over an embedding column (`array<float>`):
  * brute-force cosine top-k as the exact baseline, and a seeded
  * sign-random-projection LSH index as the scale path (bucket the vectors
  * once, then only score within buckets — candidate cost scales with
  * bucket occupancy, not corpus size).
  *
  * The kernels (dot/cosine) are higher-order built-in expressions — no
  * UDFs, so scoring stays inside codegen.
  */
object Similarity extends Serializable {

  /** array<float> → array<double> via native Cast (codegen'd; a
    * transform() lambda here would knock the projection out of
    * whole-stage codegen). Exact widening either way. */
  def asDouble(c: Column): Column = c.cast("array<double>")

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** Composed higher-order formulation (4 array walks) — kept as the
    * reference implementation the native expression is tested against. */
  def cosineHof(a: Column, b: Column): Column = {
    val (ad, bd) = (asDouble(a), asDouble(b))
    dot(ad, bd) / (sqrt(dot(ad, ad)) * sqrt(dot(bd, bd)))
  }

  /** Cosine similarity — single-pass native Catalyst expression with
    * codegen ([[graft.expressions.ArrayCosine]]); bit-for-bit equal to
    * [[cosineHof]]. */
  def cosine(a: Column, b: Column): Column =
    graft.expressions.ArrayCosine(asDouble(a), asDouble(b))

  /** Exact top-k: broadcast the (small) query set against every candidate,
    * rank within query. Deterministic tie-break on the candidate id. */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame,
      queryId: String, queryVec: String, candId: String, candVec: String,
      k: Int): DataFrame = {
    val scored = candidates.crossJoin(broadcast(queries))
      .filter(col(candId) =!= col(queryId))
      .select(col(queryId), col(candId),
        cosine(col(queryVec), col(candVec)).as("cos"))
    val w = Window.partitionBy(col(queryId))
      .orderBy(col("cos").desc, col(candId))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }

  /** Deterministic random hyperplanes for sign-LSH. */
  def hyperplanes(dim: Int, bits: Int, seed: Long): Seq[Seq[Double]] = {
    val rnd = new Random(seed)
    Seq.fill(bits)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-random-projection bucket id: bit j = sign(v · plane_j). */
  def lshBucket(vec: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, j) =>
      when(dot(asDouble(vec), typedLit(p)) > 0, lit(1 << j)).otherwise(lit(0))
    }.reduce(_ + _)

  /** Replayable ±1 hyperplanes for the ORACLED sign-LSH face: component
    * (j, i) is the parity of the first hex nibble of md5("j|i") — a
    * public hash any SQL engine recomputes verbatim (the q176 md5-band
    * trick applied to random projections). Rademacher signs are a valid
    * sign-LSH family (Achlioptas-style sparse/±1 projections preserve
    * the angular hash property); the production path keeps seeded
    * Gaussians ([[hyperplanes]]). */
  def md5SignPlanes(dim: Int, bits: Int): Seq[Seq[Int]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Seq.tabulate(bits) { j =>
      Seq.tabulate(dim) { i =>
        val hex = md.digest(s"$j|$i".getBytes("UTF-8"))
        // first hex nibble = high nibble of byte 0
        if (((hex(0) >> 4) & 0x1) == 1) 1 else -1
      }
    }
  }

  /** Bucket id over EXACT integer arithmetic: the vector is quantized to
    * round(x·10⁶) longs, so the sign of each ±1-weighted dot product is
    * decided in ℤ — no float-summation-order wobble can flip a bucket
    * bit between engines. bit j = (Σᵢ wⱼᵢ·qᵢ > 0). */
  def lshBucketReplayable(vec: Column, planes: Seq[Seq[Int]]): Column = {
    val qv = transform(asDouble(vec), x => round(x * 1e6).cast("long"))
    planes.zipWithIndex.map { case (p, j) =>
      val d = aggregate(
        zip_with(qv, typedLit(p.map(_.toLong)), (x, w) => x * w),
        lit(0L), (acc, x) => acc + x)
      when(d > 0, lit(1 << j)).otherwise(lit(0))
    }.reduce(_ + _)
  }

  /** The ORACLED twin of [[annTopK]]: md5-derived ±1 hyperplanes +
    * integer bucket bits ([[lshBucketReplayable]]), then exact cosine
    * scoring within buckets — every stage SQL-replayable. */
  def annTopKReplayable(queries: DataFrame, candidates: DataFrame,
      queryId: String, queryVec: String, candId: String, candVec: String,
      k: Int, bits: Int = 4): DataFrame = {
    val dim = candidates.select(size(col(candVec))).first().getInt(0)
    val planes = md5SignPlanes(dim, bits)
    val qb = queries.withColumn("bucket",
      lshBucketReplayable(col(queryVec), planes))
    val cb = candidates.withColumn("bucket",
      lshBucketReplayable(col(candVec), planes))
    val scored = cb.join(broadcast(qb), "bucket")
      .filter(col(candId) =!= col(queryId))
      .select(col(queryId), col(candId),
        cosine(col(queryVec), col(candVec)).as("cos"))
    val w = Window.partitionBy(col(queryId))
      .orderBy(col("cos").desc, col(candId))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }

  /** Approximate top-k: queries only score candidates in their own LSH
    * bucket. `bits` trades recall for candidate-set size (2^bits buckets).
    */
  def annTopK(queries: DataFrame, candidates: DataFrame,
      queryId: String, queryVec: String, candId: String, candVec: String,
      k: Int, bits: Int = 8, seed: Long = 42L): DataFrame = {
    val dim = candidates.select(size(col(candVec))).first().getInt(0)
    val planes = hyperplanes(dim, bits, seed)
    val qb = queries.withColumn("bucket", lshBucket(col(queryVec), planes))
    val cb = candidates.withColumn("bucket", lshBucket(col(candVec), planes))
    val scored = cb.join(broadcast(qb), "bucket")
      .filter(col(candId) =!= col(queryId))
      .select(col(queryId), col(candId),
        cosine(col(queryVec), col(candVec)).as("cos"))
    val w = Window.partitionBy(col(queryId))
      .orderBy(col("cos").desc, col(candId))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }

  /** Recall@k of the ANN path against the exact top-k, per query —
    * the quality gauge for the bits/seed trade-off. `exact` optionally
    * injects a precomputed exact top-k table ((query_id, cand_id) rows,
    * any column names in that order) so recall queries over the same
    * corpus share one brute-force baseline instead of each recomputing
    * it. */
  def annRecall(queries: DataFrame, candidates: DataFrame,
      queryId: String, queryVec: String, candId: String, candVec: String,
      k: Int, bits: Int = 8, seed: Long = 42L,
      exact: Option[DataFrame] = None): DataFrame = {
    val exactTop = exact
      .map(df => df.toDF("query_id", "cand_id"))
      .getOrElse(bruteForceTopK(queries, candidates, queryId, queryVec,
        candId, candVec, k)
        .select(col(queryId).as("query_id"), col(candId).as("cand_id")))
    val approx = annTopK(queries, candidates, queryId, queryVec, candId,
      candVec, k, bits, seed)
      .select(col(queryId).as("query_id"), col(candId).as("cand_id"))
    val hits = exactTop.join(approx, Seq("query_id", "cand_id"), "left_semi")
      .groupBy(col("query_id")).agg(count(lit(1)).as("hits"))
    queries.select(col(queryId).as("query_id")).distinct()
      .join(hits, Seq("query_id"), "left_outer")
      .select(col("query_id").as(queryId),
        (coalesce(col("hits"), lit(0L)).cast("double") / k).as("recall"))
  }

  /** Recall floor as a driver-visible invariant: asserts the MEAN recall
    * meets `floor` AT EXECUTION TIME, and tags every row with the asserted
    * floor as a `min_recall` column. Wired into the recall queries
    * (q47/q66/q93) so an index regression fails the QUERY run loudly —
    * not just a ScalaTest gate — and the floor itself is recorded in the
    * output the driver hashes.
    *
    * The gate is a one-row aggregate (`count`, `avg(recall)`) whose
    * projection wraps `assert_true`; it rides a broadcast cross-join, so
    * the check runs on the cluster when the CALLER executes the frame —
    * the query stays lazy (plan-only callers pay nothing) and only a
    * single aggregated row ever reaches the driver, instead of the old
    * collect-everything-then-rebuild-a-local-relation eager path. An
    * EMPTY recall table yields an empty result without tripping the gate
    * (AQE's empty-relation propagation elides the join before the gate
    * row is built) — emptiness is surfaced by row-count checks downstream,
    * while this gate guards the recall VALUES.
    *
    * Floors are deliberately conservative: they must hold across scale
    * factors (candidate sets grow 10× between sf0.01 and sf0.1 while
    * index parameters stay fixed), and they exist to catch broken-metric
    * regressions (recall collapsing to chance level), not to pin exact
    * values — the tight per-SF values live in the specs. */
  /** SF-INDEXED mean-recall floors for the four recall-gated queries.
    * One constant shared across SFs invites exactly the failure r5 hit:
    * recall@k legitimately falls as the candidate set grows at fixed
    * index parameters, so a floor tight at one SF is a value-pin at
    * another, and the "fix" is a round of floor-lowering that erodes
    * the gate. Encoding the floor PER scale factor keeps each one tied
    * to its own chance level and measured series.
    *
    * Chance level (a random top-k's expected recall) is k/N with k=10:
    * N=500 at sf0.001/sf0.01 → 0.02; N=2000 at sf0.1 → 0.005. Floors
    * are set ≥2× the SF's chance level AND ≤½ the SF's measured mean
    * (2026-08-13 series — q47 sign-LSH: 0.14/0.08/0.14; q66 IVF:
    * 0.66/0.50/0.66; q93 PQ: 0.24/0.36/0.20; q115 16-dim PCA:
    * 0.30/0.22/0.06 across sf0.001/sf0.01/sf0.1), so they catch a
    * collapse to chance without pinning scale-dependent values. The
    * recall pipelines are seeded and deterministic per SF, so the
    * measured means move only when the index code or the data changes.
    * Unknown corpus directories fall back to the query's most
    * conservative catalogued floor. */
  object RecallFloors {
    private val table: Map[String, Map[String, Double]] = Map(
      "q47" -> Map("sf0.001" -> 0.04, "sf0.01" -> 0.04, "sf0.1" -> 0.04),
      "q66" -> Map("sf0.001" -> 0.30, "sf0.01" -> 0.25, "sf0.1" -> 0.30),
      "q93" -> Map("sf0.001" -> 0.12, "sf0.01" -> 0.15, "sf0.1" -> 0.10),
      "q115" -> Map("sf0.001" -> 0.15, "sf0.01" -> 0.10, "sf0.1" -> 0.04))
    def floor(query: String, sfDir: String): Double = {
      val m = table(query)
      m.getOrElse(new java.io.File(sfDir).getName, m.values.min)
    }
  }

  def assertRecallFloor(recalls: DataFrame, floor: Double): DataFrame = {
    // min_recall is derived THROUGH the assert column (null on success →
    // when(...isNull) yields the floor literal) so column pruning can
    // never drop the assertion out of the plan.
    val gate = recalls
      .agg(count(lit(1)).as("n"), avg(col("recall")).as("mean_recall"))
      .select(when(
        assert_true(col("n") >= 1 && col("mean_recall") >= floor,
          concat(lit("recall regression: mean recall "),
            coalesce(col("mean_recall").cast("string"), lit("NULL (empty)")),
            lit(f" < floor $floor%.2f"))).isNull,
        lit(floor)).as("min_recall"))
    recalls.crossJoin(broadcast(gate))
  }

  /** Exact top-k via the heap AGGREGATOR instead of a ranking window:
    * identical results (same tie-break), but only k rows per (query ×
    * map partition) reach the shuffle — the formulation for huge
    * candidate sets. */
  def bruteForceTopKAgg(queries: DataFrame, candidates: DataFrame,
      queryId: String, queryVec: String, candId: String, candVec: String,
      k: Int): DataFrame = {
    val scored = candidates.crossJoin(broadcast(queries))
      .filter(col(candId) =!= col(queryId))
      .select(col(queryId), col(candId),
        cosine(col(queryVec), col(candVec)).as("cos"))
    scored.groupBy(col(queryId))
      .agg(graft.functions.TopKAgg.topK(k)(col("cos"), col(candId))
        .as("top"))
      .select(col(queryId), posexplode(col("top")))
      .select(col(queryId), col("col._2").as(candId),
        col("col._1").as("cos"), (col("pos") + 1).as("rk"))
  }
}
