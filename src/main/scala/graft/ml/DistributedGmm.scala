package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Gaussian-mixture EM as pure DataFrame algebra — the
  * whole-corpus, oracle-able face of the reference's GMM family
  * ([[LocalGMM]] keeps the per-segment full-covariance production
  * path; q32/q37 stay rows-only for its Cholesky work).
  *
  * This face pins a 2-component, DIAGONAL-unit-covariance EM round
  * under the q158 determinism contract so a SQL engine can replay
  * every stage:
  *
  *  - init: π = (½, ½), μ = the first two points by id, Σ = I — all
  *    explicit, no RNG;
  *  - E-step log-likelihoods are quantized to `roundDp` dp BEFORE the
  *    softmax (the shared-constant terms cancel, so lₖ is just
  *    −½·d²(x, μₖ)), and responsibilities re-quantized after it — the
  *    one transcendental (exp) therefore consumes identical inputs in
  *    both engines and its ≤1-ulp library wobble is absorbed by the
  *    output quantization;
  *  - M-step means/weights are shuffle-order-sensitive sums, so they
  *    are re-quantized at `roundDp` dp before the second E-step
  *    consumes them (sum wobble ~1e-13 ≪ the 5e-7 rounding boundary);
  *  - the softmax is the stabilized odds form r₀ = 1/(1 + (π₁/π₀)·
  *    exp(l₁−l₀)) — no exp of large-magnitude sums, identical
  *    expression both sides.
  *
  * 100 TB shape: the E-step is a scan against two literal centroids,
  * the M-step is one aggregation; only bounded artifacts (2 init rows,
  * a 64-row mean table, 4 scalars) touch the driver.
  */
object DistributedGmm {

  private def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)

  /** One full EM round, replayable: E with the explicit init, M, then
    * the E-step again under the updated parameters. Returns (id, r0,
    * r0b, assign): r0 = component-0 responsibility under the init,
    * r0b = under the post-M parameters, assign = argmax of r0b (ties
    * → 0). */
  def emRoundReplayable(points: DataFrame, idCol: String, vecCol: String,
      roundDp: Int = 6): DataFrame = {
    val vecs = points.select(col(idCol).cast("long").as("id"),
      col(vecCol).cast("array<double>").as("v"))
    val init = vecs.orderBy(col("id")).limit(2).collect()
    require(init.length == 2, "need >= 2 points")
    val mu0 = init(0).getSeq[Double](1)
    val mu1 = init(1).getSeq[Double](1)
    def ll(mu: Seq[Double]): Column =
      round(lit(-0.5) * sqDist(col("v"), typedLit(mu)), roundDp)
    val r1 = vecs
      .withColumn("l0", ll(mu0)).withColumn("l1", ll(mu1))
      .withColumn("r0",
        round(lit(1.0) / (lit(1.0) + exp(col("l1") - col("l0"))), roundDp))
      .select(col("id"), col("v"), col("r0"))
    val w = r1.agg(
      sum(col("r0")).as("w0"), sum(lit(1.0) - col("r0")).as("w1"),
      round(avg(col("r0")), roundDp).as("p0"),
      round(avg(lit(1.0) - col("r0")), roundDp).as("p1")).collect()(0)
    val (w0, w1, p0, p1) =
      (w.getDouble(0), w.getDouble(1), w.getDouble(2), w.getDouble(3))
    val mus = r1.select(col("r0"), posexplode(col("v")))
      .groupBy(col("pos"))
      .agg(
        round(sum(col("r0") * col("col")) / lit(w0), roundDp).as("m0"),
        round(sum((lit(1.0) - col("r0")) * col("col")) / lit(w1), roundDp)
          .as("m1"))
      .orderBy(col("pos")).collect()
    val mu0n = mus.map(_.getDouble(1)).toSeq
    val mu1n = mus.map(_.getDouble(2)).toSeq
    r1.withColumn("l0b", ll(mu0n)).withColumn("l1b", ll(mu1n))
      .withColumn("r0b", round(lit(1.0) /
        (lit(1.0) + lit(p1 / p0) * exp(col("l1b") - col("l0b"))), roundDp))
      .select(col("id"), col("r0"), col("r0b"),
        when(col("r0b") >= 0.5, lit(0)).otherwise(lit(1)).as("assign"))
  }
}
