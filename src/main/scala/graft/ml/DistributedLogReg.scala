package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed logistic-regression training as pure DataFrame algebra —
  * the whole-corpus, oracle-able face of the quality-classifier family
  * ([[QualityClassifier]] keeps the production path: xxhash64 features,
  * bounded driver-side training sample, 50-100 GD iterations; q135
  * stays rows-only for that engine-side hash).
  *
  * This face pins a replayable fit under the q158 determinism
  * contract so a SQL engine can recompute the TRAINING, not just the
  * scoring:
  *
  *  - features are the PORTABLE sha-256 gram buckets
  *    ([[graft.operators.Dsir.gramRows]] with portable=true — the
  *    q177 hash family), so both engines hash identically; per-doc
  *    bucket counts are normalized by the doc's gram count (exact
  *    integer division in double, identical operands);
  *  - the BIAS travels as feature `buckets` with x=1 on every doc, so
  *    each batch-GD round is ONE aggregation: z per doc → σ → the
  *    per-bucket gradient sum((p−y)·x)/m, collected as a
  *    (buckets+1)-row bounded artifact;
  *  - every order-sensitive reduction is quantized before anything
  *    nonlinear consumes it: the margin z at `roundDp` dp BEFORE the
  *    sigmoid, the sigmoid output after it (absorbing exp()'s ≤1-ulp
  *    library wobble — the q182 precedent), and the updated weights
  *    after the gradient step (driver-side with Spark's round
  *    semantics — BigDecimal HALF_UP, like [[Pca.powerIterationTopPc]]).
  *
  * 100 TB shape: per round, one scan of the persisted (doc, bucket, x)
  * feature frame joined against a broadcast (buckets+1)-row weight
  * table + one aggregation — never a collect of data rows; `buckets`
  * and the round count bound the driver traffic.
  */
object DistributedLogReg {

  /** Train `iters` unrolled batch-GD rounds (lr, no regularization —
    * the replay contract favors the simplest exactly-stated update)
    * and score every input row with the final weights. Returns
    * (idCol, label, score) with score = σ(z) at `roundDp` dp — scores
    * are the quality-classifier production semantics (a downstream
    * threshold or top-k consumes them); on the synthetic corpus the
    * lang signal is weak (~0.005 token-distribution deltas), so the
    * fit's evidence of learning is the RANKING separation (AUC ≈ 0.64
    * at 6 rounds vs 0.5 chance — spec-gated), not an accuracy
    * headline. */
  /** The per-doc probability frame's broadcast budget (r16
    * optimization round, guide §3.1): each GD round joins the
    * DOC-sized (id, p, y) frame back onto the persisted feature frame
    * to form the gradient. Planned cold, the post-aggregation frame
    * has no size statistics, so Catalyst picks sort-merge and every
    * round exchanges the feature frame before AQE flips to broadcast
    * at runtime. The doc count `m` is already measured for the
    * gradient divisor — reusing it to HINT the broadcast statically
    * removes the feature-side exchange from all `iters` rounds; past
    * the budget (~48 bytes/row, a few hundred million docs) the hint
    * stays off and the plan degrades to today's shuffle join. */
  val DefaultProbBroadcastBytes: Long = 256L << 20

  def fitScoreReplayable(df: DataFrame, idCol: String, textCol: String,
      isTarget: Column, buckets: Int = 64, iters: Int = 6,
      lr: Double = 6.0, roundDp: Int = 6,
      probBroadcastBudgetBytes: Long = DefaultProbBroadcastBytes)
      : DataFrame = {
    require(buckets > 1 && iters >= 1)
    val spark = df.sparkSession
    val marked = df.select(col(idCol), col(textCol),
      isTarget.cast("boolean").as("__tgt"))
    val grams = graft.operators.Dsir.gramRows(marked, idCol, textCol,
      buckets, seed = 0L, keep = Seq("__tgt"), portable = true)
    // per-(doc, bucket) normalized counts; y rides along
    val counts = grams.groupBy(col(idCol), col("__tgt"), col("bucket"))
      .agg(count(lit(1)).cast("double").as("c"))
    val totals = counts.groupBy(col(idCol))
      .agg(sum(col("c")).as("n"))
    val feat = counts.join(totals, idCol)
      .select(col(idCol), col("bucket"),
        (col("c") / col("n")).as("x"),
        when(col("__tgt"), lit(1.0)).otherwise(lit(0.0)).as("y"))
    // bias = feature `buckets` with x = 1 on every doc — one shared
    // aggregation then serves every gradient component
    val bias = totals.join(
        counts.select(col(idCol), col("__tgt")).distinct(), idCol)
      .select(col(idCol), lit(buckets.toLong).as("bucket"),
        lit(1.0).as("x"),
        when(col("__tgt"), lit(1.0)).otherwise(lit(0.0)).as("y"))
    // persisted ALREADY hash-partitioned by doc id (r17, guide §2.4
    // reuse-the-exchange): every GD round's z-aggregation groups by
    // idCol, so a pre-partitioned cache satisfies the aggregation's
    // required distribution and the per-round exchange disappears —
    // one exchange at build time instead of one per round plus one at
    // scoring. The per-doc sum's operand set is unchanged (grouping
    // is exact); z is round()ed at 6 dp before the sigmoid, the same
    // quantization boundary the registry's 3-vs-8 partition-invariance
    // gate already certifies, and q187's 3-SF oracle hash re-gates the
    // end-to-end scores.
    val fx = feat.unionByName(bias)
      .repartition(col(idCol)).persist()
    val m = totals.count().toDouble
    def rq(x: Double): Double = BigDecimal.valueOf(x)
      .setScale(roundDp, BigDecimal.RoundingMode.HALF_UP).toDouble
    var w = Array.fill(buckets + 1)(0.0)
    def withP(wNow: Array[Double]): DataFrame = {
      // LocalRelation, not parallelize (r17, the DistributedWord2Vec
      // matDf lesson): an RDD-backed weight frame schedules a cluster
      // job per broadcast build — once per GD round plus the final
      // scoring pass — while a LocalTableScan collects on the driver
      // thread with no job. Same (bucket, w) rows either way.
      import spark.implicits._
      val wDf = broadcast(
        wNow.zipWithIndex.toSeq
          .map { case (v, i) => (i.toLong, v) }.toDF("bucket", "w"))
      fx.join(wDf, "bucket")
        .groupBy(col(idCol))
        .agg(round(sum(col("w") * col("x")), roundDp).as("z"),
          first(col("y")).as("y"))
        .select(col(idCol), col("y"),
          round(lit(1.0) / (lit(1.0) + exp(-col("z"))), roundDp)
            .as("p"))
    }
    val hintP: DataFrame => DataFrame =
      if (48L * m.toLong <= probBroadcastBudgetBytes) broadcast(_)
      else identity
    for (_ <- 1 to iters) {
      val g = fx.join(hintP(withP(w).select(col(idCol), col("p"),
          col("y").as("__y"))), idCol)
        .groupBy(col("bucket"))
        .agg((sum((col("p") - col("__y")) * col("x")) / lit(m)).as("g"))
        .collect().map(r => r.getLong(0).toInt -> r.getDouble(1)).toMap
      w = Array.tabulate(buckets + 1)(i =>
        rq(w(i) - lr * g.getOrElse(i, 0.0)))
    }
    val out = withP(w)
      .select(col(idCol), col("y").cast("int").as("label"),
        col("p").as("score"))
    fx.unpersist()
    out
  }
}
