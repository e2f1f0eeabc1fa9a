package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Discriminative quality classifier over hashed n-gram features — the
  * fastText-style linear filter of the GPT-3 / CCNet data pipelines
  * (Brown et al. 2020 §A; Wenzek et al. 2020): train logistic
  * regression to tell a high-quality TARGET corpus from the raw crawl,
  * then keep raw documents scoring target-like. Complements
  * [[graft.operators.Dsir]]: DSIR reweights generatively (bag
  * log-ratios), this scores discriminatively (a learned boundary).
  *
  * Work split, mirroring [[LocalKMeans]]: TRAINING is driver-side and
  * seed-deterministic over a bounded hash-selected sample (distributed
  * LBFGS treeAggregate sums floats in partition order — its
  * coefficients are not bit-stable across partitionings, which would
  * fail the registry's 3-vs-8-partition invariance gate); SCORING is
  * fully distributed — gram explode, broadcast-join the ≤`buckets`-row
  * coefficient table, ONE per-doc aggregation, logits rounded to 9 dp
  * so float summation order cannot flip a reported score. At 100 TB
  * the training sample stays ≤ 2·`maxSample` docs (the classifier is
  * tiny by design) while scoring streams the full corpus once.
  *
  * Train-time features come from the same [[bucketRows]] pipeline that
  * scoring uses — bucket parity between the two paths is by
  * construction, never by re-implementing the tokenizer+hash on the
  * driver.
  */
object QualityClassifier extends Serializable {

  final case class Model(buckets: Int, seed: Long, bias: Double,
      weights: Map[Long, Double])

  /** Distributed (doc, bucket) gram stream — one row per unigram or
    * bigram OCCURRENCE; generator projection, no shuffle. */
  def bucketRows(df: DataFrame, idCol: String, textCol: String,
      buckets: Int, seed: Long): DataFrame = {
    val toks = Dedup.tokens(col(textCol))
    // degenerate-doc guard (mirrors Dsir.gramRows): docs with <2 tokens
    // contribute no bigram features instead of a duplicated unigram
    // let-bound (the HOF-CSE O(n²) term — BASELINE.md round 8)
    val bigrams = graft.functions.TextFunctions.bound(toks) { t =>
      when(size(t) >= 2,
        transform(sequence(lit(1), size(t) - 1),
          i => concat_ws(" ", slice(t, i, lit(2)))))
        .otherwise(array().cast("array<string>"))
    }
    df.select(col(idCol), explode(concat(toks, bigrams)).as("__gram"))
      .select(col(idCol),
        pmod(xxhash64(col("__gram"), lit(seed)), lit(buckets.toLong))
          .as("bucket"))
  }

  /** Train on a bounded, hash-selected, id-ordered sample: up to
    * `maxSample` docs PER CLASS chosen by xxhash64(id) rank (a pure
    * function of the ids — invariant to partitioning and data order),
    * features L1-normalized per doc, full-batch gradient descent with
    * L2 and fixed iterations, updates applied in sorted-key order.
    * Deterministic bit-for-bit. Collect is bounded by construction:
    * ≤ 2·maxSample label rows plus their (doc, bucket) count pairs
    * (≈ docs × grams-per-doc, a few hundred thousand rows at the
    * defaults — classifier training data, not corpus data).
    *
    * The per-class selection is `orderBy(hash, id).limit(maxSample)` on
    * each filtered class — Spark plans it as TakeOrderedAndProject
    * (per-partition top-k, driver merge of ≤ partitions·maxSample
    * rows), so NO shuffle touches the corpus. A
    * `row_number over (partition by class)` window would select the
    * identical set but funnels the ENTIRE corpus through one sort task
    * per class (a boolean key has two partitions) — an OOM/straggler
    * at 100 TB. Two class scans beat one two-partition corpus sort. */
  def train(df: DataFrame, idCol: String, textCol: String,
      isTarget: Column, buckets: Int = 4096, seed: Long = 42L,
      maxSample: Int = 1000, iters: Int = 100, lr: Double = 0.5,
      l2: Double = 1e-4): Model = {
    require(buckets > 1 && maxSample > 0 && iters > 0)
    val marked = df.select(col(idCol).cast("string").as("__id"),
      col(textCol).as("__text"), isTarget.cast("boolean").as("__tgt"))
    def classSample(cls: Boolean): DataFrame =
      marked.filter(col("__tgt") === cls)
        .orderBy(xxhash64(col("__id"), lit(seed)), col("__id"))
        .limit(maxSample)
    val sample = classSample(true).unionAll(classSample(false))
      .select(col("__id"), col("__text"), col("__tgt"))
    val labels = sample.select(col("__id"), col("__tgt")).collect()
      .map(r => r.getString(0) -> r.getBoolean(1)).toMap
    require(labels.values.exists(identity) && labels.values.exists(!_),
      "need at least one target and one non-target training doc")
    val pairs = bucketRows(sample, "__id", "__text", buckets, seed)
      .groupBy(col("__id"), col("bucket"))
      .agg(count(lit(1)).cast("double").as("c"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val feats = pairs.groupBy(_._1).toArray.sortBy(_._1).map {
      case (id, rows) =>
        val n = rows.map(_._3).sum
        (if (labels(id)) 1.0 else 0.0,
          rows.map { case (_, b, c) => (b, c / n) }.sortBy(_._1))
    }
    var bias = 0.0
    val coef = scala.collection.mutable.LongMap.empty[Double]
    val m = feats.length.toDouble
    for (_ <- 1 to iters) {
      var gBias = 0.0
      val gW = scala.collection.mutable.LongMap.empty[Double]
      feats.foreach { case (y, xs) =>
        var z = bias
        xs.foreach { case (b, x) => z += coef.getOrElse(b, 0.0) * x }
        val p = 1.0 / (1.0 + math.exp(-z))
        val err = p - y
        gBias += err
        xs.foreach { case (b, x) =>
          gW.update(b, gW.getOrElse(b, 0.0) + err * x) }
      }
      bias -= lr * gBias / m
      gW.keys.toArray.sorted.foreach { b =>
        coef.update(b,
          coef.getOrElse(b, 0.0) - lr * (gW(b) / m + l2 * coef.getOrElse(b, 0.0)))
      }
    }
    Model(buckets, seed, bias, coef.toMap)
  }

  /** Distributed scoring: per-doc target-likeness in (0, 1). The
    * coefficient table (≤ buckets rows) broadcasts into the gram
    * stream; ONE aggregation on the doc key computes both the
    * coefficient sum and the gram count; logit = bias + Σw/n matches
    * training's L1-normalized features. Returns (idCol,
    * quality_score). */
  def score(df: DataFrame, idCol: String, textCol: String,
      model: Model): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val coefs = model.weights.toSeq.sortBy(_._1).toDF("bucket", "__w")
    bucketRows(df, idCol, textCol, model.buckets, model.seed)
      .join(broadcast(coefs), Seq("bucket"), "left_outer")
      .groupBy(col(idCol))
      .agg(sum(coalesce(col("__w"), lit(0.0))).as("__dot"),
        count(lit(1)).cast("double").as("__n"))
      .select(col(idCol),
        (lit(1.0) / (lit(1.0) +
          exp(-round(col("__dot") / col("__n") + model.bias, 9))))
          .as("quality_score"))
  }
}
