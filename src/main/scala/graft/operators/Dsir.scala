package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling — DSIR (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling",
  * NeurIPS): score every raw document by how much more likely its
  * hashed-n-gram bag is under a TARGET corpus' distribution than under
  * the raw corpus' own, then resample the raw corpus toward the target
  * by Gumbel top-k over the importance weights. This is the standard
  * way to tilt a 100 TB crawl toward a small high-quality reference
  * (Wikipedia, books) without training a classifier.
  *
  * Scale shape (everything is one linear pass plus tiny broadcasts):
  *  - gram extraction is a generator projection, no shuffle;
  *  - BOTH bag-of-hashed-ngrams models fit in ONE aggregation over the
  *    bucket key (`buckets` rows out — thousands, not billions) with
  *    conditional sums for target vs raw;
  *  - the per-bucket log-ratio table is ≤ `buckets` rows → broadcast
  *    joined back to the gram stream; per-doc weights are one more
  *    aggregation on the doc key;
  *  - selection is a global top-k (sort-limit — Spark's TakeOrdered,
  *    never a full materialized sort at the driver).
  *
  * Determinism: bucketing is xxhash64 (pure function of gram text and
  * seed), the Gumbel noise is derived from xxhash64 of the doc id (not
  * an RNG stream), and per-doc weights are rounded to 9 dp before
  * selection so float summation order across partitionings cannot flip
  * a top-k boundary. The xxhash64 path is not DuckDB-expressible →
  * q133 stays rows-only; [[importanceWeightsReplayable]] is the
  * oracle-faced variant (portable sha buckets + exact decimal sums,
  * q177).
  */
object Dsir extends Serializable {

  /** Non-distinct unigram+bigram stream hashed into `buckets` buckets:
    * one row per gram OCCURRENCE (DSIR counts occurrences, so unlike
    * [[Dedup.shingles]] this keeps duplicates). `keep` columns ride
    * along with each gram row. */
  private[graft] def gramRows(df: DataFrame, idCol: String, textCol: String,
      buckets: Int, seed: Long, keep: Seq[String] = Nil,
      portable: Boolean = false): DataFrame = {
    val toks = Dedup.tokens(col(textCol))
    // degenerate-doc guard: a 0/1-token doc has NO bigrams — without
    // the branch, sequence(1, max(1, n-1)) emits index 1 anyway and the
    // lone token (or the empty string) re-enters the stream as a
    // spurious "bigram", skewing its bucket's mass
    // let-bound (the HOF-CSE O(n²) term — BASELINE.md round 8)
    val bigrams = graft.functions.TextFunctions.bound(toks) { t =>
      when(size(t) >= 2,
        transform(sequence(lit(1), size(t) - 1),
          i => concat_ws(" ", slice(t, i, lit(2)))))
        .otherwise(array().cast("array<string>"))
    }
    val carried = (idCol +: keep).map(col)
    // portable = the sha-256 prefix bucket every SQL engine can
    // recompute (the q165/q131 portable-hash family); default = the
    // 8-byte xxhash64 production path
    // the portable sha-256 bucket is unsalted by design (any SQL engine
    // must recompute it verbatim) — make that contract explicit instead
    // of silently ignoring a caller's seed
    require(!portable || seed == 0L,
      s"portable buckets are seedless (sha-256 of the gram alone); got seed=$seed")
    val bucketExpr =
      if (portable)
        pmod(conv(substring(sha2(col("__gram").cast("binary"), 256),
          1, 8), 16, 10).cast("long"), lit(buckets.toLong))
      else pmod(xxhash64(col("__gram"), lit(seed)), lit(buckets.toLong))
    df.select(carried :+ explode(concat(toks, bigrams)).as("__gram"): _*)
      .select(carried :+ bucketExpr.as("bucket"): _*)
  }

  /** Per-document importance weights: `log p_target(doc) − log p_raw
    * (doc)` under Laplace-smoothed bag-of-hashed-ngrams models. `df`
    * is the union of raw and target rows; `isTarget` marks the target
    * side (both models are fitted in the same single aggregation).
    * Returns (idCol, log_weight) for EVERY input row — callers filter
    * to the raw side before resampling. */
  def importanceWeights(df: DataFrame, idCol: String, textCol: String,
      isTarget: Column, buckets: Int = 4096,
      seed: Long = 42L): DataFrame = {
    require(buckets > 1, "need at least 2 hash buckets")
    val marked = df.withColumn("__tgt", isTarget)
    // ONE gram explode for the whole pipeline: the (doc, bucket) count
    // table is both the model-fitting input and the scoring input —
    // every later shuffle moves per-doc-per-bucket rows, never raw gram
    // occurrences.
    val docBuckets = gramRows(marked, idCol, textCol, buckets, seed,
        keep = Seq("__tgt"))
      .groupBy(col(idCol), col("__tgt"), col("bucket"))
      .agg(count(lit(1)).as("__c"))
    // Tiny (≤ buckets rows): both models' counts side by side, then the
    // smoothed log-ratio table.
    val bucketCounts = docBuckets.groupBy(col("bucket")).agg(
      sum(when(col("__tgt"), col("__c")).otherwise(0L)).as("n_tgt"),
      sum(when(col("__tgt"), 0L).otherwise(col("__c"))).as("n_raw"))
    val ratios = bucketCounts
      .crossJoin(broadcast(bucketCounts.agg(
        sum(col("n_tgt")).as("__t_tgt"), sum(col("n_raw")).as("__t_raw"))))
      .select(col("bucket"),
        (log((col("n_tgt") + 1).cast("double") /
            (col("__t_tgt") + buckets).cast("double")) -
          log((col("n_raw") + 1).cast("double") /
            (col("__t_raw") + buckets).cast("double"))).as("__ratio"))
    docBuckets
      .join(broadcast(ratios), "bucket")
      .groupBy(col(idCol))
      .agg(round(sum(col("__c") * col("__ratio")), 9).as("log_weight"))
  }

  /** ANSI-REPLAYABLE importance weights — the oracle face of
    * [[importanceWeights]] (the q176 md5-MinHash pattern applied to
    * DSIR): buckets come from the portable sha-256 prefix hash, and
    * the per-doc sum is carried as DECIMAL(20,6) over 6-dp-pinned
    * partials — decimal addition is EXACT, so summation order cannot
    * move a bit on either engine (stronger than the q160 partial-pin,
    * which still summed doubles). The log-ratio table itself stays
    * double (libm log parity is empirically exact across both engines
    * — the q119/q128 log-prob oracles gate it at three SFs). Returns
    * (idCol, log_weight) rounded at the partials' own 6-dp scale. */
  def importanceWeightsReplayable(df: DataFrame, idCol: String,
      textCol: String, isTarget: Column, buckets: Int = 512)
      : DataFrame = {
    require(buckets > 1, "need at least 2 hash buckets")
    val marked = df.withColumn("__tgt", isTarget)
    val docBuckets = gramRows(marked, idCol, textCol, buckets, seed = 0L,
        keep = Seq("__tgt"), portable = true)
      .groupBy(col(idCol), col("__tgt"), col("bucket"))
      .agg(count(lit(1)).as("__c"))
    val bucketCounts = docBuckets.groupBy(col("bucket")).agg(
      sum(when(col("__tgt"), col("__c")).otherwise(0L)).as("n_tgt"),
      sum(when(col("__tgt"), 0L).otherwise(col("__c"))).as("n_raw"))
    val ratios = bucketCounts
      .crossJoin(broadcast(bucketCounts.agg(
        sum(col("n_tgt")).as("__t_tgt"), sum(col("n_raw")).as("__t_raw"))))
      .select(col("bucket"),
        (log((col("n_tgt") + 1).cast("double") /
            (col("__t_tgt") + buckets).cast("double")) -
          log((col("n_raw") + 1).cast("double") /
            (col("__t_raw") + buckets).cast("double"))).as("__ratio"))
    docBuckets
      .join(broadcast(ratios), "bucket")
      .groupBy(col(idCol))
      // final round at 6 dp, the partials' own scale: the decimal sum
      // is an exact 1e-6 multiple, so a 6-dp round has no midpoint
      // decision to make — a coarser scale (4 dp) hit exact x.xxxx5
      // midpoints on ~1/500 docs and the two engines' double-vs-decimal
      // midpoint semantics split (the q156 trap, decimal edition)
      .agg(round(sum(round(col("__c") * col("__ratio"), 6)
          .cast("decimal(20,6)")).cast("double"), 6).as("log_weight"))
  }

  /** Gumbel top-k resampling (the paper's sampling-without-replacement
    * form): add seeded Gumbel noise to each log-weight and keep the k
    * largest. Noise is a pure function of (id, seed) — u from the
    * xxhash64 bucket midpoint, g = −log(−log u) — so the draw is
    * reproducible across runs and partitionings; ties break on id.
    * If k ≥ rows, everything is kept (small-SF degenerate case). */
  def resampleTopK(weights: DataFrame, idCol: String, k: Int,
      seed: Long): DataFrame = {
    require(k > 0, "k must be positive")
    val u = (pmod(xxhash64(col(idCol), lit(seed)), lit(1000000L))
      .cast("double") + 0.5) / 1000000.0
    weights
      .withColumn("__key", col("log_weight") - log(-log(u)))
      .orderBy(col("__key").desc, col(idCol))
      .limit(k)
      .drop("__key")
  }
}
