package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Seeded sampling utilities for training-data pipelines: stratified
  * class-balance sampling and deterministic train/validation splits.
  * Both are hash-based rather than RNG-state-based where determinism
  * under repartitioning matters.
  */
object Sampling extends Serializable {

  /** Stratified sample: per-stratum fractions via `DataFrame.stat.sampleBy`
    * (seeded Bernoulli per stratum). */
  def stratified(df: DataFrame, stratumCol: String,
      fractions: Map[String, Double], seed: Long): DataFrame =
    df.stat.sampleBy(stratumCol, fractions, seed)

  /** Per-group quota cap: keep at most `n` rows per group, chosen by the
    * deterministic `orderCol` ranking — the "cap documents per domain"
    * rebalancing step of a pretraining pipeline. One shuffle (the ranking
    * window); for pathologically hot groups pair with the usual skew
    * tools (the window only ranks, it never materializes a group in one
    * buffer — state is a running count per partition-ordered stream). */
  def capPerGroup(df: DataFrame, groupCol: String, orderCol: String,
      n: Int): DataFrame = {
    require(n > 0, "cap must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col(orderCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n).drop("__rn")
  }

  /** Deterministic global shuffle for training order: rows sorted by
    * `xxhash64(id, seed)` — a pure function of (id, seed), so the order
    * is reproducible across runs, partitionings, and cluster sizes
    * (unlike `orderBy(rand(seed))`, whose draw depends on row-to-
    * partition placement). Epoch reshuffles = new seeds. One range
    * shuffle, exactly what a global sort costs; at 100 TB this is the
    * final pass that writes the training shards, so the sort IS the
    * shard-assignment shuffle — no extra pass. Ties are impossible for
    * distinct ids (64-bit hash of a unique key, collision odds ~n²/2⁶⁵),
    * but the id itself breaks them deterministically anyway. */
  def deterministicShuffle(df: DataFrame, idCol: String,
      seed: Long): DataFrame =
    df.orderBy(xxhash64(col(idCol), lit(seed)), col(idCol))

  /** The last mile of the training-data pipeline: write the corpus as
    * SHUFFLED SHARDS — rows in [[deterministicShuffle]] order, range-
    * partitioned into ~`rowsPerShard`-row parquet files, each file a
    * contiguous slice of the global shuffled order. The ORDER is a pure
    * function of (ids, seed) — invariant to input partitioning — while
    * shard BOUNDARIES come from range sampling and are only
    * approximately balanced; concatenating the shards in range order
    * always replays the same stream. One range shuffle total: the sort
    * IS the shard assignment. Pass `expectedRows` (an upstream count or
    * metric) to avoid the sizing count() — when negative, the shard
    * count costs one extra pass over `df`, which at the tail of a heavy
    * pipeline recomputes the upstream DAG. Returns the row count used. */
  def writeShuffledShards(df: DataFrame, idCol: String, path: String,
      seed: Long, rowsPerShard: Long, expectedRows: Long = -1L,
      append: Boolean = false): Long = {
    require(rowsPerShard > 0, "rowsPerShard must be positive")
    val n = if (expectedRows >= 0) expectedRows else df.count()
    val files = math.max(1L, (n + rowsPerShard - 1) / rowsPerShard).toInt
    val key = xxhash64(col(idCol), lit(seed))
    // append = incremental-ingest mode: the new rows land as ADDITIONAL
    // shard files (Spark's per-write UUID file names never collide);
    // existing shards are immutable. Readers of the directory see the
    // union; the manifest is recomputed over the whole directory.
    val mode =
      if (append) org.apache.spark.sql.SaveMode.Append
      else org.apache.spark.sql.SaveMode.Overwrite
    df.withColumn("__shuffle_key", key)
      .repartitionByRange(files, col("__shuffle_key"), col(idCol))
      .sortWithinPartitions(col("__shuffle_key"), col(idCol))
      .drop("__shuffle_key")
      .write.mode(mode)
      .option("maxRecordsPerFile", rowsPerShard)
      .parquet(path)
    n
  }

  /** Shard manifest for a [[writeShuffledShards]] output (or any parquet
    * directory): one row per file with row count and an order-invariant
    * content checksum (sum of per-row xxhash64-mod-p terms — bounded
    * per term, so the sum can never hit ANSI overflow at any shard size
    * a writer can produce) — the integrity artifact a training run
    * records so a re-read, a copy, or a re-shuffle with the same seed
    * can be VERIFIED byte-cheaply rather than re-compared row-by-row.
    * Shards key on the writer-task part NUMBER when the file follows
    * Spark's part-NNNNN naming (per-write UUIDs differ, and
    * maxRecordsPerFile sub-files of one task fold into its row, so a
    * re-run of the identical write yields the identical manifest);
    * foreign file names (compactions, external writers) fall back to
    * the file name itself — still one row per file, just without
    * cross-write stability. One scan, one shuffle on the shard id. */
  def shardManifest(spark: org.apache.spark.sql.SparkSession,
      path: String, idCol: String): DataFrame = {
    val part = regexp_extract(input_file_name(), "part-(\\d+)-", 1)
    val shard = when(part =!= "", part)
      .otherwise(regexp_extract(input_file_name(), "([^/]+)$", 1))
    spark.read.parquet(path)
      .select(shard.as("shard"), col(idCol))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_rows"),
        sum(pmod(xxhash64(col(idCol)), lit(1000000007L))).as("checksum"))
      .orderBy(col("shard"))
  }

  /** Training-mix construction: per-source sampling RATES that hit a
    * target mixture by WEIGHT. Given target proportions (e.g. web 0.6,
    * code 0.3, papers 0.1) and the observed per-source row counts,
    * compute the per-source keep-fraction that realizes the mixture at
    * the largest total size no source can't supply (the binding source
    * is kept whole; everything else is down-sampled — no up-sampling).
    * Rates are driver math on one tiny count aggregate. */
  def mixtureRates(counts: Map[String, Long],
      weights: Map[String, Double]): Map[String, Double] = {
    require(weights.keySet.subsetOf(counts.keySet),
      s"weights for unknown sources: ${weights.keySet -- counts.keySet}")
    val w = weights.filter(_._2 > 0)
    require(w.nonEmpty, "at least one positive weight")
    // a zero-count source would make t = 0 and its rate 0/0 = NaN; Spark
    // orders NaN above every double, so sampleByMixture's `< rate` filter
    // would silently keep 100% of that source if the map were reused
    // against a corpus where the source later has rows
    w.keys.foreach(s => require(counts(s) > 0,
      s"source '$s' has positive weight but zero rows"))
    val totalW = w.values.sum
    // largest achievable total T: for each source, count/share caps T
    val t = w.map { case (s, wt) => counts(s) / (wt / totalW) }.min
    w.map { case (s, wt) =>
      s -> math.min(1.0, t * (wt / totalW) / counts(s)) }
  }

  /** Temperature-scaled mixture weights (the multilingual/typed-corpus
    * rebalancing knob): weight_s ∝ (count_s)^(1/T), normalized to sum
    * to 1. T = 1 reproduces natural proportions; T → ∞ flattens toward
    * uniform; T < 1 sharpens toward the biggest source. Feed the result
    * to [[mixtureRates]] for realizable per-source keep-fractions.
    * Driver math over the per-source count map — no data pass. */
  def temperatureWeights(counts: Map[String, Long],
      temperature: Double): Map[String, Double] = {
    require(temperature > 0, "temperature must be > 0")
    require(counts.nonEmpty, "no sources")
    counts.foreach { case (s, c) =>
      require(c > 0, s"source '$s' has zero rows") }
    // log space with a max-shift: pow(c, 1/T) overflows to Infinity for
    // small T × large counts (pow(1e10, 25) = Inf → NaN weights that
    // would silently poison mixtureRates); exp((ln c)/T − max) keeps
    // every intermediate finite and the normalized result identical
    val logs = counts.map { case (s, c) =>
      s -> math.log(c.toDouble) / temperature }
    val mx = logs.values.max
    val raw = logs.map { case (s, l) => s -> math.exp(l - mx) }
    val z = raw.values.sum
    raw.map { case (s, w) => s -> w / z }
  }

  /** Deterministic weighted mixture sample: keep each row iff
    * xxhash64(id, seed) lands under its source's keep-rate threshold —
    * membership is a pure function of (id, seed, rates), invariant to
    * partitioning and cluster size, unlike sampleBy's RNG-per-partition
    * draw. One broadcast-joined literal map, no shuffle. */
  def sampleByMixture(df: DataFrame, idCol: String, sourceCol: String,
      rates: Map[String, Double], seed: Long): DataFrame = {
    val buckets = 1000000L
    val rateExpr = rates.foldLeft(lit(0.0)) { case (acc, (s, r)) =>
      when(col(sourceCol) === s, lit(r)).otherwise(acc)
    }
    df.filter(
      pmod(xxhash64(col(idCol), lit(seed)), lit(buckets)).cast("double") <
        rateExpr * buckets)
  }

  /** Deterministic train/validation split keyed on a stable id column:
    * membership depends only on (id, seed) — invariant to partitioning,
    * re-runs, and data order, unlike randomSplit. trainFraction in (0,1).
    */
  def splitByHash(df: DataFrame, idCol: String, trainFraction: Double,
      seed: Long): (DataFrame, DataFrame) = {
    require(trainFraction > 0 && trainFraction < 1)
    val bucket = pmod(xxhash64(col(idCol), lit(seed)), lit(10000L))
    val cut = (trainFraction * 10000).toLong
    (df.filter(bucket < cut), df.filter(bucket >= cut))
  }

  /** PORTABLE membership bucket: the first four hex chars of
    * `sha256(id ":" seed)` — 65,536 equal-probability buckets whose
    * assignment every engine reproduces bit-for-bit (SHA-256 of UTF-8
    * bytes has one reference value; xxhash64 is engine-private, which
    * is exactly why [[splitByHash]]/[[sampleByMixture]] could only be
    * rows-only checked). Hex digits 0-9a-f sort in ASCII order, so a
    * plain lexicographic string comparison against a 4-char hex cut
    * IS the numeric threshold test — no hex→int conversion needed on
    * either engine. Same cost class as xxhash64 membership: one
    * codegen'd hash projection, no shuffle. */
  private[graft] def shaBucket(idCol: Column, seed: Long): Column =
    substring(
      sha2(concat(idCol.cast("string"), lit(":" + seed)).cast("binary"),
        256), 1, 4)

  /** 4-hex-char cut string for a keep-fraction: keep iff
    * `shaBucket < cut`. Fractions are rounded to 6 dp before the
    * bucket multiply so an engine's 1-ulp rate drift can never move
    * the cut (both engines round, then floor — identical integers
    * unless the rates themselves differ by ≥1e-6). The bucket index is
    * clamped to 0xffff: a fraction ≥ 0.9999995 rounds to 1.0 at 6 dp
    * and would otherwise format as the 5-char "10000", which a 4-char
    * bucket string compares ABOVE almost everywhere and silently
    * inverts the split. */
  private[graft] def shaCut(fraction: Double): String = {
    val r = BigDecimal(fraction)
      .setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
    f"${math.min(65535L, math.floor(r * 65536).toLong)}%04x"
  }

  /** [[splitByHash]] with an ORACLE-REPLAYABLE membership function:
    * train iff `sha256(id ":" seed)`'s first 4 hex chars sort below
    * `floor(trainFraction·65536)` in hex. Identical guarantees
    * (pure function of (id, seed), partitioning/cluster-size
    * invariant, no shuffle) — the only change vs [[splitByHash]] is
    * the hash family, chosen because DuckDB/any ANSI engine can replay
    * the exact assignment (`substr(sha256(id::VARCHAR || ':seed'),1,4)
    * < cut`). Granularity is 1/65536 vs splitByHash's 1/10000. */
  def splitBySha(df: DataFrame, idCol: String, trainFraction: Double,
      seed: Long): (DataFrame, DataFrame) = {
    require(trainFraction > 0 && trainFraction < 1)
    val b = shaBucket(col(idCol), seed)
    val cut = lit(shaCut(trainFraction))
    (df.filter(b < cut), df.filter(b >= cut))
  }

  /** [[sampleByMixture]] with the [[shaBucket]] membership function:
    * keep a row iff its portable bucket sorts below its source's
    * hex cut (sources at rate ≥ 1 − 1e-6 are kept whole — their cut
    * would be the out-of-range `0x10000`). Semantics and cost match
    * sampleByMixture (pure function of (id, seed, rates), no
    * shuffle); the hash family swap makes the sample itself
    * SQL-replayable, so the mixture query graduates from rows-only
    * to a full DuckDB oracle. */
  def sampleByMixtureSha(df: DataFrame, idCol: String, sourceCol: String,
      rates: Map[String, Double], seed: Long): DataFrame = {
    val b = shaBucket(col(idCol), seed)
    val keep = rates.foldLeft(lit(false)) { case (acc, (s, r)) =>
      val cond =
        if (r >= 1.0 - 1e-6) lit(true) else b < lit(shaCut(r))
      when(col(sourceCol) === s, cond).otherwise(acc)
    }
    df.filter(keep)
  }

  /** Leakage-safe train/val/test split keyed on CONTENT, not id: the
    * split is a pure function of `sha2(text, 256)`, so byte-identical
    * documents — however many copies exist and wherever they live —
    * land in the same split by construction. An id-keyed split (e.g.
    * [[splitByHash]]) lets a duplicated document straddle train and
    * eval, the canonical contamination bug; hashing the content closes
    * it for exact duplicates with ZERO extra passes (near-duplicates
    * need the dedup-cluster id as the key instead — same shape, the
    * cluster rep's hash replaces the content hash). Assignment buckets
    * are the first hex nibble of the digest: 0–b → train (12/16),
    * c–d → val (2/16), e–f → test (2/16). No shuffle — one codegen'd
    * hash projection; and unlike xxhash64, SHA-256 has a portable
    * reference value every engine agrees on, so the DuckDB oracle
    * replays the identical assignment bit-for-bit. NULL text gets a
    * NULL split — never a silent bucket (the when-otherwise
    * fallthrough would have dumped unhashable rows into `test`);
    * callers route nulls explicitly. */
  def contentSplit(df: DataFrame, textCol: String,
      splitCol: String = "split"): DataFrame = {
    val nib = substring(sha2(col(textCol).cast("binary"), 256), 1, 1)
    df.withColumn(splitCol,
      when(col(textCol).isNull, lit(null).cast("string"))
        .when(nib.between("0", "9") || nib.isin("a", "b"), "train")
        .when(nib.isin("c", "d"), "val")
        .otherwise("test"))
  }

  /** NEAR-dup-safe split: [[contentSplit]] closes the exact-duplicate
    * leak; this closes the near-duplicate one. `components` is an
    * (id, component) table from a dedup family's connected components
    * ([[Dedup.connectedComponents]] over MinHash/Jaccard/SemDedup
    * pairs); every document's split is decided by its cluster
    * REPRESENTATIVE's content hash (the component id's text; docs in
    * no cluster represent themselves), so a near-dup family can never
    * straddle train/eval — the contamination an id- or even
    * content-keyed split still permits when eval members are
    * paraphrases. Two joins: components (one per clustered doc) and
    * the representative-text lookup (self-join on the id — at 100 TB
    * both are shuffle equi-joins on the id key; the components side is
    * only the CLUSTERED subset, typically a few % of the corpus).
    * Returns df + `rep_id` + `splitCol`. */
  def clusterKeyedSplit(df: DataFrame, idCol: String, textCol: String,
      components: DataFrame, splitCol: String = "split"): DataFrame = {
    val comps = components.select(col("id").as("__cid"),
      col("component").as("__comp"))
    val withRep = df
      .join(comps, df(idCol) === comps("__cid"), "left_outer")
      .withColumn("rep_id", coalesce(col("__comp"), df(idCol)))
      .drop("__cid", "__comp")
    val repText = df.select(col(idCol).as("__rid"),
      col(textCol).as("__rep_text"))
    contentSplit(
      withRep.join(repText, col("rep_id") === col("__rid")),
      "__rep_text", splitCol)
      .drop("__rid", "__rep_text")
  }

  /** TOKEN-budget mixture: training mixes are specified in tokens, not
    * documents ([[sampleByMixtureSha]] rebalances doc COUNTS — fine
    * when lengths are homogeneous, wrong when one source writes 10×
    * longer documents). Greedy prefix take per source: documents line
    * up in the portable [[shaBucket]] order (id tie-break) — a
    * deterministic shuffle both engines replay — and each source keeps
    * its prefix while the running token sum stays within `budgetCol`.
    * The running sum is monotone, so the kept set is exactly "every
    * document that fits before the first overflow" — a pure function
    * of (ids, seed, budgets), partitioning-invariant, and fully
    * SQL-expressible (q162's oracle).
    *
    * Cost: ONE hash-partitioned window per source (shuffle on
    * `sourceCol`, in-partition sort on the 4-hex bucket). At extreme
    * per-source row counts the sort input can be pre-shrunk with a
    * [[shaCut]] prefilter at ~(budget/total_tokens)·margin — a
    * superset of any prefix the greedy can take as long as the margin
    * covers token-length variance within the cut; this exact operator
    * stays the reference semantics.
    *
    * `df` must carry `tokCol` (per-doc token count) and `budgetCol`
    * (per-row budget — constant per source). Appends `cum_tok`. */
  /** WEIGHTED sample without replacement, k per group
    * (Efraimidis–Spirakis A-Res): every row draws the key u^(1/w) —
    * here the order-equivalent ln(u)/w, one `ln` instead of a `pow` —
    * and each group keeps its top-k keys. Inclusion probability is
    * proportional to weight (exactly the A-Res guarantee), yet the
    * draw is the portable [[shaBucket]] uniform, so the SAMPLE is a
    * pure function of (ids, weights, seed): partitioning-invariant,
    * replayable, and SQL-expressible (q165's oracle re-derives every
    * key). One window per group — same cost class as
    * [[tokenBudgetTake]]; at 100 TB the top-k-per-group form beats a
    * global sort because each partition keeps only k candidates.
    * Weights must be > 0 (enforced). Appends `rk` (1..k by key). */
  def weightedSamplePerGroup(df: DataFrame, idCol: String,
      groupCol: String, weightCol: String, k: Int, seed: Long)
      : DataFrame = {
    require(k >= 1, "k must be >= 1")
    val u = (conv(shaBucket(col(idCol), seed), 16, 10).cast("double") +
      lit(0.5)) / lit(65536.0)
    val key = log(u) / col(weightCol).cast("double")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(key.desc, col(idCol))
    df.filter(col(weightCol).cast("double") > 0)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
  }

  def tokenBudgetTake(df: DataFrame, idCol: String, sourceCol: String,
      tokCol: String, budgetCol: String, seed: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(sourceCol))
      .orderBy(shaBucket(col(idCol), seed), col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    df.withColumn("cum_tok", sum(col(tokCol)).over(w))
      .filter(col("cum_tok") <= col(budgetCol))
  }
}
