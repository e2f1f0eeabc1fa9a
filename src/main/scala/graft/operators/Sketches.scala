package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distinct-count sketches with a persisted, APPEND-ONLY artifact
  * lifecycle — the cardinality companion of the PCA moments artifact
  * (`ml/Pca.scala`): each ingested batch contributes one tiny row of
  * per-group DataSketches-HLL binaries, and "how many distinct keys has
  * this corpus ever seen" is answered from the artifact alone — never by
  * rescanning 100 TB of history.
  *
  * Accuracy semantics: HLL union never double-counts a key (registers
  * combine by max), so re-ingesting a batch cannot inflate the estimate
  * beyond sketch error. The DataSketches binary does carry sparse→dense
  * mode state, so the ESTIMATE is only stable within the sketch's error
  * bound under different union shapes — not bit-identical (measured:
  * 500 true distinct → 491 vs 499 across union multiplicities). That is
  * why the registry-gated query (q134) uses Spark's built-in
  * `approx_count_distinct` (dense-register HLL++, elementwise-max merge
  * — bit-invariant to partitioning) and THIS artifact surface is gated
  * by tolerance specs instead. approx_percentile's merge-order-sensitive
  * Greenwald-Khanna summaries are deliberately not registered at all.
  */
object Sketches extends Serializable {

  /** Per-group HLL sketch of `keyCol`: one binary sketch row per group.
    * `lgK` trades size for accuracy (2^lgK registers; 12 → ~1.6 kB,
    * ~2.5% standard error). One shuffle on the group key; the output is
    * #groups rows regardless of input size. */
  def groupSketches(df: DataFrame, groupCol: String, keyCol: String,
      lgK: Int = 12): DataFrame =
    df.groupBy(col(groupCol).as("group"))
      .agg(hll_sketch_agg(col(keyCol), lgK).as("sketch"),
        count(lit(1)).as("n_rows"))

  /** Append one batch's per-group sketches to the artifact at `path`,
    * as the Hive-style partition directory `batch_id=<id>` — written
    * with OVERWRITE on that directory, so the append is IDEMPOTENT per
    * batch id: a foreachBatch replay after a crash between the write
    * and the checkpoint commit (streaming's at-least-once window)
    * replaces the batch's rows instead of duplicating them, which
    * keeps [[estimateFromArtifact]]'s exact `n_rows` sum honest (the
    * HLL estimates tolerate duplicates anyway — union is register-max).
    * The artifact only ever grows by batch directories; nothing is
    * read back during ingest.
    *
    * Legacy guard: before the partition-directory layout (round 6) the
    * artifact was a FLAT parquet dir with `batch_id` as a data column.
    * Mixing the two breaks Spark's partition discovery (flat part files
    * next to `batch_id=` dirs fail to load), so a flat-era artifact is
    * rejected here with a migrate-or-rebuild message instead of being
    * silently wedged by the first new-format batch. */
  def appendSketches(df: DataFrame, groupCol: String, keyCol: String,
      path: String, batchId: Long, lgK: Int = 12): Unit = {
    requireNoLegacyFlatFiles(df.sparkSession, path)
    groupSketches(df, groupCol, keyCol, lgK)
      .write.mode("overwrite").parquet(s"$path/batch_id=$batchId")
  }

  /** Fails fast if `path` holds pre-partitioned (flat) sketch files:
    * data files directly under the root, rather than under
    * `batch_id=<id>` directories. Metadata files (`_SUCCESS`, dotfiles)
    * are ignored. */
  private[graft] def requireNoLegacyFlatFiles(spark: SparkSession,
      path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) {
      val flat = fs.listStatus(p).filter { s =>
        val n = s.getPath.getName
        s.isFile && !n.startsWith("_") && !n.startsWith(".")
      }
      require(flat.isEmpty,
        s"sketch artifact at $path holds ${flat.length} flat data file(s) " +
          "from the pre-partitioned layout (batch_id as a data column). " +
          "Mixing flat files with batch_id=<id> partition directories " +
          "breaks partition discovery. Migrate once with: read the flat " +
          "artifact, then appendSketches each distinct batch_id into a " +
          "NEW path — or rebuild from source batches.")
    }
  }

  /** Distinct-count estimates from the artifact alone: union every
    * batch's sketch per group (register-max — order never matters) and
    * estimate. Reading cost is O(batches × groups) tiny rows.
    * `batch_id` arrives partition-INFERRED (int for small ids) and is
    * pinned back to long here so the artifact's face is stable however
    * large the ids grow. */
  def estimateFromArtifact(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
      .withColumn("batch_id", col("batch_id").cast("long"))
      .groupBy(col("group"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch")))
          .as("distinct_estimate"),
        sum(col("n_rows")).as("n_rows"),
        countDistinct(col("batch_id")).as("n_batches"))

  /** Corpus-wide estimate across ALL groups from the artifact (one
    * union over every stored sketch — group splits don't double-count
    * shared keys because union is idempotent per key). */
  def globalEstimate(spark: SparkSession, path: String): Long =
    spark.read.parquet(path)
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch"))))
      .head().getLong(0)

  /** FREQUENCY sketch — the count-min companion of the HLL surface:
    * "how often does key X occur" from a fixed-size summary, where HLL
    * answers "how many distinct keys". One aggregation builds the
    * sketch (Spark's CountMinSketchAgg: commutative adds + a seeded
    * hash family, so the binary and every estimate are deterministic at
    * any partitioning — unlike the DataSketches HLL binary above);
    * per-source sketches MERGE by elementwise addition into exactly
    * the global sketch, which is what makes the summary append-only at
    * 100 TB: sketch each batch, add, never rescan. Estimates never
    * undercount; overcount is ≤ eps·N with probability ≥ confidence.
    * Returns the serialized sketch plus the exact total for the bound.
    */
  def countMinSketchOf(df: DataFrame, keyCol: String,
      eps: Double = 0.001, confidence: Double = 0.99, seed: Int = 164)
      : (org.apache.spark.util.sketch.CountMinSketch, Long) = {
    val row = df.agg(
      count_min_sketch(col(keyCol), lit(eps), lit(confidence),
        lit(seed)).as("cms"),
      count(col(keyCol)).as("n")).head()
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(row.getAs[Array[Byte]](0)))
    (cms, row.getLong(1))
  }

  /** Portable HyperLogLog registers (Flajolet et al. 2007) under the
    * md5 replayable-hash family — the fully-ORACLED face of the HLL
    * surface above (whose DataSketches binaries and built-in HLL++
    * estimates are engine-internal): bucket = first `p` bits of
    * md5(key) read as hex, rho = leading-zero count of the NEXT 32
    * bits + 1, register = max rho per bucket. rho comes from
    * `33 - length(bin(w))` — a string length, not a floating log, so
    * there is no log2-boundary hazard — and the whole sketch is
    * integer arithmetic that DuckDB rebuilds bit-for-bit from the same
    * parquet. One groupBy on a p-bit key: at most 2^p output rows at
    * any input scale, and register-max merge keeps the sketch
    * append-only (re-ingesting a key can never raise a register).
    * `p` must be a multiple of 4 so the bucket is a whole-hex-digit
    * prefix both engines slice identically. */
  def hllRegisters(df: DataFrame, keyCol: String, p: Int = 8): DataFrame = {
    require(p >= 4 && p <= 16 && p % 4 == 0,
      s"p must be a multiple of 4 in [4,16], got $p")
    val hexDigits = p / 4
    val h = md5(col(keyCol).cast("string").cast("binary"))
    val bucket = conv(substring(h, 1, hexDigits), 16, 10).cast("int")
    val w = conv(substring(h, hexDigits + 1, 8), 16, 10).cast("long")
    val rho = when(w === 0L, lit(33))
      .otherwise(lit(33) - length(bin(w)))
    df.where(col(keyCol).isNotNull) // NULL keys ignored, as count(DISTINCT) would
      .select(bucket.as("bucket"), rho.as("rho"))
      .groupBy("bucket").agg(max("rho").cast("int").as("register"))
  }

  /** Register-max merge of two register sets — the ONE definition of
    * HLL union shared by the overlap faces (q214, the `overlap` verb)
    * and consistent with [[hllRegistersFromArtifact]]'s cross-batch
    * merge: pointwise max per bucket, associative and idempotent. */
  def hllMergeRegisters(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("bucket"))
      .agg(max(col("register")).cast("int").as("register"))

  /** Upsert one batch's portable-HLL registers into the artifact at
    * `path` as the partition directory `batch_id=<id>` — the
    * [[appendSketches]] lifecycle applied to the fully-oracled md5
    * register face: OVERWRITE per batch directory makes at-least-once
    * redelivery replace its own rows, and register-max merge across
    * batch directories ([[hllRegistersFromArtifact]]) makes the merged
    * sketch independent of batch boundaries — a key counted in two
    * batches can never inflate a register. Each batch contributes at
    * most 2^p tiny rows however large the batch is. */
  def upsertHllBatch(df: DataFrame, keyCol: String, path: String,
      batchId: Long, p: Int = 8): Unit = {
    requireNoLegacyFlatFiles(df.sparkSession, path)
    hllRegisters(df, keyCol, p)
      .write.mode("overwrite").parquet(s"$path/batch_id=$batchId")
  }

  /** Merged registers from the artifact alone (max per bucket across
    * every batch directory — associative and idempotent, so the result
    * equals [[hllRegisters]] over the union of everything ingested).
    * Feed straight into [[hllEstimate]]. */
  def hllRegistersFromArtifact(spark: SparkSession, path: String)
      : DataFrame =
    spark.read.parquet(path)
      .groupBy(col("bucket"))
      .agg(max(col("register")).cast("int").as("register"))

  /** Bias-correction constant alpha_m (Flajolet et al. 2007 §4): the
    * asymptotic 0.7213/(1 + 1.079/m) only holds for m >= 128; the
    * paper pins exact constants for the small register counts, so a
    * p=4 sketch (m=16) is not carrying a systematic ~7% bias on top
    * of its already-large standard error. All registry queries use
    * p=8/12 where the asymptotic branch applies, so their oracles
    * replay the same constant unchanged. */
  private def hllAlpha(m: Long): Double = m match {
    case 16L => 0.673
    case 32L => 0.697
    case 64L => 0.709
    case _ => 0.7213 / (1.0 + 1.079 / m.toDouble)
  }

  /** One-row estimate summary over [[hllRegisters]] output. The
    * inverse-power sum is carried SCALED BY 2^33 as an exact BIGINT
    * (sum of `1L << (33 - register)` over non-empty buckets plus
    * 2^33 per empty bucket — every term is an integer and the total
    * stays below 2^(33+p), within exact double range for p ≤ 16;
    * the shift is never negative because rho = 33 − length(bin(w))
    * over a 32-bit w saturates registers at exactly 33), so
    * the raw estimate alpha_m * m^2 / S derives from an integer both
    * engines share; linear counting takes over below 2.5m when empty
    * buckets exist, exactly as both engines replay the same CASE.
    * Estimates are rounded to 4 dp in-engine per the oracle
    * convention. */
  def hllEstimate(registers: DataFrame, p: Int = 8): DataFrame = {
    val m = 1L << p
    val scale = 8589934592.0 // 2^33
    val alphaM2 = lit(hllAlpha(m)) * lit(m.toDouble) * lit(m.toDouble)
    val agg = registers.agg(
      count(lit(1)).as("nonzero"),
      coalesce(sum(expr("shiftleft(1L, 33 - register)")), lit(0L))
        .as("nz_scaled"),
      coalesce(max(col("register")), lit(0)).as("max_register"))
    val summary = agg.select(
      lit(m).as("m"),
      (lit(m) - col("nonzero")).as("zero_regs"),
      (col("nz_scaled") + (lit(m) - col("nonzero")) * lit(8589934592L))
        .as("sum_scaled"),
      col("max_register"))
    val raw = alphaM2 / (col("sum_scaled") / lit(scale))
    val lcUsed = col("zero_regs") > 0L && raw <= lit(2.5) * lit(m.toDouble)
    summary.select(
      col("m"), col("zero_regs"), col("max_register"), col("sum_scaled"),
      round(raw, 4).as("raw_est"),
      lcUsed.as("lc_used"),
      when(lcUsed,
        round(lit(m.toDouble) *
          log(lit(m.toDouble) / col("zero_regs").cast("double")), 4))
        .otherwise(round(raw, 4)).as("est"))
  }

  /** Per-GROUP portable-HLL registers — [[hllRegisters]] keyed by
    * `groupCols`: one groupBy on (group, p-bit bucket), at most
    * #groups × 2^p output rows at any input scale. The per-source
    * cardinality profile of a corpus in one pass, with every register
    * replayable by the oracle (the grouped twin of the DataSketches
    * [[groupSketches]] surface, whose binaries are engine-internal). */
  def hllRegistersByGroup(df: DataFrame, groupCols: Seq[String],
      keyCol: String, p: Int = 8): DataFrame = {
    require(p >= 4 && p <= 16 && p % 4 == 0,
      s"p must be a multiple of 4 in [4,16], got $p")
    require(groupCols.nonEmpty, "need at least one group column")
    val hexDigits = p / 4
    val h = md5(col(keyCol).cast("string").cast("binary"))
    val bucket = conv(substring(h, 1, hexDigits), 16, 10).cast("int")
    val w = conv(substring(h, hexDigits + 1, 8), 16, 10).cast("long")
    val rho = when(w === 0L, lit(33))
      .otherwise(lit(33) - length(bin(w)))
    df.where(col(keyCol).isNotNull) // NULL keys ignored, as count(DISTINCT) would
      .select(groupCols.map(col) :+ bucket.as("bucket") :+
        rho.as("rho"): _*)
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(max("rho").cast("int").as("register"))
  }

  /** Per-group estimate summary over [[hllRegistersByGroup]] output —
    * the [[hllEstimate]] arithmetic with the group columns retained
    * (same exact-BIGINT scaled sum, same linear-counting CASE, so the
    * grouped face replays in SQL term-for-term). One row per group. */
  def hllEstimateByGroup(registers: DataFrame, groupCols: Seq[String],
      p: Int = 8): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    val m = 1L << p
    val scale = 8589934592.0 // 2^33
    val alphaM2 = lit(hllAlpha(m)) * lit(m.toDouble) * lit(m.toDouble)
    val agg = registers.groupBy(groupCols.map(col): _*).agg(
      count(lit(1)).as("nonzero"),
      sum(expr("shiftleft(1L, 33 - register)")).as("nz_scaled"),
      max(col("register")).as("max_register"))
    val summary = agg.select(
      groupCols.map(col) ++ Seq(
        (lit(m) - col("nonzero")).as("zero_regs"),
        (col("nz_scaled") + (lit(m) - col("nonzero")) * lit(8589934592L))
          .as("sum_scaled"),
        col("max_register")): _*)
    val raw = alphaM2 / (col("sum_scaled") / lit(scale))
    val lcUsed = col("zero_regs") > 0L && raw <= lit(2.5) * lit(m.toDouble)
    summary.select(
      groupCols.map(col) ++ Seq(
        col("zero_regs"), col("max_register"), col("sum_scaled"),
        when(lcUsed,
          round(lit(m.toDouble) *
            log(lit(m.toDouble) / col("zero_regs").cast("double")), 4))
          .otherwise(round(raw, 4)).as("est")): _*)
  }

  /** QUANTILE sketch — a fixed-width histogram over an integral
    * column: bin = clamp(value DIV width, 0, nbins-1), counted in one
    * groupBy with at most `nbins` output rows at any input scale.
    * Counts merge by elementwise SUM (the q213 law), so per-shard
    * histograms add into exactly the global one — and unlike Spark's
    * own `approx_percentile` (Greenwald–Khanna summaries whose merge
    * is order-sensitive, deliberately excluded from the registry) the
    * sketch is PARTITION-INVARIANT by construction: pure integer
    * arithmetic both engines replay bit-for-bit. Accuracy is bounded
    * by the bin width the caller sizes. */
  def histogramCounts(df: DataFrame, valueCol: String, width: Long,
      nbins: Int): DataFrame = {
    require(width > 0 && nbins > 1,
      s"need width > 0 and nbins > 1, got width=$width nbins=$nbins")
    df.select(least(greatest(
        expr(s"CAST(`$valueCol` AS BIGINT) DIV $width"), lit(0L)),
        lit(nbins - 1L)).as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("cnt"))
  }

  /** Upsert one batch's histogram counts into the artifact at `path`
    * as the partition directory `batch_id=<id>` — the q213 SUM law
    * applied to the quantile sketch: per-batch bin counts add into
    * exactly the one-pass histogram, and the batchId-keyed overwrite
    * keeps at-least-once redelivery from double-counting. Each batch
    * contributes at most `nbins` tiny rows. */
  def upsertHistBatch(df: DataFrame, valueCol: String, path: String,
      batchId: Long, width: Long, nbins: Int): Unit = {
    requireNoLegacyFlatFiles(df.sparkSession, path)
    histogramCounts(df, valueCol, width, nbins)
      .write.mode("overwrite").parquet(s"$path/batch_id=$batchId")
  }

  /** Merged histogram from the artifact alone (per-bin sum across
    * every batch directory — equals [[histogramCounts]] over the
    * concatenation of everything ingested). Feed straight into
    * [[histogramQuantiles]]. */
  def histogramCountsFromArtifact(spark: SparkSession, path: String)
      : DataFrame =
    spark.read.parquet(path)
      .groupBy(col("bin")).agg(sum(col("cnt")).as("cnt"))

  /** Quantile estimates from a [[histogramCounts]] sketch: for each q
    * the target rank is ceil(q·n), the bin holding that rank comes
    * from the cumulative counts, and the estimate interpolates
    * linearly inside the bin — every term an integer except the final
    * division, so both engines replay it exactly. The probe side is
    * |qs| literal rows against ≤ nbins cumulative rows; at 100 TB the
    * sketch is the only thing that ever leaves the executors. */
  def histogramQuantiles(counts: DataFrame, width: Long,
      qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      s"quantiles must sit in (0, 1], got $qs")
    val spark = counts.sparkSession
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("bin"))
    val c = counts.withColumn("cum", sum(col("cnt")).over(w))
    val t = counts.agg(sum(col("cnt")).as("n"))
    val r = qs.toDF("q").crossJoin(t)
      .select(col("q"), ceil(col("q") * col("n")).cast("long").as("rk"))
    r.join(c,
        col("cum") >= col("rk") && (col("cum") - col("cnt")) < col("rk"))
      .select(col("q"),
        round(col("bin") * lit(width) + lit(width.toDouble) *
          (col("rk") - (col("cum") - col("cnt"))) / col("cnt"), 4)
          .as("est"))
  }

  /** Bit position of hash function `j` for `key` in a portable Bloom
    * filter of `mBits` bits: the first 48 bits of md5(j ":" key) taken
    * mod mBits — nonnegative integer arithmetic both engines replay
    * bit-for-bit (the q209/q183 md5 hash-family convention, salted by
    * the hash index so the k functions are independent draws). */
  private def bloomPos(key: Column, j: Column, mBits: Int): Column =
    (conv(substring(
        md5(concat(j.cast("string"), lit(":"), key).cast("binary")),
        1, 12), 16, 10).cast("long") % mBits).cast("int")

  /** MEMBERSHIP sketch — the portable Bloom filter completing the md5
    * sketch family (HLL = how many distinct, count-min = how often,
    * Bloom = have we seen THIS): the set bits of a filter over
    * `keyCol`, as distinct `pos` rows. Set-union mergeable and
    * append-only (bits only turn on), at most `mBits` output rows at
    * any input scale — the 100 TB shape is "sketch the reference set
    * once, broadcast the bits, screen the corpus with no shuffle of
    * the corpus itself". No false negatives ever; false-positive rate
    * ≈ (1 - e^(-k·n/m))^k, sized by the caller. */
  def bloomBits(df: DataFrame, keyCol: String, mBits: Int = 4096,
      k: Int = 3): DataFrame = {
    require(mBits > 0 && k >= 1 && k <= 8,
      s"need mBits > 0 and 1 <= k <= 8, got mBits=$mBits k=$k")
    df.where(col(keyCol).isNotNull) // a NULL key has no bits to set
      .select(col(keyCol).cast("string").as("key"))
      .select(explode(sequence(lit(1), lit(k))).as("j"), col("key"))
      .select(bloomPos(col("key"), col("j"), mBits).as("pos"))
      .distinct()
  }

  /** Upsert one batch's Bloom bits into the artifact at `path` as the
    * partition directory `batch_id=<id>` — the third merge semantics of
    * the streaming-sketch trio: HLL registers merge by MAX (q211),
    * count-min counters by SUM ([[upsertCmsBatch]]), Bloom bits by set
    * UNION. Union is idempotent per bit, so at-least-once redelivery is
    * harmless even before the per-batch overwrite replaces its rows;
    * each batch contributes at most `mBits` tiny rows. */
  def upsertBloomBatch(df: DataFrame, keyCol: String, path: String,
      batchId: Long, mBits: Int = 4096, k: Int = 3): Unit = {
    requireNoLegacyFlatFiles(df.sparkSession, path)
    bloomBits(df, keyCol, mBits, k)
      .write.mode("overwrite").parquet(s"$path/batch_id=$batchId")
  }

  /** Merged Bloom bits from the artifact alone (set union across every
    * batch directory — bits only turn on, so the merge equals
    * [[bloomBits]] over the union of everything ingested). Feed
    * straight into [[bloomScreen]]. */
  def bloomBitsFromArtifact(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).select(col("pos")).distinct()

  /** Portable count-min counter table under the md5 hash family —
    * `d` rows × `w` buckets, bucket(j, key) = md5(j "|" key)
    * first-8-hex mod w (the q183 convention, factored for the artifact
    * lifecycle): at most d·w output rows at any input scale, and
    * per-batch tables merge by elementwise SUM into exactly the
    * one-pass table because counts are additive over a partition of
    * the input. */
  /** Counter bucket of hash row `j` for `key` in a width-`w` count-min
    * table: md5("j|key") first-8-hex mod w — the ONE definition shared
    * by the build ([[cmsCounters]]) and probe ([[cmsEstimates]]) sides
    * so they can never drift apart (the q183 hash convention). */
  private def cmsBucket(key: Column, j: Column, w: Int): Column =
    pmod(conv(substring(md5(concat(j.cast("string"), lit("|"), key)
      .cast("binary")), 1, 8), 16, 10).cast("long"), lit(w.toLong))

  def cmsCounters(df: DataFrame, keyCol: String, d: Int = 4,
      w: Int = 512): DataFrame = {
    require(d >= 1 && d <= 8 && w > 0,
      s"need 1 <= d <= 8 and w > 0, got d=$d w=$w")
    val spark = df.sparkSession
    import spark.implicits._
    val js = broadcast(spark.range(d).select($"id".cast("int").as("j")))
    df.select(col(keyCol).cast("string").as("key"))
      .crossJoin(js)
      .groupBy(col("j"), cmsBucket(col("key"), col("j"), w).as("bucket"))
      .agg(count(lit(1)).as("c"))
  }

  /** Upsert one batch's count-min counters into the artifact at `path`
    * as the partition directory `batch_id=<id>`. Counters merge by SUM
    * — NOT idempotent per key like HLL's max or Bloom's union — which
    * is exactly why the batchId-keyed overwrite matters here most: an
    * at-least-once redelivery REPLACES its batch's counters instead of
    * double-counting them. */
  def upsertCmsBatch(df: DataFrame, keyCol: String, path: String,
      batchId: Long, d: Int = 4, w: Int = 512): Unit = {
    requireNoLegacyFlatFiles(df.sparkSession, path)
    cmsCounters(df, keyCol, d, w)
      .write.mode("overwrite").parquet(s"$path/batch_id=$batchId")
  }

  /** Merged counters from the artifact alone (elementwise sum across
    * every batch directory — equals [[cmsCounters]] over the
    * concatenation of everything ingested, because each key occurrence
    * was counted in exactly one batch). */
  def cmsCountersFromArtifact(spark: SparkSession, path: String)
      : DataFrame =
    spark.read.parquet(path)
      .groupBy(col("j"), col("bucket"))
      .agg(sum(col("c")).as("c"))

  /** Point-query estimates over a [[cmsCounters]] table for a tiny
    * probe set: min over the d rows of the counter at bucket(j, probe)
    * — never undercounts; overcounts only on hash collisions. The
    * probe side is a broadcast-size literal table; the counter side is
    * at most d·w rows, so the join never shuffles the corpus. */
  def cmsEstimates(counters: DataFrame, probes: Seq[String], d: Int = 4,
      w: Int = 512): DataFrame = {
    val spark = counters.sparkSession
    import spark.implicits._
    val js = broadcast(spark.range(d).select($"id".cast("int").as("j")))
    val pj = broadcast(probes.toDF("t")).crossJoin(js)
      .select($"t", $"j", cmsBucket($"t", $"j", w).as("bucket"))
    pj.join(counters, Seq("j", "bucket"), "left")
      .groupBy($"t").agg(min(coalesce($"c", lit(0L))).as("est"))
  }

  /** Screen `df` against a [[bloomBits]] filter (built with the SAME
    * mBits/k): returns the ids whose key hits on ALL k positions.
    * The bit side is tiny (≤ mBits rows) and broadcasts; the corpus
    * side explodes k rows per key through a broadcast-hash join and
    * re-groups on the id — one shuffle keyed by id, no shuffle of the
    * reference set. Supersets the exact semi-join by construction
    * (zero false negatives); the caller resolves survivors with the
    * exact check on the far-smaller flagged slice. */
  def bloomScreen(df: DataFrame, idCol: String, keyCol: String,
      bits: DataFrame, mBits: Int = 4096, k: Int = 3): DataFrame =
    df.select(col(idCol).as("id"), col(keyCol).cast("string").as("key"))
      .select(col("id"), explode(sequence(lit(1), lit(k))).as("j"),
        col("key"))
      .select(col("id"), col("j"),
        bloomPos(col("key"), col("j"), mBits).as("pos"))
      .join(broadcast(bits), "pos")
      .groupBy(col("id"))
      .agg(countDistinct(col("j")).as("nj"))
      .filter(col("nj") === k)
      .select(col("id"))
}
