package graft.operators

import org.apache.spark.sql.DataFrame
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
      seed: Long, rowsPerShard: Long, expectedRows: Long = -1L): Long = {
    require(rowsPerShard > 0, "rowsPerShard must be positive")
    val n = if (expectedRows >= 0) expectedRows else df.count()
    val files = math.max(1L, (n + rowsPerShard - 1) / rowsPerShard).toInt
    val key = xxhash64(col(idCol), lit(seed))
    df.withColumn("__shuffle_key", key)
      .repartitionByRange(files, col("__shuffle_key"), col(idCol))
      .sortWithinPartitions(col("__shuffle_key"), col(idCol))
      .drop("__shuffle_key")
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .option("maxRecordsPerFile", rowsPerShard)
      .parquet(path)
    n
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
}
