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
