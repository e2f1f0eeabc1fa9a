package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted join for skewed keys: explode the small side into `salts`
  * replicas, salt the big side's key with a deterministic hash-derived
  * salt, and join on (key, salt) — a hot key's rows spread over `salts`
  * shuffle partitions instead of one. Semantics-preserving (inner/left
  * joins on equality), so results stay oracle-checkable against a plain
  * join.
  *
  * AQE's skew-join handling covers sort-merge cases adaptively; explicit
  * salting remains the tool when the skew is in an aggregation key or AQE
  * can't split (e.g. a single monster key in a hash join).
  */
object SkewJoin extends Serializable {

  /** Inner-join `big` (skewed) with `small` on `key`, spreading each big
    * key over `salts` partitions. `small` is replicated `salts`× — keep it
    * genuinely small. */
  def saltedInnerJoin(big: DataFrame, small: DataFrame, key: String,
      salts: Int = 8): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(col(key), monotonically_increasing_id()), lit(salts.toLong)))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    saltedBig.join(replicatedSmall, Seq(key, "__salt")).drop("__salt")
  }

  /** Salted aggregation: two-phase groupBy for a skewed grouping key —
    * partial aggregate on (key, salt), final on key. For algebraic
    * aggregates Spark's partial aggregation already does this map-side;
    * the explicit form matters for high-cardinality collect-style aggs. */
  /** Key-distribution profile: the top-k heaviest keys with their row
    * counts and corpus share — the diagnosis step BEFORE choosing a skew
    * mitigation (salting factor, AQE skew thresholds, broadcast). One
    * aggregation + a tiny top-k; run it on a sample at 100 TB. */
  def keyProfile(df: DataFrame, key: String, topK: Int = 10): DataFrame = {
    val counts = df.groupBy(col(key)).agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("total"))
    counts.crossJoin(broadcast(total))
      .select(col(key), col("n"),
        round(col("n") / col("total") * 100.0, 4).as("pct"))
      .orderBy(col("n").desc, col(key))
      .limit(topK)
  }

  def saltedCount(df: DataFrame, key: String, salts: Int = 8): DataFrame =
    df.withColumn("__salt",
        pmod(xxhash64(col(key), monotonically_increasing_id()), lit(salts.toLong)))
      .groupBy(col(key), col("__salt")).agg(count(lit(1)).as("partial"))
      .groupBy(col(key)).agg(sum(col("partial")).as("n"))
}
