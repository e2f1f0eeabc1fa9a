package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Output-side operators (SURVEY.md §2.1 S7/S8): the reference's Mongo
  * insert/upsert become JSON / parquet directory writes keyed the same
  * way. Partition count is the caller's concern; docs are small so the
  * default is a single file per doc set.
  */
object Sinks {

  def writeJson(df: DataFrame, path: String, coalesceTo: Int = 1): Unit =
    df.coalesce(coalesceTo).write.mode(SaveMode.Overwrite).json(path)

  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)

  /** S8: k-store upsert — overwrite the partition keyed by
    * (algorithm, macro, micro, firstColumn, secondColumn), the
    * deterministic-reduce replacement for the reference's 12-thread Mongo
    * upsert race (`optimal_k.py:195-283`, SURVEY.md §7.4). */
  def upsertKStore(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .partitionBy("algorithm", "macro", "micro", "firstColumn",
        "secondColumn")
      .json(path)

  /** MERGE-style upsert without a table format: rows from `updates`
    * replace same-key rows of `existing`, new keys append. One
    * anti-join + union — the emulation to use until a Delta/Iceberg
    * catalog is available; with one, this becomes MERGE INTO. */
  def upsertByKey(existing: DataFrame, updates: DataFrame,
      keys: Seq[String]): DataFrame =
    existing.join(updates.select(keys.map(col): _*), keys, "left_anti")
      .unionByName(updates)
}
