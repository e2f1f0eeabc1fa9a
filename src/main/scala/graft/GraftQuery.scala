package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator query: a Spark DataFrame program plus (when the
  * semantics are deterministic and ANSI-SQL-expressible) an equivalent
  * DuckDB oracle query over the same parquet tables.
  *
  * Column names in `run`'s output and `oracle`'s projection must match
  * exactly (the driver sorts columns by name before hashing), and every
  * oracle-checked query ends in a total ORDER BY so row order is
  * deterministic on both sides. Doubles produced by arithmetic are rounded
  * in-engine (round(x, 2..6)) so both engines materialize the identical
  * double bits.
  */
final case class GraftQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

/** Central registry — SparkEntry derives its maps from here. */
object Registry {
  def all: Seq[GraftQuery] =
    RelationalQueries.all ++ TextQueries.all ++ VectorQueries.all ++
      MLQueries.all ++ OperatorQueries.all ++ SqlCoverageQueries.all ++
      SqlCoverageQueries2.all ++ PipelineQueries.all ++
      CurationQueries.all ++ SplitQueries.all ++ AnalyticsQueries.all

  /** Architecture-contrast demos kept OUT of the timed/gated registry
    * (the `exhibit` CLI verb and MlContrastSpec run them) — see
    * [[MLQueries.exhibits]]. */
  def exhibits: Seq[GraftQuery] = MLQueries.exhibits

  def byName(name: String): GraftQuery =
    (all ++ exhibits).find(_.name == name).getOrElse(
      throw new NoSuchElementException(s"no query named $name"))
}
