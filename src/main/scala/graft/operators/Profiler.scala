package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality gate ("expectations" for ingest): a set of
  * named validity rules evaluated over the whole table in ONE
  * aggregation pass — per rule, row count, NULL count (the rule
  * expression evaluated to NULL, i.e. an input it needs was missing)
  * and violation count (evaluated to false). The report comes back
  * long-form so it can gate a pipeline ("fail if any n_violations > 0")
  * or land in a quality dashboard.
  *
  * Shape at 100 TB: all rules share one scan and one partial-aggregate
  * (2·|rules|+1 accumulators), no shuffle beyond the single final-agg
  * row; the long-form pivot happens on that one row.
  */
object Profiler extends Serializable {

  /** `valid` is a boolean expression: true = pass, false = violation,
    * NULL = required input missing (reported separately). */
  final case class Rule(name: String, valid: Column)

  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "at least one rule")
    require(rules.map(_.name).distinct.size == rules.size,
      "rule names must be unique")
    // rule names become internal column names — a dot or backtick would
    // be parsed as a nested-field path in col()
    rules.foreach(r => require(r.name.matches("[A-Za-z0-9_-]+"),
      s"rule name '${r.name}' must match [A-Za-z0-9_-]+"))
    // coalesce: sum over ZERO rows is NULL, and a NULL violation count
    // would both slip past a `n_violations > 0` gate and NPE a typed
    // reader — an empty input must report 0/0/0, not NULL
    val aggs = rules.flatMap { r =>
      Seq(
        coalesce(sum(when(r.valid.isNull, 1L).otherwise(0L)), lit(0L))
          .as(s"${r.name}__null"),
        coalesce(sum(when(!r.valid, 1L).otherwise(0L)), lit(0L))
          .as(s"${r.name}__bad"))
    } :+ count(lit(1)).as("__n")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = rules.map { r =>
      struct(lit(r.name).as("rule"), col("__n").as("n_rows"),
        col(s"${r.name}__null").as("n_null"),
        col(s"${r.name}__bad").as("n_violations"))
    }
    one.select(explode(array(stacked: _*)).as("r"))
      .select(col("r.rule").as("rule"), col("r.n_rows").as("n_rows"),
        col("r.n_null").as("n_null"),
        col("r.n_violations").as("n_violations"))
  }
}
