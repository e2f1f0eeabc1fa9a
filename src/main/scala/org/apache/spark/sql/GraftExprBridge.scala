package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.SparkStrategy

/** Bridge into the `private[sql]` Column↔Expression converters — the
  * standard extension-point shim for libraries adding native Catalyst
  * expressions on Spark 4 (where `Column` wraps a ColumnNode rather than
  * an Expression directly). Also exposes the plan-level seams a custom
  * operator needs: analyzed child plans, DataFrame-from-LogicalPlan, and
  * runtime strategy registration.
  */
object GraftExprBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** The analyzed logical plan backing a DataFrame. */
  def analyzed(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed

  /** Wrap a (resolved) logical plan as a DataFrame on this session. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Idempotently add a planner strategy to the session (covers sessions
    * built without `withExtensions`). The check runs against the FULL
    * planner strategy list — which includes both `experimental` additions
    * and extension-injected strategies — so a session already carrying the
    * strategy via `GraftExtensions` is not registered twice; the
    * read-modify-write of the experimental list is serialized on the
    * experimental object so concurrent ensure calls can't drop or
    * duplicate an entry. */
  def ensureStrategy(spark: SparkSession, s: SparkStrategy): Unit = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    val exp = cs.experimental
    exp.synchronized {
      if (!cs.sessionState.planner.strategies.exists(_.getClass == s.getClass))
        exp.extraStrategies = exp.extraStrategies :+ s
    }
  }

  /** Idempotently add an optimizer rule to the session; like
    * [[ensureStrategy]], dedupes against extension-injected rules
    * (`extendedOperatorOptimizationRules`) as well as prior experimental
    * registrations, under the same lock. */
  def ensureOptimization(spark: SparkSession,
      r: org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]): Unit = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    val exp = cs.experimental
    exp.synchronized {
      val viaExtensions = cs.sessionState.optimizer
        .extendedOperatorOptimizationRules
        .exists(_.getClass == r.getClass)
      if (!viaExtensions &&
          !exp.extraOptimizations.exists(_.getClass == r.getClass))
        exp.extraOptimizations = exp.extraOptimizations :+ r
    }
  }
}
