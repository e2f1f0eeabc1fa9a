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
    * built without `withExtensions`). */
  def ensureStrategy(spark: SparkSession, s: SparkStrategy): Unit = {
    val exp = spark.asInstanceOf[classic.SparkSession].experimental
    if (!exp.extraStrategies.exists(_.getClass == s.getClass))
      exp.extraStrategies = exp.extraStrategies :+ s
  }

  /** Idempotently add an optimizer rule to the session. */
  def ensureOptimization(spark: SparkSession,
      r: org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]): Unit = {
    val exp = spark.asInstanceOf[classic.SparkSession].experimental
    if (!exp.extraOptimizations.exists(_.getClass == r.getClass))
      exp.extraOptimizations = exp.extraOptimizations :+ r
  }
}
