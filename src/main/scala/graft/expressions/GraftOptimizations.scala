package graft.expressions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Catalyst optimizer rule: algebraic simplification of the engine's
  * native expressions. Currently: `array_cosine(x, x)` → 1.0 for any
  * deterministic non-null x (self-cosine identity) — the kind of rewrite
  * that turns an accidental O(n·d) self-comparison into a constant.
  */
object SimplifySelfCosine extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayCosine(l, r)
          if l.deterministic && l.semanticEquals(r) && !l.nullable =>
        Literal(1.0, DoubleType)
    }
}

/** SparkSessionExtensions entry point — registers the graft optimizer
  * rules and planner strategies:
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions)…
  *   // or: spark.sql.extensions=graft.expressions.GraftExtensions
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => SimplifySelfCosine)
    e.injectPlannerStrategy(_ => new graft.plans.AsOfJoinStrategy)
  }
}
