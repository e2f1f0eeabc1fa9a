package graft.expressions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{
  And, AttributeSet, Literal, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{
  Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

import graft.plans.AsOfJoinPlan

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

/** Optimizer rules for the custom as-of join node. A LogicalPlan Catalyst
  * doesn't know is an optimization BARRIER — filters stop above it and
  * every column survives to the exchange. These two rules restore the
  * pieces that matter at scale:
  *
  *  - left-side filter pushdown: as-of output rows correspond 1:1 to left
  *    rows, so any deterministic predicate over left attributes commutes
  *    with the join and can run before the shuffle;
  *  - right-side column pruning: only the join keys, the timestamp, and
  *    right columns the parent actually uses need to be shuffled.
  */
object AsOfJoinPushdown extends Rule[LogicalPlan] with PredicateHelper {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, a: AsOfJoinPlan) =>
      val (push, keep) = splitConjunctivePredicates(cond).partition(p =>
        p.deterministic && p.references.subsetOf(a.left.outputSet))
      if (push.isEmpty) f
      else {
        val pushed = a.copy(left = Filter(push.reduce(And), a.left))
        if (keep.isEmpty) pushed else Filter(keep.reduce(And), pushed)
      }
    case p @ Project(list, a: AsOfJoinPlan) =>
      val needed = AttributeSet(list.flatMap(_.references)) ++ a.references
      val rKeep = a.right.output.filter(needed.contains)
      if (rKeep.length < a.right.output.length)
        Project(list, a.copy(right = Project(rKeep, a.right)))
      else p
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
    e.injectOptimizerRule(_ => AsOfJoinPushdown)
    e.injectPlannerStrategy(_ => new graft.plans.AsOfJoinStrategy)
  }
}
