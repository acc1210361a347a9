package graft.plans

import org.apache.spark.sql.catalyst.expressions.{ArrayDistinct, ArraySort, Expression}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule for the multi-value codec (SURVEY §4: "optionally, a
  * Rule to collapse the multi-value codec chains"): pipelines re-apply
  * normalization idempotently (ref steps are convergent by design), so
  * nested rewrites like `array_distinct(array_distinct(x))` appear when
  * steps compose. The rule removes the redundant inner pass.
  *
  * Registered via [[graft.functions.GraftExtensions]]
  * (`injectOptimizerRule`) — it runs with the standard optimizer batch
  * and composes with ColumnPruning/CollapseProject.
  */
object CollapseRedundantArrayOps extends Rule[LogicalPlan] {

  private def simplify(e: Expression): Expression = e.transformUp {
    // distinct of distinct — second pass can't remove anything
    case ArrayDistinct(inner @ ArrayDistinct(_)) => inner
    // distinct over sort: sorting doesn't introduce duplicates, but
    // distinct destroys sortedness the caller asked for — keep the sort
    // outermost instead of running it twice
    case ArraySort(ArraySort(x, cmp1, b1), cmp2, b2)
        if cmp1.semanticEquals(cmp2) => ArraySort(x, cmp1, b1 && b2)
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions { case e => simplify(e) }
}
