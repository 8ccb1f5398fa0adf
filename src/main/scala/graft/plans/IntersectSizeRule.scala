package graft.plans

import org.apache.spark.sql.catalyst.expressions.{ArrayIntersect, ArraySort, Cast, Size}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType}

import graft.functions.SortedIntersectSize

/** Optimizer rule: `size(array_intersect(array_sort(a), array_sort(b)))`
  * over bigint arrays becomes the native merge-walk
  * `SortedIntersectSize` — no per-pair hash set, fused into codegen.
  *
  * Safe because the rewrite only fires when BOTH sides are provably
  * sorted (literally wrapped in array_sort) and the native expression
  * uses set semantics (duplicates counted once) exactly like
  * array_intersect. Users who write the natural composable form get
  * the optimized inner loop for free; registered through
  * `graft.GraftExtensions` (injectOptimizerRule).
  */
object IntersectSizeRule extends Rule[LogicalPlan] {

  private def sortedLongArray(e: org.apache.spark.sql.catalyst.expressions.Expression): Boolean =
    e.isInstanceOf[ArraySort] && (e.dataType match {
      // containsNull must be false: the merge walk reads raw longs and
      // would diverge from array_intersect's null-as-member semantics.
      case ArrayType(LongType, false) => true
      case _ => false
    })

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    // Cast preserves Size's INT type (an optimizer rule must not
    // change the plan schema).
    case Size(ArrayIntersect(l, r), legacy)
        if sortedLongArray(l) && sortedLongArray(r) && !legacy =>
      Cast(SortedIntersectSize(l, r), IntegerType)
  }
}
