package graft.plans

import graft.expressions.ArrayDistinctCountExpr
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.ArrayType

/** Optimizer rule: rewrite the distinct-COUNT idiom
  * `size(array_distinct(x))` to a native hash-set count
  * ([[ArrayDistinctCountExpr]]) that never materializes the
  * deduplicated array. The idiom runs per document in the corpus-wide
  * statistics paths (type-token ratio, distinct token/bigram counts,
  * shingle-set sizes for Jaccard denominators), where the built-in
  * composition allocates a result array plus element copies per row
  * just to read `numElements`.
  *
  * Fires only where the count is provably identical: element types
  * whose `array_distinct` equality IS binary equality
  * ([[ArrayDistinctCountExpr.safeElem]] — binary-collated strings,
  * integral/boolean/date/time types; never float/double, whose
  * -0.0/NaN normalization belongs to the built-in). NULL semantics are
  * preserved both ways: with `legacySizeOfNull` (`size(null) = -1`)
  * the rewrite guards with an explicit null check; otherwise the count
  * null-propagates exactly like `size`. A NULL ELEMENT counts once,
  * exactly as `array_distinct` keeps one. */
object DistinctCountRule extends Rule[LogicalPlan] {

  private def safeArray(t: org.apache.spark.sql.types.DataType): Boolean =
    t match {
      case ArrayType(e, _) => ArrayDistinctCountExpr.safeElem(e)
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Size(ArrayDistinct(c), legacy) if safeArray(c.dataType) =>
        val counted: Expression = ArrayDistinctCountExpr(c)
        // counted already null-propagates, so the legacy size(null) = -1
        // contract is one coalesce — NOT If(IsNull(c), ...), which would
        // evaluate the (expensive, hot-path) child twice per row.
        if (legacy) Coalesce(Seq(counted, Literal(-1))) else counted
    }
}
