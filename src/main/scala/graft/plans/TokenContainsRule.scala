package graft.plans

import graft.expressions.ContainsTokenExpr
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Optimizer rule (the fifth): rewrite the token-MEMBERSHIP idiom
  * `array_contains(split(str, regex), 'literal')` to the allocation-free
  * [[ContainsTokenExpr]] scan — the predicate twin of
  * [[TokenCountRule]]'s counting rewrite, for the filter that runs over
  * every row of a term probe (`StatsIndex.prunedReadToken`, ad-hoc
  * "which docs mention X" scans).
  *
  * Fires only when the identity provably holds:
  *  - the regex is a string LITERAL passing [[TokenCountRule.safeRegex]]
  *    (compiles; cannot match zero-width — part boundaries are then
  *    exactly the non-overlapping separator matches),
  *  - the split limit is the two-arg default −1 (other limits merge
  *    tail parts and change membership),
  *  - the probe value is a non-null string LITERAL (a null probe makes
  *    `array_contains` return NULL — left untouched).
  *
  * NULL propagation is preserved: split's parts are never null, so
  * `array_contains` is NULL iff `str` is NULL — exactly the unary
  * null-propagation of the replacement. */
object TokenContainsRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayContains(
          StringSplit(str, Literal(re: UTF8String, StringType),
            Literal(-1, IntegerType)),
          Literal(tok: UTF8String, StringType))
          if tok != null && TokenCountRule.safeRegex(re.toString) =>
        ContainsTokenExpr(str, re.toString, tok.toString)
    }
}
