package graft.plans

import graft.expressions.RegexpMatchCountExpr
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Optimizer rule: rewrite the token-COUNT idiom
  * `size(split(str, regex))` to a native counting loop
  * ([[RegexpMatchCountExpr]] + 1) that allocates nothing per row.
  *
  * `split(s, re, -1)` (the two-arg `split` default) produces exactly
  * `matches + 1` parts — every separator occurrence is one non-empty
  * match and trailing empty parts are KEPT at limit −1 — so counting
  * separator matches replaces materializing every token substring plus
  * the array, per row, in the pattern that runs over every document of
  * a corpus (length stats, packing budgets, quantile values; the
  * repo-wide `size(tokens(text))`).
  *
  * Fires only when the identity provably holds:
  *  - the regex is a string LITERAL,
  *  - it cannot produce zero-width matches: it does not match the empty
  *    string (`matcher("").find()` false) and contains no `(?`
  *    construct (lookaround can match zero-width mid-string without
  *    matching ""; this also conservatively skips non-capturing
  *    groups), and it compiles at all,
  *  - the split limit is the two-arg default −1 (other limits change
  *    the part count).
  *
  * NULL semantics are preserved both ways: with `legacySizeOfNull`
  * (`size(null) = -1`) the rewrite guards with an explicit null check;
  * otherwise the count null-propagates exactly like `size`. */
object TokenCountRule extends Rule[LogicalPlan] {

  private[plans] def safeRegex(re: String): Boolean =
    !re.contains("(?") && (try {
      !java.util.regex.Pattern.compile(re).matcher("").find()
    } catch { case _: Exception => false })

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Size(StringSplit(str, Literal(re: UTF8String, StringType),
          Literal(-1, IntegerType)), legacy) if safeRegex(re.toString) =>
        val counted: Expression =
          Add(RegexpMatchCountExpr(str, re.toString), Literal(1))
        if (legacy) If(IsNull(str), Literal(-1), counted) else counted
    }
}
