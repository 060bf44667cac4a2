package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Count of non-overlapping matches of a CONSTANT `regex` in `child` —
  * a counting loop over a pattern compiled once per query, allocating
  * NOTHING per row beyond the `toString` of the input.
  *
  * Exists because both idioms Spark offers for "how many tokens"
  * materialize throw-away arrays per row: `size(split(s, re))` builds
  * every token substring plus the array, and `regexp_count` is
  * RuntimeReplaceable sugar for `size(regexp_extract_all(s, re, 0))` —
  * the same allocation profile. For the token-COUNT pattern that runs
  * on every document of a 100 TB corpus (length stats, packing budgets,
  * quantile values), the array is pure garbage-pressure;
  * [[graft.plans.TokenCountRule]] rewrites the split idiom to this
  * expression automatically.
  *
  * Matches are advanced exactly like `Matcher.find()` in a loop, with a
  * one-char bump after a zero-width match so pathological patterns
  * cannot loop forever (the rule never inserts such patterns — belt and
  * braces). NULL input → NULL (standard unary null propagation). */
case class RegexpMatchCountExpr(child: Expression, regex: String)
    extends UnaryExpression {

  override def dataType: DataType = IntegerType

  @transient private lazy val pattern = java.util.regex.Pattern.compile(regex)

  def count(s: UTF8String): Int = {
    val str = s.toString
    val m = pattern.matcher(str)
    var c = 0
    var idx = 0
    while (idx <= str.length && m.find(idx)) {
      c += 1
      idx = if (m.end() == m.start()) m.end() + 1 else m.end()
    }
    c
  }

  override protected def nullSafeEval(input: Any): Any =
    count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("regexpMatchCount", this,
      classOf[RegexpMatchCountExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.count($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)

  override def toString: String = s"regexp_match_count($child, $regex)"
}
