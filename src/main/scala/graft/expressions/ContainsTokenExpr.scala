package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, Predicate, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.unsafe.types.UTF8String

/** True iff splitting `child` on the CONSTANT `regex` (at the two-arg
  * `split` limit −1, i.e. trailing empty parts kept) yields a part equal
  * to the CONSTANT `token` — the allocation-free form of
  * `array_contains(split(s, re), tok)`.
  *
  * Exists for the raw-file term-probe predicate
  * ([[graft.io.StatsIndex.prunedReadToken]] — the "grep the lake" path
  * runs it over every surviving row) and any token-membership filter
  * over a corpus: the split idiom materializes EVERY token substring
  * plus the array per row only to compare each against one constant;
  * this walks the separator matches and region-compares the in-between
  * spans, allocating nothing beyond the input's `toString`.
  * [[graft.plans.TokenContainsRule]] rewrites the idiom automatically.
  *
  * Part boundaries replicate `java.util.regex`-based split at limit −1
  * exactly (leading empty part when the string starts with a separator,
  * trailing empty part when it ends with one, `[""]` for the empty
  * string); the rule only fires for regexes that cannot match
  * zero-width (the [[graft.plans.TokenCountRule]] safety test), and the
  * loop still bumps one char after a zero-width match so a pathological
  * pattern cannot spin. NULL input → NULL (standard unary propagation);
  * a missing token is `false`, like `array_contains` over the
  * never-null parts of a split. */
case class ContainsTokenExpr(child: Expression, regex: String, token: String)
    extends UnaryExpression with Predicate {

  @transient private lazy val pattern = java.util.regex.Pattern.compile(regex)

  def containsToken(s: UTF8String): Boolean = {
    val str = s.toString
    val m = pattern.matcher(str)
    var partStart = 0
    var idx = 0
    while (idx <= str.length && m.find(idx)) {
      if (m.start() - partStart == token.length &&
        str.regionMatches(partStart, token, 0, token.length)) return true
      partStart = m.end()
      idx = if (m.end() == m.start()) m.end() + 1 else m.end()
    }
    str.length - partStart == token.length &&
      str.regionMatches(partStart, token, 0, token.length)
  }

  override protected def nullSafeEval(input: Any): Any =
    containsToken(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("containsToken", this,
      classOf[ContainsTokenExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.containsToken($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)

  override def toString: String = s"contains_token($child, $regex, $token)"
}
