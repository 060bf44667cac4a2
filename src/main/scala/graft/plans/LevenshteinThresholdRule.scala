package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: rewrite threshold comparisons on un-thresholded
  * `levenshtein(a, b)` into Spark's THRESHOLDED Levenshtein, whose DP
  * early-exits once the distance provably exceeds the bound (a banded
  * O(len·threshold) walk instead of the full O(len²) matrix — the
  * dominant cost of a fuzzy-join verify stage when texts are long and
  * the bound is tight).
  *
  * `levenshtein(a, b, t)` returns the exact distance when it is ≤ t and
  * −1 otherwise, so for a non-negative integer literal d:
  *
  *  - `levenshtein(a,b) <= d`  ≡ `levenshtein(a,b,d)  >= 0`
  *  - `levenshtein(a,b) <  d`  ≡ `levenshtein(a,b,d−1) >= 0`  (d ≥ 1)
  *  - `levenshtein(a,b) >  d`  ≡ `levenshtein(a,b,d)  == −1`
  *  - `levenshtein(a,b) >= d`  ≡ `levenshtein(a,b,d−1) == −1` (d ≥ 1)
  *
  * NULL inputs propagate to NULL through both forms, so the rewrite is
  * semantics-preserving in any context (filter, join condition, or
  * projected boolean). Mirrored literal-on-the-left comparisons and an
  * integral up-cast around the levenshtein call (the common
  * `.cast("long")` idiom) are recognized too. Comparisons that are
  * degenerate (d < 0, or d−1 < 0 variants) are left untouched — the
  * optimizer's constant machinery owns those.
  *
  * Install session-wide with [[GraftOptimizations.install]] or for every
  * session of the application via
  * `spark.sql.extensions=graft.GraftExtensions`. [[graft.ops.Dedup
  * .editDistanceJoin]] does not depend on the rule — it calls the
  * thresholded form directly; the rule serves ad-hoc SQL/DataFrame
  * predicates a user writes against the plain function. */
object LevenshteinThresholdRule extends Rule[LogicalPlan] {

  /** The un-thresholded levenshtein, possibly under an integral up-cast. */
  private def asLev(e: Expression): Option[Levenshtein] = e match {
    case l: Levenshtein if l.threshold.isEmpty => Some(l)
    case c: Cast if c.dataType == LongType || c.dataType == IntegerType =>
      asLev(c.child)
    case _ => None
  }

  private def litVal(e: Expression): Option[Long] = e match {
    case Literal(v: Int, IntegerType) => Some(v.toLong)
    case Literal(v: Long, LongType) => Some(v)
    case _ => None
  }

  private def bounded(l: Levenshtein, d: Long): Expression =
    Levenshtein(l.left, l.right, Some(Literal(d.toInt)))

  private def within(l: Levenshtein, d: Long): Expression =
    GreaterThanOrEqual(bounded(l, d), Literal(0))

  private def beyond(l: Levenshtein, d: Long): Expression =
    EqualTo(bounded(l, d), Literal(-1))

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // dist <= d / d >= dist
      case LessThanOrEqual(le, dl) if asLev(le).isDefined &&
          litVal(dl).exists(d => d >= 0 && d <= Int.MaxValue) =>
        within(asLev(le).get, litVal(dl).get)
      case GreaterThanOrEqual(dl, le) if asLev(le).isDefined &&
          litVal(dl).exists(d => d >= 0 && d <= Int.MaxValue) =>
        within(asLev(le).get, litVal(dl).get)
      // dist < d / d > dist
      case LessThan(le, dl) if asLev(le).isDefined &&
          litVal(dl).exists(d => d >= 1 && d <= Int.MaxValue) =>
        within(asLev(le).get, litVal(dl).get - 1)
      case GreaterThan(dl, le) if asLev(le).isDefined &&
          litVal(dl).exists(d => d >= 1 && d <= Int.MaxValue) =>
        within(asLev(le).get, litVal(dl).get - 1)
      // dist > d / d < dist
      case GreaterThan(le, dl) if asLev(le).isDefined &&
          litVal(dl).exists(d => d >= 0 && d <= Int.MaxValue) =>
        beyond(asLev(le).get, litVal(dl).get)
      case LessThan(dl, le) if asLev(le).isDefined &&
          litVal(dl).exists(d => d >= 0 && d <= Int.MaxValue) =>
        beyond(asLev(le).get, litVal(dl).get)
      // dist >= d / d <= dist
      case GreaterThanOrEqual(le, dl) if asLev(le).isDefined &&
          litVal(dl).exists(d => d >= 1 && d <= Int.MaxValue) =>
        beyond(asLev(le).get, litVal(dl).get - 1)
      case LessThanOrEqual(dl, le) if asLev(le).isDefined &&
          litVal(dl).exists(d => d >= 1 && d <= Int.MaxValue) =>
        beyond(asLev(le).get, litVal(dl).get - 1)
    }
}

/** Session-scoped installation of the library's optimizer rules (the
  * extensions path `spark.sql.extensions=graft.GraftExtensions` installs
  * them application-wide at session build instead). Idempotent. */
object GraftOptimizations {
  private val rules: Seq[Rule[LogicalPlan]] =
    Seq(LevenshteinThresholdRule, TokenCountRule, TokenContainsRule,
      DistinctCountRule, OrderedFoldRule)

  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations =
      cur ++ rules.filterNot(cur.contains)
  }

  def uninstall(spark: SparkSession): Unit =
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(rules.contains)
}
