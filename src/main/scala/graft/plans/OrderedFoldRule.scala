package graft.plans

import graft.expressions.OrderedSumAgg
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, CollectList}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule #4: rewrite the deterministic ordered-fold idiom
  *
  *   aggregate(array_sort(collect_list(struct(ord, value))),
  *             0.0, (acc, s) -> acc + s.value)
  *
  * to the native [[OrderedSumAgg]]. The idiom is the repo's standard way
  * to make a double sum reproducible (IEEE addition is order-sensitive,
  * so the fold order must be pinned) and runs per GROUP in the hottest
  * aggregation paths — DSIR scoring, the bigram/stupid-backoff LM means,
  * the HLL estimate fold, modularity, Rocchio. The built-in composition
  * materializes a GenericArrayData of struct copies per group, sorts it
  * with an interpreted comparator lambda, then folds with an interpreted
  * lambda; the native aggregate keeps primitive (long, double) parallel
  * arrays, merges partials by concat, and sorts+sums once at final eval
  * (micro-probe at 20M pairs: 1.4x on the register-fold shape — n/64
  * groups of 64 — and 2.3x on the per-doc-mean shape — 20k groups of
  * 1000; graft.tools.MicroFold, SCALE.md).
  *
  * Fires only where the rewrite is provably identical:
  *  - the collected struct has exactly (integral ord, double value) —
  *    the only shape the repo's idiom uses;
  *  - array_sort carries its DEFAULT comparator (structurally verified:
  *    If(l < r, -1, If(l > r, 1, 0)) over the lambda's own arguments) —
  *    ascending struct order, i.e. ord ascending NULLS FIRST with value
  *    ascending tie-break, exactly [[OrderedSumAgg]]'s eval order;
  *  - the fold seed is literal +0.0 (exact bits: a -0.0 seed returns
  *    -0.0 on an empty FILTER'd group, which the aggregate's 0.0 would
  *    not reproduce), the merge lambda is exactly `acc + s.<field 1>`,
  *    and the finish lambda is the identity;
  *  - the collect_list is non-distinct. NULL semantics are preserved:
  *    a NULL value poisons the sum to NULL (Add), NULL ords sort first
  *    (struct-field ordering), an empty group folds to the seed.
  */
object OrderedFoldRule extends Rule[LogicalPlan] {

  private def isIntegral(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** `(l, r) -> if (l < r) -1 else if (l > r) 1 else 0` over the
    * lambda's own two arguments — array_sort's default comparator. */
  private def isDefaultComparator(e: Expression): Boolean = e match {
    case LambdaFunction(
        If(LessThan(l1: NamedLambdaVariable, r1: NamedLambdaVariable),
          Literal(-1, IntegerType),
          If(GreaterThan(l2: NamedLambdaVariable, r2: NamedLambdaVariable),
            Literal(1, IntegerType), Literal(0, IntegerType))),
        Seq(a1: NamedLambdaVariable, a2: NamedLambdaVariable), false) =>
      l1.exprId == a1.exprId && r1.exprId == a2.exprId &&
        l2.exprId == a1.exprId && r2.exprId == a2.exprId
    case _ => false
  }

  private def isPlusZero(e: Expression): Boolean = e match {
    case Literal(v: Double, DoubleType) =>
      java.lang.Double.doubleToRawLongBits(v) == 0L
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
          ArraySort(
            ae @ AggregateExpression(
              CollectList(cns: CreateNamedStruct, _, _), _, false, None, _),
            cmp, false),
          zero,
          LambdaFunction(
            Add(accRef: NamedLambdaVariable,
              GetStructField(sRef: NamedLambdaVariable, 1, _), _),
            Seq(accArg: NamedLambdaVariable, sArg: NamedLambdaVariable), false),
          LambdaFunction(fin: NamedLambdaVariable,
            Seq(finArg: NamedLambdaVariable), false))
        if cns.valExprs.length == 2 &&
          isIntegral(cns.valExprs.head.dataType) &&
          cns.valExprs(1).dataType == DoubleType &&
          isPlusZero(zero) &&
          accRef.exprId == accArg.exprId && sRef.exprId == sArg.exprId &&
          fin.exprId == finArg.exprId &&
          isDefaultComparator(cmp) =>
        ae.copy(aggregateFunction =
          OrderedSumAgg(cns.valExprs.head, cns.valExprs(1)))
    }
}
