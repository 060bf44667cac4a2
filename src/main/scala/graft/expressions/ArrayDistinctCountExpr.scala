package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Distinct-element COUNT of an array without materializing the
  * deduplicated array: the native target of
  * [[graft.plans.DistinctCountRule]]'s `size(array_distinct(x))`
  * rewrite. The built-in composition allocates a whole result array
  * (plus its element copies) per row just to read its length — in the
  * per-document hot paths that compute type-token ratios, distinct
  * token/bigram counts, and shingle-set sizes over every document of a
  * corpus, that is pure allocation/GC pressure. This walks the array
  * once into a hash set and returns the size.
  *
  * Element semantics mirror `array_distinct` exactly for the types the
  * rule admits (binary-collated strings, integral/boolean/date/time
  * types): binary equality, at most one NULL element counted.
  * Float/double arrays are NOT admitted (their -0.0/NaN normalization
  * is the built-in's concern; the rule never fires there). */
case class ArrayDistinctCountExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  private lazy val et = child.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(e, _) if ArrayDistinctCountExpr.safeElem(e) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"array_distinct_count expects an array of a binary-comparable " +
        s"element type, got ${other.catalogString}")
  }

  def compute(a: ArrayData): Int = {
    val n = a.numElements()
    val seen = new java.util.HashSet[Any]()
    var seenNull = false
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) seenNull = true
      else seen.add(a.get(i, et))
      i += 1
    }
    seen.size + (if (seenNull) 1 else 0)
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("adc", this,
      classOf[ArrayDistinctCountExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override def prettyName: String = "array_distinct_count"

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object ArrayDistinctCountExpr {
  /** Element types whose `array_distinct` equality is plain binary
    * equality — the ONLY types the rewrite admits. */
  def safeElem(t: DataType): Boolean = t match {
    case StringType => true // UTF8_BINARY collation only
    case BooleanType | ByteType | ShortType | IntegerType | LongType |
         DateType | TimestampType | TimestampNTZType => true
    case _ => false
  }
}
