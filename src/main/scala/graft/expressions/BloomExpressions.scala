package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Predicate, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** `bloom.mightContain(key)` as a codegen'd predicate over a pre-built
  * [[org.apache.spark.util.sketch.BloomFilter]].
  *
  * The filter is carried as a referenced object (serialized once per task
  * with the generated code), so the probe is a branch-free bit test inside
  * whole-stage codegen — the right shape for pre-filtering a fact-table
  * scan before its shuffle (see [[graft.ops.BloomJoin]]). Strings probe via
  * their UTF-8 bytes, which is exactly how `DataFrameStatFunctions
  * .bloomFilter` inserted them (no per-row String allocation).
  */
case class BloomMightContainExpr(child: Expression, bloom: BloomFilter)
    extends UnaryExpression with Predicate {

  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ByteType | ShortType | IntegerType | LongType | StringType | BinaryType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain needs an integral, string or binary key, got $other")
  }

  override protected def nullSafeEval(input: Any): Any = child.dataType match {
    case ByteType => bloom.mightContainLong(input.asInstanceOf[Byte].toLong)
    case ShortType => bloom.mightContainLong(input.asInstanceOf[Short].toLong)
    case IntegerType => bloom.mightContainLong(input.asInstanceOf[Int].toLong)
    case LongType => bloom.mightContainLong(input.asInstanceOf[Long])
    case StringType => bloom.mightContainBinary(input.asInstanceOf[UTF8String].getBytes)
    case BinaryType => bloom.mightContainBinary(input.asInstanceOf[Array[Byte]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom, classOf[BloomFilter].getName)
    val probe: String => String = child.dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        c => s"$ref.mightContainLong((long) $c)"
      case StringType => c => s"$ref.mightContainBinary($c.getBytes())"
      case BinaryType => c => s"$ref.mightContainBinary($c)"
    }
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = ${probe(c)};")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object BloomExpressions {
  /** Column predicate: does `bloom` (probably) contain `key`? */
  def mightContain(key: Column, bloom: BloomFilter): Column =
    GraftColumnShim.column(BloomMightContainExpr(GraftColumnShim.expression(key), bloom))
}
