package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnShim
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Native Catalyst expression for the multimodal decode stub's byte-fold
  * checksum: `fold(acc, b) = (acc*31 + (b & 0xff)) mod 2^31` over a binary
  * payload.
  *
  * This replaces the round-1 `Dataset.map → mapPartitions` detour (two
  * serialization hops outside whole-stage codegen) with a codegen'd
  * per-row expression, and — because the fold is plain arithmetic — makes
  * the `mm_features` query expressible in DuckDB
  * (`list_reduce(list_prepend(0, bytes), (a,x) -> (a*31+x) % 2147483648)`),
  * closing the one no-oracle gap from round 1.
  */
case class ByteFoldChecksumExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  def compute(bytes: Array[Byte]): Long = {
    var acc = 0L
    var i = 0
    while (i < bytes.length) {
      acc = (acc * 31 + (bytes(i) & 0xff)) & 0x7fffffffL
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("byteFold", this, classOf[ByteFoldChecksumExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(compute(input.asInstanceOf[Array[Byte]]))

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object MediaExpressions {
  /** Byte-fold checksum of a binary column (see [[ByteFoldChecksumExpr]]). */
  def byteFoldChecksum(payload: Column): Column =
    GraftColumnShim.column(ByteFoldChecksumExpr(GraftColumnShim.expression(payload)))
}
