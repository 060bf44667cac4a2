package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnShim
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for embedding-vector math over
  * `array<float>` columns.
  *
  * Same rationale as [[TextSketches]]: the `aggregate`/`zip_with` Column
  * formulation is interpreted per element; these expressions run the same
  * left-to-right double accumulation in a tight JVM loop — bit-identical
  * results (each float widens exactly to double; fold order unchanged, so
  * the DuckDB `list_sum(list_transform(...))` oracles still match).
  */
private object VecEval {
  /** Sequential-fold dot product in double, mirroring
    * `aggregate(zip_with(a,b,_*_), 0.0, _+_)` exactly. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }
}

/** Cosine similarity of two float vectors (0.0 when either norm is 0). */
case class CosineSimilarityExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType

  def compute(l: ArrayData, r: ArrayData): Double =
    nullSafeEval(l, r).asInstanceOf[Double]

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cosine", this, classOf[CosineSimilarityExpr].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.compute($a, $b);")
  }

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.sqrt(VecEval.dot(a, a)) * math.sqrt(VecEval.dot(b, b))
    java.lang.Double.valueOf(if (n == 0.0) 0.0 else VecEval.dot(a, b) / n)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Sequential-fold dot product of two float vectors. */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType

  def compute(l: ArrayData, r: ArrayData): Double =
    nullSafeEval(l, r).asInstanceOf[Double]

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dot", this, classOf[DotProductExpr].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.compute($a, $b);")
  }

  override protected def nullSafeEval(l: Any, r: Any): Any =
    java.lang.Double.valueOf(VecEval.dot(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData]))
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Sign-LSH bucket from the first `bits` dimensions (bit j ⇔ v[j] > 0). */
case class SignBucketExpr(child: Expression, bits: Int)
    extends UnaryExpression {
  // bits > 64 would silently alias (1L << j wraps at 64) and corrupt buckets
  require(bits > 0 && bits <= 64, s"sign-bucket bits must be in 1..64, got $bits")
  override def dataType: DataType = LongType

  def compute(v: ArrayData): Long = nullSafeEval(v).asInstanceOf[Long]

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("signBucket", this, classOf[SignBucketExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    var out = 0L
    var j = 0
    val n = math.min(bits, v.numElements())
    while (j < n) {
      if (v.getFloat(j) > 0f) out |= (1L << j)
      j += 1
    }
    java.lang.Long.valueOf(out)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Sign mask of dimensions [start, start+bits): bit j ⇔ v[start+j] > 0 —
  * the windowed generalization of [[SignBucketExpr]] used to PACK a whole
  * embedding into 1 bit/dim (binary quantization: a 64-dim float vector
  * becomes two LONG words, 32× less scan bandwidth for the Hamming
  * shortlist pass). Dimensions past the array end contribute 0 bits. */
case class SignMaskExpr(child: Expression, start: Int, bits: Int)
    extends UnaryExpression {
  require(start >= 0, s"sign-mask start must be >= 0, got $start")
  // bits > 64 would silently alias (1L << j wraps at 64) and corrupt masks
  require(bits > 0 && bits <= 64, s"sign-mask bits must be in 1..64, got $bits")
  override def dataType: DataType = LongType

  def compute(v: ArrayData): Long = nullSafeEval(v).asInstanceOf[Long]

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("signMask", this, classOf[SignMaskExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    var out = 0L
    var j = 0
    val n = math.min(bits, v.numElements() - start)
    while (j < n) {
      if (v.getFloat(start + j) > 0f) out |= (1L << j)
      j += 1
    }
    java.lang.Long.valueOf(out)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object VectorExpressions {
  private def e(c: Column) = GraftColumnShim.expression(c)
  def cosine(a: Column, b: Column): Column =
    GraftColumnShim.column(CosineSimilarityExpr(e(a), e(b)))
  def dot(a: Column, b: Column): Column =
    GraftColumnShim.column(DotProductExpr(e(a), e(b)))
  def signBucket(v: Column, bits: Int): Column =
    GraftColumnShim.column(SignBucketExpr(e(v), bits))
  def signMask(v: Column, start: Int, bits: Int): Column =
    GraftColumnShim.column(SignMaskExpr(e(v), start, bits))
}
