package graft.expressions

import org.apache.spark.sql.{Column, GraftColumnShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.types._

/** Deterministic ordered sum: Σ value, folded in (ord, value) ascending
  * order — the native form of the repo's pervasive engine-exactness
  * idiom `aggregate(array_sort(collect_list(struct(ord, value))), 0.0,
  * (acc, s) -> acc + s.value)` (DSIR scores, both LM scores, the
  * HLL/quantile estimate folds, modularity, Rocchio…). IEEE addition is
  * not associative, so a reproducible double sum MUST fix its fold
  * order; the built-in composition pays for that with a per-group
  * GenericArrayData of struct copies, an interpreted comparator lambda
  * sort, and an interpreted fold lambda.
  *
  * This aggregate keeps the SAME contract on primitive parallel arrays
  * (ords: long, values: double — zero boxing on the hot path), sorts
  * once at eval, and runs inside ObjectHashAggregate with map-side
  * partial merge — partial buffers are (n pairs) of 17 bytes, and
  * merge is array concat (order is re-established once, at final eval,
  * so partial/merge order cannot perturb the result).
  *
  * Exact semantics replicated from the idiom (OrderedFoldRuleSpec pins
  * them):
  *  - sort: ord ascending with NULL ords FIRST (struct-field ordering),
  *    ties by value ascending under Spark's double total order
  *    (-0.0 == 0.0, NaN greatest) — comparator 0 implies equal values,
  *    so sort stability cannot matter;
  *  - fold: 0.0 + value left to right; one NULL value poisons the sum
  *    to NULL (Add null semantics), an empty input (FILTER'd group)
  *    folds to 0.0.
  */
case class OrderedSumAgg(
    left: Expression,  // ord: integral type
    right: Expression, // value: double
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[OrderedSumAgg.PairBuf]
  with BinaryLike[Expression] {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ByteType | ShortType | IntegerType | LongType, DoubleType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (o, v) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"ordered_sum needs (integral ord, double value), got (${o.catalogString}, ${v.catalogString})")
    }

  private def ordAsLong(v: Any): Long = v match {
    case b: Byte => b.toLong
    case s: Short => s.toLong
    case i: Int => i.toLong
    case l: Long => l
  }

  override def createAggregationBuffer(): OrderedSumAgg.PairBuf =
    new OrderedSumAgg.PairBuf()

  override def update(buf: OrderedSumAgg.PairBuf, input: InternalRow): OrderedSumAgg.PairBuf = {
    if (buf.valNull) return buf // poisoned: result is NULL regardless
    val v = right.eval(input)
    if (v == null) { buf.valNull = true; return buf }
    val o = left.eval(input)
    buf.append(o == null, if (o == null) 0L else ordAsLong(o),
      v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: OrderedSumAgg.PairBuf,
                     other: OrderedSumAgg.PairBuf): OrderedSumAgg.PairBuf = {
    if (other.valNull) { buf.valNull = true; return buf }
    if (buf.valNull) return buf
    var i = 0
    while (i < other.n) {
      buf.append(other.ordNull(i), other.ords(i), other.vals(i))
      i += 1
    }
    buf
  }

  override def eval(buf: OrderedSumAgg.PairBuf): Any = {
    if (buf.valNull) return null
    val n = buf.n
    if (n == 0) return 0.0
    val idx = new Array[Integer](n)
    var i = 0
    while (i < n) { idx(i) = Integer.valueOf(i); i += 1 }
    java.util.Arrays.sort(idx, new java.util.Comparator[Integer] {
      override def compare(a: Integer, b: Integer): Int = {
        val x = a.intValue(); val y = b.intValue()
        val xn = buf.ordNull(x); val yn = buf.ordNull(y)
        if (xn != yn) return if (xn) -1 else 1 // NULL ord sorts first
        if (!xn) {
          val c = java.lang.Long.compare(buf.ords(x), buf.ords(y))
          if (c != 0) return c
        }
        // value tie-break under Spark's double total order
        val vx = buf.vals(x); val vy = buf.vals(y)
        if (vx == vy) 0 else java.lang.Double.compare(vx, vy)
      }
    })
    var acc = 0.0
    i = 0
    while (i < n) { acc += buf.vals(idx(i).intValue()); i += 1 }
    acc
  }

  override def serialize(buf: OrderedSumAgg.PairBuf): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeBoolean(buf.valNull)
    out.writeInt(buf.n)
    var i = 0
    while (i < buf.n) {
      out.writeBoolean(buf.ordNull(i))
      out.writeLong(buf.ords(i))
      out.writeDouble(buf.vals(i))
      i += 1
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): OrderedSumAgg.PairBuf = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = new OrderedSumAgg.PairBuf()
    buf.valNull = in.readBoolean()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      buf.append(in.readBoolean(), in.readLong(), in.readDouble())
      i += 1
    }
    buf
  }

  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "ordered_sum"

  override def withNewMutableAggBufferOffset(newOffset: Int): OrderedSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): OrderedSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): OrderedSumAgg =
    copy(left = l, right = r)
}

object OrderedSumAgg {

  /** Growable primitive pair store (ordNull, ord, value). */
  final class PairBuf {
    var ords: Array[Long] = new Array[Long](16)
    var ordNull: Array[Boolean] = new Array[Boolean](16)
    var vals: Array[Double] = new Array[Double](16)
    var n: Int = 0
    var valNull: Boolean = false

    def append(on: Boolean, o: Long, v: Double): Unit = {
      if (n == ords.length) {
        ords = java.util.Arrays.copyOf(ords, n * 2)
        ordNull = java.util.Arrays.copyOf(ordNull, n * 2)
        vals = java.util.Arrays.copyOf(vals, n * 2)
      }
      ordNull(n) = on; ords(n) = o; vals(n) = v; n += 1
    }
  }

  /** Column API: deterministic ordered sum of `value` in (`ord`,
    * `value`) ascending order. */
  def orderedSum(ord: Column, value: Column): Column =
    GraftColumnShim.column(
      OrderedSumAgg(GraftColumnShim.expression(ord),
        GraftColumnShim.expression(value)).toAggregateExpression())
}
