package graft.expressions

import org.apache.spark.sql.{Column, GraftColumnShim}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

import java.util.zip.Deflater

/** DEFLATE-compressed byte length of the UTF-8 text — the input to the
  * compression-ratio quality signal (deflate_len / raw_len) that
  * RedPajama-v2 / Dolma-class pipelines compute per document: highly
  * repetitive boilerplate (menus, templates, spam) compresses far below
  * prose, and the ratio needs no vocabulary, language model, or corpus
  * statistics — a pure per-row signal.
  *
  * Native expression, not a UDF: works on the UTF8String's bytes
  * directly (no String decode), compresses into a fixed thread-local
  * scratch buffer whose CONTENT is discarded — only the byte count
  * survives — so the per-row allocation is zero. The Deflater itself is
  * thread-local and reset per row (creating one per row would thrash
  * native zlib allocations).
  *
  * Level is fixed (6, zlib default) and raw-deflate (nowrap): the size
  * is a deterministic function of the input bytes for a given zlib, so
  * the operator is stable across runs and partitionings on one cluster
  * image. It is NOT mirrored in SQL (DuckDB exposes no deflate) — the
  * driver's rows-only check plus DeflateSpec's pinned fixture sizes
  * cover it (COVERAGE.md ∅ convention).
  */
case class DeflateSizeExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(input: Any): Any =
    DeflateSizeExpr.size(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.DeflateSizeExpr.size($c);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)

  override def toString: String = s"deflate_size($child)"
}

object DeflateSizeExpr {

  /** Per-thread zlib state + 8 KiB scratch sink (content discarded). */
  private val local = ThreadLocal.withInitial[(Deflater, Array[Byte])](() =>
    (new Deflater(Deflater.DEFAULT_COMPRESSION, /* nowrap = */ true),
      new Array[Byte](8192)))

  /** Compressed length of the UTF-8 bytes of `s`. Empty input → 0 (raw
    * deflate of zero bytes emits a 2-byte empty block; reporting 0 keeps
    * ratio(empty) well-defined as 0/0-guarded downstream). */
  def size(s: UTF8String): Int = {
    val bytes = s.getBytes
    if (bytes.isEmpty) return 0
    val (d, sink) = local.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    var n = 0
    while (!d.finished()) n += d.deflate(sink)
    n
  }

  /** Column wrapper. */
  def deflateSize(c: Column): Column =
    GraftColumnShim.column(DeflateSizeExpr(GraftColumnShim.expression(c)))
}
