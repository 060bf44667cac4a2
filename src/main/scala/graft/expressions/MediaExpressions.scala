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

/** 60-bit blockhash perceptual sketch of a binary payload: the bytes
  * split into 60 contiguous blocks (byte j of n belongs to block
  * ⌊j·60/n⌋), bit i is set iff `60·blockSum_i > totalSum` (the block's
  * byte mass above the global average, compared by exact integer
  * cross-multiplication — no division, no floats). A few changed bytes
  * flip at most their blocks' bits, so perceptually-near payloads sit at
  * small Hamming distance — the binary-payload twin of SimHash, feeding
  * the same 4×15-bit band machinery (exact recall at Hamming ≤ 3).
  * 60 bits keeps the value in the repo's nonnegative hash convention.
  * Empty payloads hash to 0. */
case class BlockHash60Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  def compute(bytes: Array[Byte]): Long = {
    val n = bytes.length
    if (n == 0) return 0L
    val sums = new Array[Long](60)
    var total = 0L
    var j = 0
    while (j < n) {
      val v = (bytes(j) & 0xff).toLong
      sums((j.toLong * 60L / n).toInt) += v
      total += v
      j += 1
    }
    var h = 0L
    var i = 0
    while (i < 60) {
      if (60L * sums(i) > total) h |= 1L << i
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("blockHash", this, classOf[BlockHash60Expr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(compute(input.asInstanceOf[Array[Byte]]))

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Container-DECLARED total byte size, recovered from the payload's own
  * headers: RIFF = 8 + the little-endian chunk size at offset 4;
  * ISO-BMFF = the sum of top-level box sizes from a size-header-only box
  * walk (a truncated tail still REPORTS its declared size — the point of
  * an integrity audit: declared ≠ actual flags truncation or padding).
  * Formats without a total-size field (PNG/JPEG/GIF/…) → NULL; a
  * nonsensical box size (2..7) → NULL rather than a loop. The two
  * spec-valid special sizes are honored: size 0 = box extends to end of
  * file (declared += remaining bytes, walk ends), size 1 = 64-bit
  * `largesize` follows the box type (ISO/IEC 14496-12 §4.2). */
case class DeclaredSizeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  def compute(b: Array[Byte]): java.lang.Long = {
    def u32le(i: Int): Long =
      (b(i) & 0xffL) | (b(i + 1) & 0xffL) << 8 |
        (b(i + 2) & 0xffL) << 16 | (b(i + 3) & 0xffL) << 24
    def u32be(i: Int): Long =
      (b(i) & 0xffL) << 24 | (b(i + 1) & 0xffL) << 16 |
        (b(i + 2) & 0xffL) << 8 | (b(i + 3) & 0xffL)
    if (b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F')
      java.lang.Long.valueOf(8L + u32le(4))
    else if (b.length >= 8 && b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p') {
      def u64be(i: Int): Long =
        u32be(i) << 32 | u32be(i + 4)
      var ofs = 0L
      var total = 0L
      while (ofs + 8 <= b.length) {
        val sz32 = u32be(ofs.toInt)
        if (sz32 == 0L) {
          // box extends to end of file: declares exactly the remaining bytes
          total += b.length - ofs
          ofs = b.length
        } else if (sz32 == 1L) {
          // 64-bit largesize follows the 4-byte type; header is 16 bytes
          if (ofs + 16 > b.length) return null
          val sz = u64be(ofs.toInt + 8)
          if (sz < 16) return null
          total += sz
          ofs += sz
        } else if (sz32 < 8) return null
        else {
          total += sz32
          ofs += sz32
        }
      }
      java.lang.Long.valueOf(total)
    } else null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("declaredSize", this, classOf[DeclaredSizeExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Long r = $ref.compute($c);
      if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = r.longValue(); }""")
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[Array[Byte]])

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object MediaExpressions {
  /** Byte-fold checksum of a binary column (see [[ByteFoldChecksumExpr]]). */
  def byteFoldChecksum(payload: Column): Column =
    GraftColumnShim.column(ByteFoldChecksumExpr(GraftColumnShim.expression(payload)))

  /** 60-bit blockhash perceptual sketch (see [[BlockHash60Expr]]). */
  def blockHash60(payload: Column): Column =
    GraftColumnShim.column(BlockHash60Expr(GraftColumnShim.expression(payload)))

  /** Container-declared total size of a binary column (see
    * [[DeclaredSizeExpr]]); NULL when the format declares none. */
  def declaredSize(payload: Column): Column =
    GraftColumnShim.column(DeclaredSizeExpr(GraftColumnShim.expression(payload)))
}
