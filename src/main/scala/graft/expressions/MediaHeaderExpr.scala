package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnShim
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** REAL media-header decode as a native per-row expression: parses the
  * container headers of the three ubiquitous formats directly from the
  * `binary` payload — pure public-spec byte arithmetic, no codec library
  * — replacing the checksum stand-in for the metadata half of the decode
  * path (pixel/sample decode still needs a real codec and stays behind
  * the batched seam, [[graft.ops.Multimodal.extractFeaturesBatched]]).
  *
  *  - PNG: 8-byte signature, then the IHDR chunk fixed at offset 8 —
  *    width/height are the two big-endian u32 at offsets 16/20
  *    (PNG spec §5.2, §11.2.2).
  *  - JPEG: marker scan from SOI (FFD8) over FF-prefixed segments, each
  *    with a big-endian u16 length, until a start-of-frame marker
  *    (SOF0/1/2 — baseline/extended/progressive, FFC0-FFC2); the frame
  *    header holds height/width as big-endian u16 at +5/+7
  *    (ITU T.81 §B.2.2).
  *  - WAV: RIFF/WAVE container, little-endian chunk walk; the `fmt `
  *    chunk carries channels (u16 at +2), sample rate (u32 at +4) and
  *    byte rate (u32 at +8); the declared `data` chunk size over the
  *    byte rate gives the duration (exact integer ms —
  *    `data_bytes * 1000 / byte_rate`).
  *
  * Output struct: (format, width, height, channels, sample_rate,
  * duration_ms) — fields not defined by a format are NULL, and any
  * truncated/malformed payload degrades to format='unknown' with all
  * NULLs (never an exception: a 100 TB media crawl always contains
  * garbage bytes). Runs inside whole-stage codegen at scan parallelism;
  * only header bytes are inspected, but note the payload column itself
  * is still read — at scale, persist extracted metadata once
  * ([[graft.ops.Multimodal.decodeHeaders]]) rather than re-parsing. */
case class MediaHeaderExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = MediaHeaderExpr.schema

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
  private def ascii(b: Array[Byte], i: Int, s: String): Boolean =
    i + s.length <= b.length && s.indices.forall(j => b(i + j) == s.charAt(j).toByte)

  private val unknown = InternalRow(UTF8String.fromString("unknown"),
    null, null, null, null, null)

  def compute(b: Array[Byte]): InternalRow = {
    // PNG signature: 89 'P' 'N' 'G' 0D 0A 1A 0A, IHDR data at 16.
    if (b.length >= 24 && (b(0) & 0xff) == 0x89 && ascii(b, 1, "PNG") &&
        ascii(b, 12, "IHDR")) {
      val w = be32(b, 16); val h = be32(b, 20)
      if (w > 0 && h > 0 && w <= Int.MaxValue && h <= Int.MaxValue)
        return InternalRow(UTF8String.fromString("png"),
          w.toInt, h.toInt, null, null, null)
      return unknown
    }
    // JPEG: SOI then FF-marker segment walk to SOF0/1/2.
    if (b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
      var i = 2
      while (i + 3 < b.length && (b(i) & 0xff) == 0xff) {
        val marker = b(i + 1) & 0xff
        if (marker == 0xc0 || marker == 0xc1 || marker == 0xc2) {
          if (i + 8 < b.length) {
            val h = be16(b, i + 5); val w = be16(b, i + 7)
            if (w > 0 && h > 0)
              return InternalRow(UTF8String.fromString("jpeg"),
                w, h, null, null, null)
          }
          return unknown
        } else if (marker == 0xd8 || marker == 0x01 ||
            (marker >= 0xd0 && marker <= 0xd7)) {
          i += 2 // standalone marker, no length field
        } else if (marker == 0xff) {
          i += 1 // fill byte
        } else {
          if (i + 3 >= b.length) return unknown
          val segLen = be16(b, i + 2)
          if (segLen < 2) return unknown
          i += 2 + segLen
        }
      }
      return unknown
    }
    // WAV: RIFF....WAVE, then little-endian chunk walk.
    if (b.length >= 12 && ascii(b, 0, "RIFF") && ascii(b, 8, "WAVE")) {
      var i = 12
      var channels = -1; var sampleRate = -1L; var byteRate = -1L
      var dataBytes = -1L
      while (i + 8 <= b.length) {
        val size = le32(b, i + 4)
        if (ascii(b, i, "fmt ") && i + 8 + 16 <= b.length) {
          channels = le16(b, i + 10)
          sampleRate = le32(b, i + 12)
          byteRate = le32(b, i + 16)
        } else if (ascii(b, i, "data")) {
          dataBytes = size
        }
        // chunks are word-aligned: odd sizes carry one pad byte. A
        // declared size past the payload's end (truncated file, or a
        // fixture that declares more samples than it ships) ends the
        // walk — values captured so far stand, and the Int arithmetic
        // can never overflow into a negative index.
        if (size > b.length - i - 8L) i = b.length
        else i += 8 + size.toInt + (size % 2).toInt
      }
      if (channels > 0 && sampleRate > 0 && byteRate > 0 && dataBytes >= 0)
        return InternalRow(UTF8String.fromString("wav"),
          null, null, channels, sampleRate.toInt,
          dataBytes * 1000L / byteRate)
      return unknown
    }
    unknown
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("mediaHeader", this, classOf[MediaHeaderExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[Array[Byte]])

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object MediaHeaderExpr {
  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("channels", IntegerType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  /** Parse a binary payload's media container header (see
    * [[MediaHeaderExpr]]). */
  def mediaHeader(payload: Column): Column =
    GraftColumnShim.column(MediaHeaderExpr(GraftColumnShim.expression(payload)))
}
