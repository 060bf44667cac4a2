package graft.expressions

import org.apache.spark.sql.{Column, GraftColumnShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** EXIF metadata from a JPEG payload's APP1 segment: the provenance
  * fields a media-curation pipeline keys on — orientation (the rotation
  * a correct thumbnail/resize MUST honor), camera make/model (device
  * stratification, synthetic-image screens), and the capture timestamp
  * (temporal dedup/cohorts).
  *
  * Walk (public specs — JPEG/JFIF marker structure + EXIF 2.x = a TIFF
  * 6.0 IFD embedded at the APP1 'Exif\0\0' payload):
  *   SOI → FF-marker segment walk → APP1 with the Exif signature →
  *   embedded TIFF header (II/MM byte-order mark — endianness is DATA,
  *   both orders parsed, exactly like [[MediaHeaderExpr]]'s TIFF branch)
  *   → IFD0 entry scan for tags 0x010F Make (ASCII), 0x0110 Model
  *   (ASCII), 0x0112 Orientation (SHORT), 0x0132 DateTime (ASCII).
  *   ASCII values ≤ 4 bytes are inlined in the entry, longer ones sit
  *   at a TIFF-relative offset — both paths bounds-checked.
  *
  * Output struct: (orientation, make, model, taken_at); any missing
  * tag is NULL, and a non-JPEG / EXIF-less / truncated payload
  * degrades to the all-NULL row (never an exception — crawl corpora
  * always contain garbage bytes). Per-row codegen at scan parallelism. */
case class ExifMetaExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ExifMetaExpr.schema

  override protected def nullSafeEval(input: Any): Any =
    ExifMetaExpr.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.ExifMetaExpr.compute($c);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)

  override def toString: String = s"exif_meta($child)"
}

object ExifMetaExpr {

  val schema: StructType = StructType(Seq(
    StructField("orientation", IntegerType),
    StructField("make", StringType),
    StructField("model", StringType),
    StructField("taken_at", StringType)))

  private val empty = InternalRow(null, null, null, null)

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
  private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
  private def ascii(b: Array[Byte], i: Int, s: String): Boolean =
    i + s.length <= b.length && s.indices.forall(j => b(i + j) == s.charAt(j).toByte)

  def compute(b: Array[Byte]): InternalRow = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8)
      return empty
    var i = 2
    while (i + 3 < b.length && (b(i) & 0xff) == 0xff) {
      val marker = b(i + 1) & 0xff
      if (marker == 0xd8 || marker == 0x01 ||
          (marker >= 0xd0 && marker <= 0xd7)) {
        i += 2
      } else if (marker == 0xff) {
        i += 1
      } else {
        val segLen = be16(b, i + 2)
        if (segLen < 2 || i + 2 + segLen > b.length) return empty
        if (marker == 0xe1 && segLen >= 10 && ascii(b, i + 4, "Exif") &&
            b(i + 8) == 0 && b(i + 9) == 0)
          return parseTiff(b, i + 10, i + 2 + segLen)
        if (marker == 0xda) return empty // entropy-coded data: stop
        i += 2 + segLen
      }
    }
    empty
  }

  /** Parse the embedded TIFF block at `t0` (exclusive end `end`). */
  private def parseTiff(b: Array[Byte], t0: Int, end: Int): InternalRow = {
    if (t0 + 8 > end) return empty
    val little =
      if (b(t0) == 'I' && b(t0 + 1) == 'I') true
      else if (b(t0) == 'M' && b(t0 + 1) == 'M') false
      else return empty
    def u16(i: Int): Int = if (little) le16(b, i) else be16(b, i)
    def u32(i: Int): Long = if (little) le32(b, i) else be32(b, i)
    if (u16(t0 + 2) != 42) return empty
    val ifd = t0 + u32(t0 + 4)
    if (ifd < t0 || ifd + 2 > end) return empty
    val n = u16(ifd.toInt)
    var orientation: Any = null
    var make: Any = null
    var model: Any = null
    var takenAt: Any = null
    // ASCII value: count includes the NUL; ≤4 bytes inline, else offset
    def asciiVal(e: Int): Any = {
      val cnt = u32(e + 4)
      if (cnt < 1 || cnt > 4096) return null
      // bounds-check in LONG: a crafted 32-bit offset near 2^32 would
      // wrap Int and alias back into [t0, end), passing the check and
      // returning garbage bytes instead of NULL — narrow only after
      val at: Long = if (cnt <= 4) (e + 8).toLong else t0.toLong + u32(e + 8)
      if (at < t0 || at + cnt > end) return null
      UTF8String.fromBytes(b, at.toInt, (cnt - 1).toInt) // strip trailing NUL
    }
    var k = 0
    while (k < n) {
      val e = ifd.toInt + 2 + k * 12
      if (e + 12 > end) return InternalRow(orientation, make, model, takenAt)
      val tag = u16(e)
      val typ = u16(e + 2)
      tag match {
        case 0x0112 if typ == 3 && u32(e + 4) == 1L => orientation = u16(e + 8)
        case 0x010f if typ == 2 => make = asciiVal(e)
        case 0x0110 if typ == 2 => model = asciiVal(e)
        case 0x0132 if typ == 2 => takenAt = asciiVal(e)
        case _ => ()
      }
      k += 1
    }
    InternalRow(orientation, make, model, takenAt)
  }

  /** Column wrapper. */
  def exifMeta(payload: Column): Column =
    GraftColumnShim.column(ExifMetaExpr(GraftColumnShim.expression(payload)))
}
