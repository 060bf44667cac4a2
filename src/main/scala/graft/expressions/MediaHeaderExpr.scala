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
  *  - MP4 (ISO-BMFF): big-endian (size, type) box walk from the `ftyp`
  *    box; `moov/mvhd` gives timescale + duration (v0 u32 / v1 u64
  *    fields, duration_ms = duration·1000/timescale exact integer) and
  *    the first `moov/trak/tkhd` with nonzero dimensions gives
  *    width/height (16.16 fixed point → integer part)
  *    (ISO/IEC 14496-12 §8.2.2, §8.3.2).
  *  - GIF: 'GIF87a'/'GIF89a' signature, little-endian u16
  *    logical-screen width/height at 6/8 (GIF89a spec §17-18).
  *  - BMP: 'BM' file header + BITMAPINFOHEADER — signed little-endian
  *    i32 dimensions (|height|: negative means top-down), u16
  *    bits-per-pixel reported as whole channels (24 bpp → 3).
  *  - TIFF: 'II'/'MM' byte-order mark + magic 42 + IFD0 entry walk for
  *    tags 256/257/277 (width/height/samples-per-pixel) — endianness is
  *    DATA in TIFF, so both orders are parsed (TIFF 6.0 §2).
  *  - MP3: optional ID3v2 tag (syncsafe u28 size) skipped, then the
  *    MPEG-1 Layer III frame header — bitrate/sample-rate table
  *    lookups, mono vs 2-channel mode, CBR duration estimate
  *    audio_bytes·8/kbps (ISO/IEC 11172-3 §2.4.1.3).
  *  - FLAC: 'fLaC' magic + the mandatory STREAMINFO metadata block —
  *    sample rate / channels / total samples from its packed 64 bits;
  *    duration_ms = samples·1000/rate (xiph FLAC format spec).
  *  - OGG (Vorbis): 'OggS' page capture, Vorbis identification header
  *    in the first packet (channels, sample rate), duration from the
  *    LAST page's granule position (total PCM samples; RFC 3533 +
  *    Vorbis I spec §4.2.2).
  *  - WebP: RIFF container with the 'WEBP' form type — dimensions from
  *    the first chunk's bitstream header: 'VP8 ' lossy (14-bit le
  *    dims after the 9D 01 2A start code), 'VP8L' lossless (packed
  *    u32: width−1 / height−1 / alpha), or 'VP8X' extended (24-bit le
  *    canvas dims, alpha flag bit); channels 3 + alpha.
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
  private def le64(b: Array[Byte], i: Int): Long =
    le32(b, i) | (le32(b, i + 4) << 32)
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
    // ISO-BMFF (MP4/MOV): big-endian (size, type) box walk — the file
    // starts with an `ftyp` box; `moov/mvhd` carries timescale +
    // duration and `moov/trak/tkhd` carries 16.16 fixed-point track
    // width/height (ISO/IEC 14496-12 §8.2.2, §8.3.2 — same public-spec
    // arithmetic as the WAV chunk walk, big-endian). Audio-only files
    // have no video trak → width/height NULL; a file without a sound
    // mvhd degrades to unknown.
    if (b.length >= 12 && ascii(b, 4, "ftyp")) {
      var ts = -1L; var dur = -1L; var w = -1; var h = -1
      def be64(i: Int): Long = (be32(b, i) << 32) | be32(b, i + 4)
      // children of [start, end): depth 0 = file, 1 = moov, 2 = trak.
      // Any malformed size (smaller than its header, or past the
      // enclosing box) ends that level's walk — captured values stand.
      def walk(start: Int, end: Int, depth: Int): Unit = {
        var i = start
        while (i + 8 <= end) {
          val size32 = be32(b, i)
          var hdr = 8
          var size = size32
          if (size32 == 1L) { // 64-bit largesize
            if (i + 16 > end) return
            size = be64(i + 8); hdr = 16
          } else if (size32 == 0L) size = (end - i).toLong // box-to-EOF
          if (size < hdr || size > end - i) return
          val cEnd = i + size.toInt
          if (depth == 0 && ascii(b, i + 4, "moov")) walk(i + hdr, cEnd, 1)
          else if (depth == 1 && ascii(b, i + 4, "trak")) walk(i + hdr, cEnd, 2)
          else if (depth == 1 && ascii(b, i + 4, "mvhd") && i + hdr < cEnd) {
            val v = b(i + hdr) & 0xff
            if (v == 0 && i + hdr + 20 <= cEnd) {
              ts = be32(b, i + hdr + 12); dur = be32(b, i + hdr + 16)
            } else if (v == 1 && i + hdr + 32 <= cEnd) {
              ts = be32(b, i + hdr + 20); dur = be64(i + hdr + 24)
            }
          } else if (depth == 2 && ascii(b, i + 4, "tkhd") && i + hdr < cEnd) {
            val v = b(i + hdr) & 0xff
            val off = if (v == 1) 88 else 76 // v1 widens 3 time fields
            if (w <= 0 && h <= 0 && i + hdr + off + 8 <= cEnd) {
              val fw = (be32(b, i + hdr + off) >>> 16).toInt  // 16.16 → int part
              val fh = (be32(b, i + hdr + off + 4) >>> 16).toInt
              if (fw > 0 && fh > 0) { w = fw; h = fh }
            }
          }
          i = cEnd
        }
      }
      walk(0, b.length, 0)
      if (ts > 0 && dur >= 0)
        return InternalRow(UTF8String.fromString("mp4"),
          if (w > 0) w else null, if (h > 0) h else null,
          null, null, dur * 1000L / ts)
      return unknown
    }
    // GIF: 'GIF87a'/'GIF89a' signature, logical-screen width/height as
    // little-endian u16 at offsets 6/8 (GIF89a spec §17-18).
    if (b.length >= 10 && ascii(b, 0, "GIF8") &&
        (b(4) == '7'.toByte || b(4) == '9'.toByte) && b(5) == 'a'.toByte) {
      val w = le16(b, 6); val h = le16(b, 8)
      if (w > 0 && h > 0)
        return InternalRow(UTF8String.fromString("gif"), w, h, null, null, null)
      return unknown
    }
    // BMP: 'BM' file header (14 B), then BITMAPINFOHEADER (size ≥ 40):
    // signed little-endian i32 width/height at 18/22 (negative height =
    // top-down row order), u16 bits-per-pixel at 28; whole sample bytes
    // report as channels (8→1, 24→3, 32→4).
    if (b.length >= 30 && ascii(b, 0, "BM") && le32(b, 14) >= 40) {
      val w = le32(b, 18).toInt
      val h = math.abs(le32(b, 22).toInt)
      val bpp = le16(b, 28)
      if (w > 0 && h > 0)
        return InternalRow(UTF8String.fromString("bmp"), w, h,
          if (bpp > 0 && bpp % 8 == 0 && bpp <= 32) bpp / 8 else null,
          null, null)
      return unknown
    }
    // TIFF: 'II' (little-endian) / 'MM' (big-endian) byte-order mark +
    // u16 magic 42 + u32 offset to IFD0; an IFD is a u16 entry count
    // then 12-byte entries (tag u16, type u16, count u32, value u32) —
    // the value is INLINED for count-1 SHORT/LONG, a SHORT occupying
    // the first two value bytes in the file's byte order. Tags: 256
    // ImageWidth, 257 ImageLength, 277 SamplesPerPixel (TIFF 6.0 §2) —
    // the one mainstream raster format whose endianness is data, not
    // spec, so both orders are exercised.
    if (b.length >= 8 && ((b(0) == 'I'.toByte && b(1) == 'I'.toByte) ||
        (b(0) == 'M'.toByte && b(1) == 'M'.toByte))) {
      val little = b(0) == 'I'.toByte
      def u16(i: Int): Int = if (little) le16(b, i) else be16(b, i)
      def u32(i: Int): Long = if (little) le32(b, i) else be32(b, i)
      if (u16(2) != 42) return unknown
      val ifd = u32(4)
      if (ifd >= 8 && ifd + 2 <= b.length) {
        val base = ifd.toInt
        val n = u16(base)
        var w = -1L; var h = -1L; var spp = -1L
        var j = 0
        while (j < n && base + 2 + 12 * (j + 1) <= b.length) {
          val e = base + 2 + 12 * j
          val tag = u16(e); val typ = u16(e + 2); val cnt = u32(e + 4)
          val v: Long =
            if (cnt == 1L && typ == 3) u16(e + 8).toLong
            else if (cnt == 1L && typ == 4) u32(e + 8)
            else -1L
          if (v >= 0) tag match {
            case 256 => w = v
            case 257 => h = v
            case 277 => spp = v
            case _ => ()
          }
          j += 1
        }
        if (w > 0 && h > 0 && w <= Int.MaxValue && h <= Int.MaxValue)
          return InternalRow(UTF8String.fromString("tiff"),
            w.toInt, h.toInt,
            if (spp > 0 && spp <= 16) spp.toInt else null, null, null)
      }
      return unknown
    }
    // MP3: optional ID3v2 tag ('ID3', 2B version, 1B flags, u28
    // SYNCSAFE size — 7 bits per byte so tag bytes can never fake a
    // frame sync), then the MPEG audio frame sync (11 set bits).
    // MPEG-1 Layer III header fields: bitrate index → kbps table,
    // sample-rate index → {44100, 48000, 32000}, channel mode 3 =
    // mono (ISO/IEC 11172-3 §2.4.1.3). MP3 carries no container
    // duration — the CBR estimate audio_bytes·8 / bitrate_kbps ms is
    // what every tag-less player shows, exact integer division here.
    if ((b.length >= 10 && ascii(b, 0, "ID3")) ||
        (b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xe0) == 0xe0)) {
      var i = 0
      if (ascii(b, 0, "ID3")) {
        val sz = ((b(6) & 0x7f) << 21) | ((b(7) & 0x7f) << 14) |
          ((b(8) & 0x7f) << 7) | (b(9) & 0x7f)
        i = 10 + sz
      }
      if (i + 4 <= b.length && (b(i) & 0xff) == 0xff &&
          (b(i + 1) & 0xe0) == 0xe0) {
        val version = (b(i + 1) >> 3) & 0x3 // 3 = MPEG-1
        val layer = (b(i + 1) >> 1) & 0x3   // 1 = Layer III
        if (version == 3 && layer == 1) {
          val brIdx = (b(i + 2) >> 4) & 0xf
          val srIdx = (b(i + 2) >> 2) & 0x3
          val mode = (b(i + 3) >> 6) & 0x3
          if (brIdx >= 1 && brIdx <= 14 && srIdx <= 2) {
            val kbps = MediaHeaderExpr.Mp3BitratesV1L3(brIdx)
            val audioBytes = (b.length - i).toLong
            return InternalRow(UTF8String.fromString("mp3"), null, null,
              if (mode == 3) 1 else 2,
              MediaHeaderExpr.Mp3SampleRatesV1(srIdx),
              audioBytes * 8L / kbps)
          }
        }
      }
      return unknown
    }
    // FLAC: 'fLaC' magic, then metadata blocks (1 B last-flag+type, u24
    // big-endian length); STREAMINFO (type 0, 34 B) is MANDATORY first.
    // Its packed 64 bits from data byte 10: sample rate (20), channels−1
    // (3), bits-per-sample−1 (5), total samples (36) — duration_ms =
    // samples·1000/rate exact integer (xiph FLAC format spec §STREAMINFO).
    if (b.length >= 8 + 34 && ascii(b, 0, "fLaC") && (b(4) & 0x7f) == 0 &&
        (((b(5) & 0xff) << 16) | ((b(6) & 0xff) << 8) | (b(7) & 0xff)) >= 34) {
      val s = 8 // STREAMINFO data (4 magic + 4 block header)
      val rate = ((b(s + 10) & 0xff) << 12) | ((b(s + 11) & 0xff) << 4) |
        ((b(s + 12) & 0xff) >> 4)
      val channels = ((b(s + 12) >> 1) & 0x7) + 1
      val totalSamples = ((b(s + 13) & 0x0fL) << 32) | be32(b, s + 14)
      if (rate > 0)
        return InternalRow(UTF8String.fromString("flac"), null, null,
          channels, rate, totalSamples * 1000L / rate)
      return unknown
    }
    // OGG: 'OggS' page capture (version 0); the codec rides the first
    // packet — a Vorbis identification header (packet type 1 +
    // 'vorbis') carries channels (u8 at +11) and sample rate (u32le at
    // +12). Duration comes from the LAST page's granule position (for
    // Vorbis: total PCM samples) — a bounded backward scan for the
    // final capture pattern (RFC 3533 §6; Vorbis I spec §4.2.2). A
    // granule-less (headers-only) stream reports NULL duration.
    if (b.length >= 28 && ascii(b, 0, "OggS") && b(4) == 0) {
      val nsegs = b(26) & 0xff
      val p = 27 + nsegs
      if (p + 16 <= b.length && b(p) == 1 && ascii(b, p + 1, "vorbis")) {
        val channels = b(p + 11) & 0xff
        val rate = le32(b, p + 12)
        // Candidate pages must also pass the header-shape checks (only
        // the low 3 header-type bits are defined, and the lacing table
        // must fit) — payload bytes can contain the capture pattern
        // (RFC 3533 mandates CRC for certainty; this is the cheap
        // structural subset, and a still-implausible granule degrades
        // to NULL duration rather than garbage).
        var i = b.length - 27
        var granule = -1L
        while (i >= 0 && granule < 0) {
          if (ascii(b, i, "OggS") && b(i + 4) == 0 &&
              (b(i + 5) & 0xf8) == 0 && i + 27 + (b(i + 26) & 0xff) <= b.length)
            granule = le64(b, i + 6)
          i -= 1
        }
        if (channels > 0 && rate > 0 && rate <= Int.MaxValue)
          return InternalRow(UTF8String.fromString("ogg"), null, null,
            channels, rate.toInt,
            // granule is total PCM samples: cap at 2^53 (a quarter-
            // million YEARS at 48 kHz) so a false-sync garbage value
            // can neither overflow the *1000 nor report as real
            if (granule > 0 && granule < (1L << 53))
              granule * 1000L / rate
            else null)
      }
      return unknown
    }
    // WebP: RIFF container with the 'WEBP' form type; the first chunk
    // is the bitstream — 'VP8 ' (lossy: 3-byte frame tag, 9D 01 2A
    // start code, 14-bit le dimensions), 'VP8L' (lossless: 0x2F
    // signature then a packed le u32 of width−1 (14) / height−1 (14) /
    // alpha (1)), or 'VP8X' (extended: flag byte — bit 4 = alpha —
    // then 24-bit le canvas width−1 / height−1). Lossy VP8 is YUV → 3
    // channels; the alpha bit adds the 4th (WebP container spec +
    // RFC 6386 §9.1; VP8L from the public lossless bitstream spec).
    if (b.length >= 20 && ascii(b, 0, "RIFF") && ascii(b, 8, "WEBP")) {
      val d = 20 // first chunk's data (12 RIFF/form + 4 fourcc + 4 size)
      if (ascii(b, 12, "VP8 ") && d + 10 <= b.length &&
          (b(d + 3) & 0xff) == 0x9d && (b(d + 4) & 0xff) == 0x01 &&
          (b(d + 5) & 0xff) == 0x2a) {
        val w = le16(b, d + 6) & 0x3fff; val h = le16(b, d + 8) & 0x3fff
        if (w > 0 && h > 0)
          return InternalRow(UTF8String.fromString("webp"), w, h, 3, null, null)
      } else if (ascii(b, 12, "VP8L") && d + 5 <= b.length &&
          (b(d) & 0xff) == 0x2f) {
        val bits = le32(b, d + 1)
        val w = (bits & 0x3fff).toInt + 1
        val h = ((bits >> 14) & 0x3fff).toInt + 1
        val alpha = ((bits >> 28) & 1L).toInt
        return InternalRow(UTF8String.fromString("webp"), w, h,
          3 + alpha, null, null)
      } else if (ascii(b, 12, "VP8X") && d + 10 <= b.length) {
        def le24(i: Int): Int = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
          ((b(i + 2) & 0xff) << 16)
        val w = le24(d + 4) + 1; val h = le24(d + 7) + 1
        val alpha = if ((b(d) & 0x10) != 0) 1 else 0
        return InternalRow(UTF8String.fromString("webp"), w, h,
          3 + alpha, null, null)
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
  /** MPEG-1 Layer III bitrate table, kbps, indexed by the 4-bit header
    * field (0 = free, 15 = bad — both rejected). ISO/IEC 11172-3. */
  private[expressions] val Mp3BitratesV1L3: Array[Int] =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  /** MPEG-1 sample rates by the 2-bit header field (3 = reserved). */
  private[expressions] val Mp3SampleRatesV1: Array[Int] =
    Array(44100, 48000, 32000)

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
