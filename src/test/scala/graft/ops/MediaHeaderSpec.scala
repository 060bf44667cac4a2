package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** The real header parser against hand-built and adversarial payloads. */
class MediaHeaderSpec extends SparkSpec {
  import spark.implicits._

  private def decodeOne(bytes: Array[Byte]): Row =
    Multimodal.decodeHeaders(
      Seq((1L, "x", bytes)).toDF("media_id", "kind", "payload"))
      .select("format", "width", "height", "channels", "sample_rate", "duration_ms")
      .head()

  test("fixture payloads round-trip: built dimensions == parsed dimensions") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val got = Multimodal.decodeHeaders(
      Multimodal.mediaWithRealHeaders(docs, "doc_id", "text"))
    assert(got.where(col("format") === "unknown").count() == 0)
    val bad = got.where(
      (col("media_id") % 4 === 0 &&
        (col("format") =!= "png" ||
          col("width") =!= (col("media_id") % 1920 + 1).cast("int") ||
          col("height") =!= (col("media_id") % 1080 + 1).cast("int"))) ||
      (col("media_id") % 4 === 1 &&
        (col("format") =!= "jpeg" ||
          col("width") =!= (col("media_id") % 3840 + 1).cast("int") ||
          col("height") =!= (col("media_id") % 2160 + 1).cast("int"))) ||
      (col("media_id") % 4 === 2 &&
        (col("format") =!= "wav" ||
          col("channels") =!= (expr("media_id div 4") % 2 + 1).cast("int") ||
          col("sample_rate") =!= (lit(8000) * (expr("media_id div 4") % 4 + 1)).cast("int"))) ||
      (col("media_id") % 4 === 3 &&
        (col("format") =!= "mp4" ||
          col("width") =!= (col("media_id") % 1280 + 16).cast("int") ||
          col("height") =!= (col("media_id") % 720 + 16).cast("int"))))
    assert(bad.count() == 0)
  }

  test("MP4 box walk: v0/v1 fields, audio-only traks, and malformed boxes degrade safely") {
    import Multimodal.buildHeaderPayload
    // Fixture round-trip incl. exact duration: id 7 → ts 600·((7/4)%3+1)=1200,
    // dur = (7%50+1)·1200 + (7%7)·37 = 9600 → 8000 ms.
    val r = decodeOne(buildHeaderPayload(7L, "body".getBytes))
    assert(r.getString(0) == "mp4" && r.getInt(1) == (7 % 1280 + 16) &&
      r.getInt(2) == (7 % 720 + 16) && r.getLong(5) == 8000L)
    assert(r.isNullAt(3) && r.isNullAt(4)) // channels/sample_rate undefined
    // ftyp alone (no moov) → unknown, never a throw.
    val ftypOnly = Array[Byte](0, 0, 0, 16) ++ "ftypisom".getBytes ++ Array[Byte](0, 0, 0, 0)
    assert(decodeOne(ftypOnly).getString(0) == "unknown")
    // moov whose mvhd is truncated mid-field → unknown.
    val truncated = buildHeaderPayload(7L, Array.empty[Byte]).take(40)
    assert(decodeOne(truncated).getString(0) == "unknown")
    // Box with a size smaller than its header ends the walk; captured
    // mvhd values stand (audio-only: no tkhd → null dimensions).
    val full = buildHeaderPayload(7L, Array.empty[Byte])
    val noTrak = full.take(16) ++ // ftyp
      Array[Byte](0, 0, 0, 116) ++ "moov".getBytes ++ full.slice(24, 132) ++ // moov w/ mvhd only
      Array[Byte](0, 0, 0, 2) ++ "junk".getBytes // size 2 < header → stop
    val a = decodeOne(noTrak)
    assert(a.getString(0) == "mp4" && a.isNullAt(1) && a.isNullAt(2) &&
      a.getLong(5) == 8000L)
  }

  test("MP3: ID3 syncsafe skip, table lookups, CBR duration; malformed degrades") {
    import Multimodal.buildMp3Payload
    // id 9: brIdx = 9%14+1 = 10 → 160 kbps; srIdx = (9/2)%3 = 1 → 48000;
    // mode = 9%4 = 1 → 2 channels; tagLen = 9; audio = body(4) + 4 B.
    val r = decodeOne(buildMp3Payload(9L, "body".getBytes))
    assert(r.getString(0) == "mp3" && r.isNullAt(1) && r.isNullAt(2))
    assert(r.getInt(3) == 2 && r.getInt(4) == 48000)
    assert(r.getLong(5) == 8L * 8 / 160)
    // id 3: mode 3 → mono.
    assert(decodeOne(buildMp3Payload(3L, "x".getBytes)).getInt(3) == 1)
    // Raw frame sync with no ID3 tag parses too.
    val raw = Array(0xff.toByte, 0xfb.toByte, ((1 << 4) | (0 << 2)).toByte,
      0.toByte) ++ Array.fill(96)('a'.toByte)
    val rr = decodeOne(raw)
    assert(rr.getString(0) == "mp3" && rr.getInt(4) == 44100 &&
      rr.getLong(5) == 100L * 8 / 32)
    // ID3 whose syncsafe size points past the payload → unknown, no throw.
    val overrun = "ID3".getBytes ++ Array[Byte](3, 0, 0, 0, 0, 0x7f, 0x7f)
    assert(decodeOne(overrun).getString(0) == "unknown")
    // Free-format (0) and bad (15) bitrate indexes are rejected.
    assert(decodeOne(Array(0xff.toByte, 0xfb.toByte, 0x00.toByte, 0.toByte))
      .getString(0) == "unknown")
    assert(decodeOne(Array(0xff.toByte, 0xfb.toByte, 0xf0.toByte, 0.toByte))
      .getString(0) == "unknown")
    // MPEG-2 version bits (sync 0xFF 0xF3) are not the V1 table → unknown.
    assert(decodeOne(Array(0xff.toByte, 0xf3.toByte, 0x40.toByte, 0.toByte))
      .getString(0) == "unknown")
  }

  test("FLAC/OGG: packed STREAMINFO bits, EOS granule duration; malformed degrades") {
    import Multimodal.buildFlacOggPayload
    // FLAC id 4: rate 8000·((4/2)%6+1)=24000, ch (4/2)%2+1=1,
    // samples (4%100+1)·1000=5000 → 5000·1000/24000 = 208 ms
    val f = decodeOne(buildFlacOggPayload(4L, "body".getBytes))
    assert(f.getString(0) == "flac" && f.getInt(3) == 1 &&
      f.getInt(4) == 24000 && f.getLong(5) == 5000L * 1000 / 24000)
    assert(f.isNullAt(1) && f.isNullAt(2))
    // OGG id 5: ch (5/2)%2+1=1, rate 11025·((5/2)%4+1)=33075,
    // samples (5%50+1)·2000=12000 → 362 ms; long body exercises lacing
    val o = decodeOne(buildFlacOggPayload(5L, ("y" * 700).getBytes))
    assert(o.getString(0) == "ogg" && o.getInt(3) == 1 &&
      o.getInt(4) == 33075 && o.getLong(5) == 12000L * 1000 / 33075)
    // fLaC magic but truncated STREAMINFO → unknown, never a throw
    assert(decodeOne("fLaC".getBytes).getString(0) == "unknown")
    // OggS page whose first packet is not a Vorbis ident → unknown
    val page = buildFlacOggPayload(5L, "z".getBytes)
    page(28) = 0x55 // corrupt the packet-type byte
    assert(decodeOne(page).getString(0) == "unknown")
    // headers-only stream (BOS page alone): no positive granule → null
    // duration, identity fields still parsed
    val full = buildFlacOggPayload(5L, "z".getBytes)
    val bos = full.take(58)
    val h = decodeOne(bos)
    assert(h.getString(0) == "ogg" && h.getInt(4) == 33075 && h.isNullAt(5))
  }

  test("WebP: VP8 lossy, VP8L packed bits, VP8X canvas + alpha; malformed degrades") {
    import Multimodal.buildWebpPayload
    // id 6 ≡ 0 (mod 3): lossy — w 6%3000+1=7, h 6%1700+1=7, channels 3
    val v = decodeOne(buildWebpPayload(6L, "body".getBytes))
    assert(v.getString(0) == "webp" && v.getInt(1) == 7 && v.getInt(2) == 7 &&
      v.getInt(3) == 3 && v.isNullAt(4) && v.isNullAt(5))
    // id 7 ≡ 1: VP8L — w 8, h 8, alpha (7/3)%2=0 → 3 channels
    val l = decodeOne(buildWebpPayload(7L, "b".getBytes))
    assert(l.getString(0) == "webp" && l.getInt(1) == 8 && l.getInt(2) == 8 &&
      l.getInt(3) == 3)
    // id 10 ≡ 1: VP8L with alpha (10/3)%2=1 → 4 channels
    assert(decodeOne(buildWebpPayload(10L, "b".getBytes)).getInt(3) == 4)
    // id 11 ≡ 2: VP8X — w 12, h 12, alpha (11/3)%2=1 → 4 channels
    val x = decodeOne(buildWebpPayload(11L, "b".getBytes))
    assert(x.getString(0) == "webp" && x.getInt(1) == 12 && x.getInt(2) == 12 &&
      x.getInt(3) == 4)
    // lossy chunk without the 9D 01 2A start code → unknown, no throw
    val bad = buildWebpPayload(6L, "body".getBytes)
    bad(23) = 0x00 // corrupt the start code's first byte
    assert(decodeOne(bad).getString(0) == "unknown")
    // RIFF/WEBP but an unrecognized bitstream fourcc → unknown
    val alien = "RIFF".getBytes ++ Array[Byte](12, 0, 0, 0) ++ "WEBP".getBytes ++
      "ANMF".getBytes ++ Array[Byte](0, 0, 0, 0)
    assert(decodeOne(alien).getString(0) == "unknown")
    // truncated right after the form type → unknown, never a throw
    assert(decodeOne(buildWebpPayload(6L, "body".getBytes).take(12))
      .getString(0) == "unknown")
  }

  test("garbage, empty, and truncated payloads degrade to unknown — never throw") {
    assert(decodeOne(Array.empty[Byte]).getString(0) == "unknown")
    assert(decodeOne("just some text".getBytes).getString(0) == "unknown")
    // PNG signature but truncated before IHDR data
    val pngSig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    assert(decodeOne(pngSig).getString(0) == "unknown")
    // JPEG SOI but no SOF anywhere
    assert(decodeOne(Array(0xff, 0xd8, 0xff, 0xd9).map(_.toByte)).getString(0) == "unknown")
    // RIFF/WAVE with a data chunk but no fmt chunk
    val noFmt = "RIFF".getBytes ++ Array[Byte](8, 0, 0, 0) ++ "WAVE".getBytes ++
      "data".getBytes ++ Array[Byte](0, 0, 0, 0)
    assert(decodeOne(noFmt).getString(0) == "unknown")
    // WAV declaring a data size far past the payload end (truncated file):
    // walk must terminate and still report the fmt metadata it saw.
    val truncated = Multimodal.buildHeaderPayload(2L, Array.empty[Byte])
    val r = decodeOne(truncated)
    assert(r.getString(0) == "wav" && r.getInt(3) == 1)
  }

  test("JPEG parser skips padding and APPn segments to find a later SOF2 (progressive)") {
    // SOI, fill byte, APP1 of 4 bytes, then SOF2.
    val b = Array(0xff, 0xd8).map(_.toByte) ++
      Array(0xff.toByte) ++ // fill byte before next marker
      Array(0xff, 0xe1).map(_.toByte) ++ Array[Byte](0, 4, 1, 2) ++
      Array(0xff, 0xc2).map(_.toByte) ++ Array[Byte](0, 11, 8) ++
      Array[Byte](1, 0) ++ // height 256
      Array[Byte](0, 77) ++ // width 77
      Array[Byte](1, 0x11, 0)
    val r = decodeOne(b)
    assert(r.getString(0) == "jpeg" && r.getInt(1) == 77 && r.getInt(2) == 256)
  }

  test("WAV odd-sized chunks are word-aligned (pad byte honored)") {
    // A 3-byte junk chunk (odd → 1 pad byte) before fmt/data.
    val fmtData = Array[Byte](1, 0) ++ Array[Byte](2, 0) ++ // pcm, stereo
      Array[Byte](0x44.toByte, 0xac.toByte, 0, 0) ++ // 44100
      Array[Byte](0x10.toByte, 0xb1.toByte, 2, 0) ++ // byte rate 176400
      Array[Byte](4, 0) ++ Array[Byte](16, 0)
    val b = "RIFF".getBytes ++ Array[Byte](100, 0, 0, 0) ++ "WAVE".getBytes ++
      "junk".getBytes ++ Array[Byte](3, 0, 0, 0) ++ Array[Byte](9, 9, 9, 0) ++
      "fmt ".getBytes ++ Array[Byte](16, 0, 0, 0) ++ fmtData ++
      "data".getBytes ++ Array[Byte]((176400 % 256).toByte, (176400 / 256 % 256).toByte, (176400 / 65536).toByte, 0)
    val r = decodeOne(b)
    assert(r.getString(0) == "wav" && r.getInt(3) == 2 && r.getInt(4) == 44100)
    assert(r.getLong(5) == 1000L) // exactly one second of data
  }

  test("GIF/BMP: LE dims, top-down negative height, bpp channels, garbage degrades") {
    val gif = "GIF89a".getBytes ++ Array[Byte](0x20, 0x01) ++ // width 288
      Array[Byte](0x40, 0) ++ Array[Byte](0, 0, 0) ++ Array(0x3b.toByte)
    val g = decodeOne(gif)
    assert(g.getString(0) == "gif" && g.getInt(1) == 288 && g.getInt(2) == 64)
    assert(g.isNullAt(3) && g.isNullAt(4) && g.isNullAt(5))

    // BMP, 24 bpp, height declared NEGATIVE (top-down) → abs reported
    val bmp = "BM".getBytes ++ Array[Byte](0, 1, 0, 0) ++ Array[Byte](0, 0, 0, 0) ++
      Array[Byte](54, 0, 0, 0) ++
      Array[Byte](40, 0, 0, 0) ++ Array[Byte](10, 0, 0, 0) ++
      Array(0xf6.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte) ++ // -10
      Array[Byte](1, 0) ++ Array[Byte](24, 0) ++ Array.fill[Byte](24)(0)
    val m = decodeOne(bmp)
    assert(m.getString(0) == "bmp" && m.getInt(1) == 10 && m.getInt(2) == 10)
    assert(m.getInt(3) == 3 && m.isNullAt(4) && m.isNullAt(5))

    // GIF fixture round-trip on the real corpus
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val bad = Multimodal.decodeHeaders(
      Multimodal.mediaWithGifBmpHeaders(docs, "doc_id", "text"))
      .where(col("format") === "unknown").count()
    assert(bad == 0L)

    // truncated GIF (signature only) and BMP with an undersized info
    // header both degrade to unknown, never throw
    assert(decodeOne("GIF89a".getBytes).getString(0) == "unknown")
    val shortBmp = "BM".getBytes ++ Array.fill[Byte](12)(0) ++
      Array[Byte](12, 0, 0, 0) ++ Array.fill[Byte](14)(1)
    assert(decodeOne(shortBmp).getString(0) == "unknown")
    // zero-width GIF is unknown too
    val zgif = "GIF89a".getBytes ++ Array[Byte](0, 0, 5, 0, 0, 0, 0)
    assert(decodeOne(zgif).getString(0) == "unknown")
  }

  test("TIFF: both byte orders parse; bad magic, truncated IFD, II-text degrade") {
    // fixture round-trip on the real corpus — alternating II/MM marks
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val parsed = Multimodal.decodeHeaders(
      Multimodal.mediaWithTiffHeaders(docs, "doc_id", "text"))
    assert(parsed.where(col("format") === "unknown").count() == 0L)
    assert(parsed.where(col("format") === "tiff").count() == docs.count())

    // hand-built big-endian: MM + 42 + IFD at 8, width 7 (LONG),
    // height 9 (LONG), spp 3 (SHORT, high bytes first in MM order)
    def be16(v: Int) = Array((v >>> 8).toByte, v.toByte)
    def be32(v: Int) = Array((v >>> 24).toByte, (v >>> 16).toByte,
      (v >>> 8).toByte, v.toByte)
    val mm = "MM".getBytes ++ be16(42) ++ be32(8) ++
      be16(3) ++
      (be16(256) ++ be16(4) ++ be32(1) ++ be32(7)) ++
      (be16(257) ++ be16(4) ++ be32(1) ++ be32(9)) ++
      (be16(277) ++ be16(3) ++ be32(1) ++ (be16(3) ++ be16(0))) ++
      be32(0)
    val m = decodeOne(mm)
    assert(m.getString(0) == "tiff" && m.getInt(1) == 7 && m.getInt(2) == 9 &&
      m.getInt(3) == 3)

    // wrong magic (43), text that merely starts with 'II', and an IFD
    // offset past the payload all degrade to unknown — never throw
    assert(decodeOne("II".getBytes ++ Array[Byte](43, 0, 8, 0, 0, 0))
      .getString(0) == "unknown")
    assert(decodeOne("II think therefore I parse".getBytes)
      .getString(0) == "unknown")
    assert(decodeOne("II".getBytes ++ Array[Byte](42, 0) ++
      Array[Byte](0xff.toByte, 0xff.toByte, 0, 0)).getString(0) == "unknown")
  }

  test("EXIF: fixture round-trip both byte orders; inline ASCII; garbage degrades to NULLs") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val parsed = Multimodal.decodeExif(
      Multimodal.mediaWithExifHeaders(docs, "doc_id", "text"))
    assert(parsed.where(col("orientation").isNull).count() == 0L)
    val r = parsed.where(col("media_id") === 5L)
      .select("orientation", "make", "model", "taken_at").head()
    assert(r.getInt(0) == 6 && r.getString(1) == "Make0" &&
      r.getString(2) == "Model2" && r.getString(3) == "2024:06:06 05:00:00")

    def exifOne(bytes: Array[Byte]): Row =
      Multimodal.decodeExif(Seq((1L, "x", bytes)).toDF("media_id", "kind", "payload"))
        .select("orientation", "make", "model", "taken_at").head()
    // inline ASCII path: make "abc" (count 4 incl NUL fits the value slot)
    def le16(v: Int) = Array(v.toByte, (v >>> 8).toByte)
    def le32(v: Int) = Array(v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte)
    val tiff = "II".getBytes ++ le16(42) ++ le32(8) ++
      le16(2) ++
      (le16(0x010f) ++ le16(2) ++ le32(4) ++ "abc".getBytes ++ Array[Byte](0)) ++
      (le16(0x0112) ++ le16(3) ++ le32(1) ++ le16(7) ++ le16(0)) ++
      le32(0)
    val jpeg = Array(0xff, 0xd8, 0xff, 0xe1).map(_.toByte) ++
      Array(((2 + 6 + tiff.length) >>> 8).toByte, (2 + 6 + tiff.length).toByte) ++
      "Exif".getBytes ++ Array[Byte](0, 0) ++ tiff
    val in = exifOne(jpeg)
    assert(in.getString(1) == "abc" && in.getInt(0) == 7 &&
      in.isNullAt(2) && in.isNullAt(3))
    // garbage / non-JPEG / JPEG without APP1 / truncated APP1 → all NULL
    for (bad <- Seq(Array[Byte](), "not a jpeg".getBytes,
        Array(0xff, 0xd8, 0xff, 0xdb, 0x00, 0x04, 0, 0).map(_.toByte),
        jpeg.take(20))) {
      val g = exifOne(bad)
      assert((0 to 3).forall(g.isNullAt), s"expected all-NULL for ${bad.length} bytes")
    }
    // crafted out-of-line offset near 2^32: t0 + offset must be bounds-
    // checked in LONG (an Int wrap could alias back inside the buffer
    // and return garbage text) — expect NULL, never a string
    val evil = "II".getBytes ++ le16(42) ++ le32(8) ++
      le16(1) ++
      (le16(0x010f) ++ le16(2) ++ le32(16) ++ le32(0xFFFFFFF4)) ++
      le32(0) ++ Array.fill[Byte](64)('A'.toByte)
    val evilJpeg = Array(0xff, 0xd8, 0xff, 0xe1).map(_.toByte) ++
      Array(((2 + 6 + evil.length) >>> 8).toByte, (2 + 6 + evil.length).toByte) ++
      "Exif".getBytes ++ Array[Byte](0, 0) ++ evil
    assert(exifOne(evilJpeg).isNullAt(1),
      "wrapping out-of-line offset must yield NULL, not aliased bytes")
  }

  test("declared size: RIFF/BMFF recovered, truncation flagged, images undeclared, garbage safe") {
    import Multimodal.buildHeaderPayload
    def declared(bytes: Array[Byte]): Option[Long] = {
      val r = Seq(Tuple1(bytes)).toDF("payload")
        .select(graft.expressions.MediaExpressions.declaredSize(col("payload")))
        .head()
      if (r.isNullAt(0)) None else Some(r.getLong(0))
    }
    val body = Array.fill[Byte](100)('x'.toByte)
    val wav = buildHeaderPayload(2L, body)   // id%4==2 → RIFF/WAVE
    val mp4 = buildHeaderPayload(3L, body)   // id%4==3 → ISO-BMFF
    val png = buildHeaderPayload(0L, body)
    // WAV declares the id-derived data size, NOT the body it carries
    assert(declared(wav) == Some(44L + (2 % 100 + 1) * 1000))
    // BMFF boxes are built from the body → declared == actual
    assert(declared(mp4) == Some(mp4.length.toLong))
    // truncating the mdat tail leaves the declared size intact → the
    // audit sees declared > actual (the integrity signal)
    val cut = mp4.take(mp4.length - 40)
    assert(declared(cut) == Some(mp4.length.toLong))
    assert(declared(png).isEmpty, "PNG declares no total size")
    assert(declared(Array[Byte]()).isEmpty)
    assert(declared("RIFFxx".getBytes).isEmpty, "short RIFF must not read past end")
    // a nonsensical box size must abort the walk, not loop
    val evilBox = Array[Byte](0, 0, 0, 2) ++ "ftyp".getBytes ++ body
    assert(declared(evilBox).isEmpty)
    // ISO-BMFF §4.2 special sizes are spec-VALID, not garbage:
    def be32(v: Long) = Array[Byte]((v >>> 24).toByte, (v >>> 16).toByte,
      (v >>> 8).toByte, v.toByte)
    def be64(v: Long) = be32(v >>> 32) ++ be32(v & 0xffffffffL)
    val ftyp16 = be32(16) ++ "ftypisom".getBytes ++ be32(0)
    // size 0 = box extends to end of file: declares the remaining bytes
    val toEof = ftyp16 ++ be32(0) ++ "mdat".getBytes ++ body
    assert(declared(toEof) == Some(toEof.length.toLong))
    // …and a truncated to-EOF mdat still just declares what's there
    // (declared tracks the container's own claim — EOF boxes claim to EOF)
    // size 1 = 64-bit largesize follows the type
    val largeMdat = be32(1) ++ "mdat".getBytes ++ be64(16L + body.length) ++ body
    val withLarge = ftyp16 ++ largeMdat
    assert(declared(withLarge) == Some(withLarge.length.toLong))
    // a largesize CLAIMING more than present is the truncation signal
    val bigClaim = ftyp16 ++ be32(1) ++ "mdat".getBytes ++ be64(1000000L)
    assert(declared(bigClaim) == Some(16L + 1000000L))
    // largesize < 16 (can't cover its own header) aborts; truncated
    // largesize header (box cut before the 8 size bytes) aborts
    assert(declared(ftyp16 ++ be32(1) ++ "mdat".getBytes ++ be64(8L)).isEmpty)
    assert(declared(ftyp16 ++ be32(1) ++ "mdat".getBytes ++ be32(0)).isEmpty)
  }
}
