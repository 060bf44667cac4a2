package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed by batched per-partition
  * decode/feature-extract operators.
  *
  * The Spark-side plumbing is real — schema contracts, partition-sized
  * batching, feature schema — but the actual codec calls are STUBBED with
  * a deterministic fake (`decodeStub`): image/audio libraries are not in
  * this container. Swap `decodeStub` for a real decoder (JNI/javacpp) and
  * nothing else changes. The batch shape mirrors Arrow-batch UDF executors:
  * rows stream through `mapPartitions` so only one batch of decoded media
  * is in memory per core at a time — the property that matters at 100 TB.
  */
object Multimodal {

  /** Deterministic fake features standing in for a real decoder. Derives
    * "width/height/duration" from stable byte statistics so tests and
    * oracles are reproducible. A real implementation replaces ONLY this. */
  private[ops] def decodeStub(kind: String, bytes: Array[Byte]): (Int, Int, Double) = {
    val n = bytes.length
    val checksum = bytes.foldLeft(0L)((a, b) => (a * 31 + (b & 0xff)) & 0x7fffffffL)
    kind match {
      case "image" => (((checksum % 1920) + 1).toInt, ((checksum % 1080) + 1).toInt, 0.0)
      case "audio" => (1, 1, (n % 600) + (checksum % 1000) / 1000.0)
      case _       => (((checksum % 3840) + 1).toInt, ((checksum % 2160) + 1).toInt, (n % 7200).toDouble)
    }
  }

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("duration_s", DoubleType, nullable = false)))

  /** Feature extraction over a media table with columns (media_id: long,
    * kind: string, payload: binary), fully declarative: the checksum is a
    * codegen'd native expression ([[graft.expressions.ByteFoldChecksumExpr]])
    * and the per-kind dimension math is Column arithmetic — one pass at
    * scan parallelism inside whole-stage codegen, no serialization hop,
    * identical output to [[extractFeaturesBatched]] (pinned in OpsSpec)
    * and to the DuckDB `mm_features` oracle. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val kind = col("kind")
    val n = col("n_bytes")
    val cs = col("__cs")
    media.select(col("media_id"), kind,
      length(col("payload")).cast("long").as("n_bytes"),
      graft.expressions.MediaExpressions.byteFoldChecksum(col("payload")).as("__cs"))
      .select(col("media_id"), kind, n,
        when(kind === "image", cs % 1920 + 1)
          .when(kind === "audio", lit(1L))
          .otherwise(cs % 3840 + 1).cast("int").as("width"),
        when(kind === "image", cs % 1080 + 1)
          .when(kind === "audio", lit(1L))
          .otherwise(cs % 2160 + 1).cast("int").as("height"),
        when(kind === "image", lit(0.0))
          .when(kind === "audio",
            (n % 600).cast("double") + (cs % 1000).cast("double") / 1000.0)
          .otherwise((n % 7200).cast("double")).as("duration_s"))
  }

  /** The batched per-partition formulation: the substitution point for a
    * REAL codec (JNI/javacpp decoders want partition-sized batches and
    * per-partition init, which no per-row expression can host). Rows
    * stream through `mapPartitions` directly from the typed iterator — one
    * encode boundary, no intermediate case-class hop — so only one batch
    * of decoded media is in memory per core at a time. Output is
    * bit-identical to [[extractFeatures]] while the stub stands in. */
  def extractFeaturesBatched(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("media_id"), col("kind"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, kind, bytes) =>
          val (w, h, d) = decodeStub(kind, bytes)
          (id, kind, bytes.length.toLong, w, h, d)
        }
      }.toDF("media_id", "kind", "n_bytes", "width", "height", "duration_s")
  }

  /** REAL metadata decode over a media table (media_id, kind, payload):
    * parses actual PNG IHDR / JPEG SOF / WAV fmt container headers from
    * the binary payload via the native
    * [[graft.expressions.MediaHeaderExpr]] — no codec library, pure
    * byte arithmetic inside whole-stage codegen, zero shuffle. Fields a
    * format does not define are NULL; garbage payloads degrade to
    * format='unknown'. This supersedes the checksum stand-in for the
    * metadata half of decode ([[extractFeatures]] remains as the
    * deterministic-fake twin the batched-codec seam is pinned against). */
  def decodeHeaders(media: DataFrame): DataFrame =
    media.select(col("media_id"), col("kind"),
      length(col("payload")).cast("long").as("n_bytes"),
      graft.expressions.MediaHeaderExpr.mediaHeader(col("payload")).as("__h"))
      .select(col("media_id"), col("kind"), col("n_bytes"),
        col("__h.format").as("format"),
        col("__h.width").as("width"), col("__h.height").as("height"),
        col("__h.channels").as("channels"),
        col("__h.sample_rate").as("sample_rate"),
        col("__h.duration_ms").as("duration_ms"))

  /** Resize plumbing: target-box scaling of the extracted dimensions
    * (aspect-preserving fit). Works on [[extractFeatures]] output; the
    * pixel-level resample would live in the decode stub's replacement —
    * the dimension math and schema contract are the real part. */
  def resizeTo(features: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    require(maxW > 0 && maxH > 0)
    val scale = least(lit(maxW.toDouble) / col("width"),
      least(lit(maxH.toDouble) / col("height"), lit(1.0)))
    features
      .withColumn("resized_w", greatest(floor(col("width") * scale).cast("int"), lit(1)))
      .withColumn("resized_h", greatest(floor(col("height") * scale).cast("int"), lit(1)))
  }

  /** Exact payload dedup — step one of any media dedup pipeline: group
    * by full-content hash, keep the lowest media id per group. Same
    * single partial-agg shuffle as [[graft.ops.Dedup.exact]], skew-free
    * by construction (md5 keys are uniform). The hash runs over the
    * HEX-string form of the bytes, not the raw binary — the engine-
    * portable formulation (DuckDB's md5 is VARCHAR-only); identity is
    * unchanged since hex is injective.
    *
    * NULL payloads (a failed fetch/decode upstream) are EXCLUDED: a null
    * carries no content identity, but `md5(hex(NULL))` is NULL and
    * groupBy treats NULLs as equal — without the filter every unfetched
    * row would collapse into one bogus "duplicate" group and a
    * downstream apply keyed on keep_id would drop distinct media. */
  def exactDedup(media: DataFrame): DataFrame =
    media.where(col("payload").isNotNull)
      .withColumn("payload_md5", md5(hex(col("payload"))))
      .groupBy("payload_md5")
      .agg(min(col("media_id")).as("keep_id"), count(lit(1)).as("n_copies"))

  /** 60-bit blockhash perceptual sketch per payload (see
    * [[graft.expressions.BlockHash60Expr]]) — the NEAR-duplicate stage a
    * media dedup pipeline runs after [[exactDedup]]'s content-hash pass:
    * exact hashing misses a re-encoded / padded / trimmed copy, while
    * the block-mass profile survives local byte churn. Per-row codegen'd
    * arithmetic, zero shuffle — scan speed at any corpus size. */
  def blockHashed(media: DataFrame): DataFrame =
    media.where(col("payload").isNotNull)
      .select(col("media_id"),
        graft.expressions.MediaExpressions.blockHash60(col("payload")).as("phash"))

  /** Perceptual near-dup candidate pairs at Hamming ≤ `maxHamming` over
    * the blockhash — the same 4×15-bit band machinery as 60-bit SimHash
    * ([[Dedup.simHash60Pairs]]): pigeonhole gives EXACT recall for
    * thresholds ≤ 3, band buckets capped against a boilerplate-heavy
    * payload going quadratic. Output: (id_a, id_b, hamming). */
  def phashPairs(media: DataFrame, maxHamming: Int = 3,
                 maxBucketSize: Int = 1000): DataFrame =
    phashPairsOf(blockHashed(media), maxHamming, maxBucketSize)

  /** [[phashPairs]] over an ALREADY-HASHED frame (media_id, phash) —
    * lets a pipeline compute the blockhash once and feed both the pair
    * generation and its own outputs. */
  def phashPairsOf(hashed: DataFrame, maxHamming: Int = 3,
                   maxBucketSize: Int = 1000): DataFrame =
    Dedup.sketchPairs(
      hashed.select(col("media_id"), col("phash").as("simhash")),
      "media_id", maxHamming, maxBucketSize, bands = 4, bandBits = 15)

  /** Frame-sample stub for video payloads: deterministic frame offsets
    * (every `stride` bytes), the plumbing for a real frame extractor. */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame = {
    require(stride > 0)
    media.select(col("media_id"), col("payload"))
      .withColumn("n_bytes", length(col("payload")).cast("long"))
      // empty payload → NO frames (explode of an empty array emits no row);
      // clamping to sequence(0,0) would fabricate an offset into zero bytes
      .withColumn("frame_offset",
        explode(when(col("n_bytes") > 0L,
            sequence(lit(0L), col("n_bytes") - 1, lit(stride.toLong)))
          .otherwise(array().cast("array<bigint>"))))
      .select("media_id", "frame_offset")
  }

  /** Per-frame features: [[sampleFrames]]' stride-aligned offsets, each
    * with its frame's byte count and the native byte-fold checksum of the
    * frame WINDOW `[offset, offset + stride)` — the compose-then-extract
    * shape of a video feature pipeline (sample frames, featurize each),
    * with the decode step stubbed by the same checksum expression
    * [[extractFeatures]] uses. Payload stays in-row through the explode
    * (no re-join with the media table) and the slice + fold are per-row
    * codegen — scan speed, fan-out partition-local, zero shuffle. */
  def frameFeatures(media: DataFrame, stride: Int): DataFrame = {
    require(stride > 0)
    media.select(col("media_id"), col("payload"))
      .withColumn("n_bytes", length(col("payload")).cast("long"))
      .withColumn("frame_offset",
        explode(when(col("n_bytes") > 0L,
            sequence(lit(0L), col("n_bytes") - 1, lit(stride.toLong)))
          .otherwise(array().cast("array<bigint>"))))
      .select(col("media_id"), col("frame_offset"),
        least(lit(stride.toLong), col("n_bytes") - col("frame_offset"))
          .as("frame_bytes"),
        graft.expressions.MediaExpressions.byteFoldChecksum(
          expr(s"substring(payload, frame_offset + 1, $stride)"))
          .as("frame_checksum"))
  }

  /** Build a deterministic media table from the documents corpus (UTF-8
    * payloads): the fixture generator for tests/queries — binary columns
    * with metadata, exactly the shape a real ingest would produce. */
  def mediaFromDocuments(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col(idCol) % 3 + 1).cast("int")).as("kind"),
      encode(col(textCol), "UTF-8").as("payload"))

  private def be32(v: Int): Array[Byte] = Array(
    (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
  private def be16(v: Int): Array[Byte] = Array((v >>> 8).toByte, v.toByte)
  private def le32(v: Int): Array[Byte] = Array(
    v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte)
  private def le16(v: Int): Array[Byte] = Array(v.toByte, (v >>> 8).toByte)
  private def ascii(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  /** Deterministic REAL-header payloads (id-derived dimensions — the
    * single fixture formula the mm_decode_meta oracle mirrors):
    * id ≡ 0 (mod 4) → PNG, ≡ 1 → JPEG, ≡ 2 → WAV (whose channel /
    * sample-rate fields derive from id/4 so they keep varying within
    * the residue class), ≡ 3 → MP4 (ISO-BMFF mvhd+tkhd). */
  private[ops] def buildHeaderPayload(id: Long, body: Array[Byte]): Array[Byte] =
    (id % 4) match {
      case 0 =>
        val w = (id % 1920 + 1).toInt; val h = (id % 1080 + 1).toInt
        Array(0x89.toByte) ++ ascii("PNG") ++
          Array(0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte) ++
          be32(13) ++ ascii("IHDR") ++ be32(w) ++ be32(h) ++
          Array[Byte](8, 6, 0, 0, 0) ++ be32(0) ++ body
      case 1 =>
        val w = (id % 3840 + 1).toInt; val h = (id % 2160 + 1).toInt
        // SOI, APP0 (JFIF), SOF0 (len 11: precision + dims + 1 component)
        Array(0xff, 0xd8, 0xff, 0xe0).map(_.toByte) ++ be16(16) ++
          ascii("JFIF") ++ Array[Byte](0, 1, 1, 0) ++ be16(1) ++ be16(1) ++
          Array[Byte](0, 0) ++
          Array(0xff, 0xc0).map(_.toByte) ++ be16(11) ++ Array[Byte](8) ++
          be16(h) ++ be16(w) ++ Array[Byte](1, 0x11, 0) ++
          body ++ Array(0xff, 0xd9).map(_.toByte)
      case 2 =>
        // id ≡ 2 (mod 4): id-derived fields use id/4 so they still vary
        val channels = ((id / 4) % 2 + 1).toInt
        val sampleRate = (8000 * ((id / 4) % 4 + 1)).toInt
        val byteRate = sampleRate * channels * 2
        val dataBytes = ((id % 100 + 1) * 1000).toInt
        ascii("RIFF") ++ le32(36 + dataBytes) ++ ascii("WAVE") ++
          ascii("fmt ") ++ le32(16) ++ le16(1) ++ le16(channels) ++
          le32(sampleRate) ++ le32(byteRate) ++ le16(channels * 2) ++
          le16(16) ++ ascii("data") ++ le32(dataBytes) ++ body
      case _ =>
        // Minimal ISO-BMFF: ftyp(16) + moov(216: mvhd(108) +
        // trak(100: tkhd(92))) + mdat header(8) = 240 B before the body.
        val ts = (600 * ((id / 4) % 3 + 1)).toInt
        val dur = ((id % 50 + 1) * ts + (id % 7) * 37).toInt
        val w = (id % 1280 + 16).toInt; val h = (id % 720 + 16).toInt
        val matrix = be32(0x10000) ++ be32(0) ++ be32(0) ++
          be32(0) ++ be32(0x10000) ++ be32(0) ++
          be32(0) ++ be32(0) ++ be32(0x40000000)
        val mvhd = be32(108) ++ ascii("mvhd") ++
          be32(0) ++ be32(0) ++ be32(0) ++ // v0+flags, creation, modification
          be32(ts) ++ be32(dur) ++
          be32(0x10000) ++ Array[Byte](1, 0) ++ Array.fill[Byte](10)(0) ++ // rate, volume, reserved
          matrix ++ Array.fill[Byte](24)(0) ++ be32(2) // predefined, next track
        val tkhd = be32(92) ++ ascii("tkhd") ++
          be32(7) ++ be32(0) ++ be32(0) ++ be32(1) ++ be32(0) ++ // v0+flags, times, track 1, reserved
          be32(dur) ++ Array.fill[Byte](8)(0) ++ // duration, reserved
          Array.fill[Byte](8)(0) ++ // layer, alternate group, volume, reserved
          matrix ++ be32(w << 16) ++ be32(h << 16) // 16.16 fixed point
        val trak = be32(100) ++ ascii("trak") ++ tkhd
        be32(16) ++ ascii("ftyp") ++ ascii("isom") ++ be32(0) ++
          be32(216) ++ ascii("moov") ++ mvhd ++ trak ++
          be32(8 + body.length) ++ ascii("mdat") ++ body
    }

  private[ops] def buildGifBmpPayload(id: Long, body: Array[Byte]): Array[Byte] =
    if (id % 2 == 0) {
      val w = (id % 1024 + 1).toInt; val h = (id % 640 + 1).toInt
      // logical screen descriptor (no GCT), body as raster stand-in,
      // 0x3B trailer
      ascii("GIF89a") ++ le16(w) ++ le16(h) ++ Array[Byte](0, 0, 0) ++
        body ++ Array(0x3b.toByte)
    } else {
      val w = (id % 800 + 1).toInt; val h = (id % 600 + 1).toInt
      val bpp = ((id / 2) % 3) match { case 0 => 8; case 1 => 24; case _ => 32 }
      // 14-byte file header + 40-byte BITMAPINFOHEADER; ids ≡ 3 (mod 4)
      // declare a NEGATIVE (top-down) height to pin the sign handling
      ascii("BM") ++ le32(54 + body.length) ++ le32(0) ++ le32(54) ++
        le32(40) ++ le32(w) ++ le32(if (id % 4 == 3) -h else h) ++
        le16(1) ++ le16(bpp.toInt) ++ le32(0) ++ le32(body.length) ++
        le32(2835) ++ le32(2835) ++ le32(0) ++ le32(0) ++ body
    }

  private[ops] def buildTiffPayload(id: Long, body: Array[Byte]): Array[Byte] = {
    // 8-byte header + IFD0 at offset 8 (count 2B + 3 entries × 12B +
    // next-IFD 4B = 42B) = 50 bytes before the body. Even ids write
    // little-endian 'II', odd ids big-endian 'MM' — endianness is data
    // in TIFF, and the decoder must honor the mark, not guess.
    val little = id % 2 == 0
    val w = (id % 2048 + 1).toInt
    val h = (id % 1536 + 1).toInt
    val spp = ((id / 2) % 3) match { case 0 => 1; case 1 => 3; case _ => 4 }
    def u16(v: Int) = if (little) le16(v) else be16(v)
    def u32(v: Int) = if (little) le32(v) else be32(v)
    // entry: tag, type, count, inlined value (SHORT pads its high half)
    def entryLong(tag: Int, v: Int) = u16(tag) ++ u16(4) ++ u32(1) ++ u32(v)
    def entryShort(tag: Int, v: Int) =
      u16(tag) ++ u16(3) ++ u32(1) ++ (u16(v) ++ u16(0))
    ascii(if (little) "II" else "MM") ++ u16(42) ++ u32(8) ++
      u16(3) ++ entryLong(256, w) ++ entryLong(257, h) ++
      entryShort(277, spp) ++ u32(0) ++ body
  }

  /** Deterministic REAL-WebP payloads (the fixture formula the
    * mm_webp_meta oracle mirrors): id ≡ 0 (mod 3) → 'VP8 ' lossy
    * key-frame header, ≡ 1 → 'VP8L' lossless (alpha bit = (id/3) % 2),
    * ≡ 2 → 'VP8X' extended canvas header (alpha flag = (id/3) % 2).
    * Header overhead: 30 bytes for VP8 /VP8X, 25 for VP8L. */
  private[ops] def buildWebpPayload(id: Long, body: Array[Byte]): Array[Byte] = {
    def le24(v: Int) = Array(v.toByte, (v >>> 8).toByte, (v >>> 16).toByte)
    val chunk: Array[Byte] = (id % 3) match {
      case 0 =>
        val w = (id % 3000 + 1).toInt; val h = (id % 1700 + 1).toInt
        ascii("VP8 ") ++ le32(10 + body.length) ++
          Array[Byte](0, 0, 0) ++ Array(0x9d, 0x01, 0x2a).map(_.toByte) ++
          le16(w) ++ le16(h) ++ body
      case 1 =>
        val w = (id % 2048 + 1).toInt; val h = (id % 1365 + 1).toInt
        val alpha = ((id / 3) % 2).toInt
        val bits = (w - 1) | ((h - 1) << 14) | (alpha << 28)
        ascii("VP8L") ++ le32(5 + body.length) ++
          Array(0x2f.toByte) ++ le32(bits) ++ body
      case _ =>
        val w = (id % 4096 + 1).toInt; val h = (id % 2304 + 1).toInt
        val alpha = ((id / 3) % 2).toInt
        ascii("VP8X") ++ le32(10 + body.length) ++
          Array[Byte]((alpha << 4).toByte, 0, 0, 0) ++ le24(w - 1) ++ le24(h - 1) ++ body
    }
    ascii("RIFF") ++ le32(4 + chunk.length) ++ ascii("WEBP") ++ chunk
  }

  private[ops] def buildFlacOggPayload(id: Long, body: Array[Byte]): Array[Byte] =
    if (id % 2 == 0) {
      // FLAC: fLaC + STREAMINFO (last-block flag set, type 0, length
      // 34). The 8 packed bytes: rate(20) | channels−1(3) | bps−1(5) |
      // total samples(36), big-endian — the exact layout the decoder's
      // shifted reads must invert.
      val rate = (8000 * ((id / 2) % 6 + 1)).toInt
      val channels = ((id / 2) % 2 + 1).toInt
      val totalSamples = (id % 100 + 1) * 1000L
      val packed: Long = (rate.toLong << 44) | ((channels - 1).toLong << 41) |
        (15L << 36) | totalSamples // bps 16
      val packedBytes = Array.tabulate[Byte](8)(k =>
        ((packed >>> (56 - 8 * k)) & 0xff).toByte)
      ascii("fLaC") ++ Array[Byte](0x80.toByte, 0, 0, 34) ++
        be16(4096) ++ be16(4096) ++ Array.fill[Byte](6)(0) ++ // min/max block + frame sizes
        packedBytes ++ Array.fill[Byte](16)(0) ++ body // md5 zeros
    } else {
      // OGG-Vorbis: a BOS page carrying the 30-byte identification
      // header (granule 0), then an EOS page whose granule is the total
      // PCM samples and whose segments lace the body (255-byte lacing,
      // RFC 3533 §6 — exercised whenever the text exceeds 255 bytes).
      val channels = ((id / 2) % 2 + 1).toInt
      val rate = (11025 * ((id / 2) % 4 + 1)).toInt
      val totalSamples = (id % 50 + 1) * 2000L
      val ident = Array[Byte](1) ++ ascii("vorbis") ++ le32(0) ++
        Array(channels.toByte) ++ le32(rate) ++
        le32(0) ++ le32(0) ++ le32(0) ++ Array[Byte](0x66.toByte, 1)
      def page(htype: Int, granule: Long, seq: Int, data: Array[Byte]): Array[Byte] = {
        val lacing = Array.fill(data.length / 255)(255.toByte) :+
          (data.length % 255).toByte
        ascii("OggS") ++ Array[Byte](0, htype.toByte) ++
          le32((granule & 0xffffffffL).toInt) ++ le32((granule >>> 32).toInt) ++
          le32(7777) ++ le32(seq) ++ le32(0) ++
          Array(lacing.length.toByte) ++ lacing ++ data
      }
      page(2, 0L, 0, ident) ++ page(4, totalSamples, 1, body)
    }

  private[ops] def buildMp3Payload(id: Long, body: Array[Byte]): Array[Byte] = {
    // ID3v2.3 tag (10 B header + id-derived padding, size SYNCSAFE so
    // the decoder's 7-bit walk is exercised) + one MPEG-1 Layer III
    // frame header + the body as CBR audio bytes. brIdx 1..14 sweeps
    // the whole bitrate table; srIdx and channel mode cycle too.
    val tagLen = (id % 17).toInt
    val brIdx = (id % 14 + 1).toInt
    val srIdx = ((id / 2) % 3).toInt
    val mode = (id % 4).toInt
    val id3 = ascii("ID3") ++ Array[Byte](3, 0, 0) ++
      Array(((tagLen >> 21) & 0x7f).toByte, ((tagLen >> 14) & 0x7f).toByte,
        ((tagLen >> 7) & 0x7f).toByte, (tagLen & 0x7f).toByte) ++
      Array.fill(tagLen)('x'.toByte)
    val frame = Array(0xff.toByte, 0xfb.toByte,
      ((brIdx << 4) | (srIdx << 2)).toByte, (mode << 6).toByte)
    id3 ++ frame ++ body
  }

  /** Shared scaffolding for the mediaWith*Headers fixture builders:
    * one (id, kind, payload) row per document, payload = the format
    * builder applied to the UTF-8 body. Fixture generation only — a
    * per-row encode hop is fine here; the decode path itself is a
    * native expression. */
  private def mediaFrom(docs: DataFrame, idCol: String, textCol: String,
                        kindOf: Long => String,
                        build: (Long, Array[Byte]) => Array[Byte]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .map { case (id, text) =>
        (id, kindOf(id),
          build(id, text.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      }.toDF("media_id", "kind", "payload")
  }

  /** FLAC/OGG twin of [[mediaWithMp3Headers]]: even ids carry a real
    * fLaC STREAMINFO block, odd ids an OGG-Vorbis BOS identification
    * page + EOS page whose granule is the total sample count (body
    * laced in 255-byte segments). */
  def mediaWithFlacOggHeaders(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    mediaFrom(docs, idCol, textCol, _ => "audio", buildFlacOggPayload)

  /** WebP twin of [[mediaWithFlacOggHeaders]]: every id carries a real
    * RIFF/WEBP container — lossy 'VP8 ', lossless 'VP8L', or extended
    * 'VP8X' by id mod 3 (see [[buildWebpPayload]]). */
  def mediaWithWebpHeaders(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    mediaFrom(docs, idCol, textCol, _ => "image", buildWebpPayload)

  /** MP3 twin of [[mediaWithTiffHeaders]]: every id carries a real
    * ID3v2 tag (id-derived syncsafe length) + MPEG-1 Layer III frame
    * header, document text as the CBR audio bytes. */
  def mediaWithMp3Headers(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    mediaFrom(docs, idCol, textCol, _ => "audio", buildMp3Payload)

  /** TIFF twin of [[mediaWithGifBmpHeaders]]: every id carries a real
    * TIFF header+IFD0 (width/height as LONG, samples-per-pixel as
    * SHORT), alternating the byte-order mark by id parity. */
  def mediaWithTiffHeaders(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    mediaFrom(docs, idCol, textCol, _ => "image", buildTiffPayload)

  /** GIF/BMP twin of [[mediaWithRealHeaders]]: even ids carry a GIF89a
    * logical-screen header, odd ids a BMP file+info header (ids ≡ 3 mod
    * 4 with the top-down negative height), document text as the body. */
  def mediaWithGifBmpHeaders(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    mediaFrom(docs, idCol, textCol, _ => "image", buildGifBmpPayload)

  /** Media fixture with REAL container headers (PNG/JPEG/WAV bytes the
    * [[decodeHeaders]] parser actually decodes), document text as the
    * payload body. */
  def mediaWithRealHeaders(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    mediaFrom(docs, idCol, textCol,
      id => (id % 4) match {
        case 2 => "audio"
        case 3 => "video"
        case _ => "image"
      }, buildHeaderPayload)

  /** EXIF twin: JPEGs whose APP1 segment carries a real embedded TIFF
    * IFD (alternating II/MM byte order by id parity), document text as
    * the body. Fixture formula (the single formula the mm_exif_meta
    * oracle mirrors): orientation = id % 8 + 1, make = "Make"+(id % 5),
    * model = "Model"+(id % 3), taken_at =
    * "2024:MM:DD HH:00:00" with MM = id % 12 + 1, DD = id % 28 + 1,
    * HH = id % 24. Header overhead: 107 bytes (SOI 2 + APP1 105). */
  def mediaWithExifHeaders(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    mediaFrom(docs, idCol, textCol, _ => "image", buildExifPayload)

  /** Decode the EXIF provenance struct off a media frame (see
    * [[graft.expressions.ExifMetaExpr]] — per-row codegen, garbage-safe
    * NULL degradation). */
  def decodeExif(media: DataFrame): DataFrame =
    media.select(col("media_id"),
      length(col("payload")).cast("long").as("n_bytes"),
      graft.expressions.ExifMetaExpr.exifMeta(col("payload")).as("__e"))
      .select(col("media_id"), col("n_bytes"),
        col("__e.orientation").as("orientation"),
        col("__e.make").as("make"), col("__e.model").as("model"),
        col("__e.taken_at").as("taken_at"))

  private[ops] def buildExifPayload(id: Long, body: Array[Byte]): Array[Byte] = {
    val little = id % 2 == 0
    val make = s"Make${id % 5}"
    val model = s"Model${id % 3}"
    val takenAt = f"2024:${id % 12 + 1}%02d:${id % 28 + 1}%02d ${id % 24}%02d:00:00"
    def u16(v: Int) = if (little) le16(v) else be16(v)
    def u32(v: Int) = if (little) le32(v) else be32(v)
    val makeB = ascii(make) ++ Array[Byte](0)   // 6 bytes
    val modelB = ascii(model) ++ Array[Byte](0) // 7 bytes
    val dtB = ascii(takenAt) ++ Array[Byte](0)  // 20 bytes
    // TIFF block: header 8 + count 2 + 4 entries × 12 + next-IFD 4 = 62,
    // then the out-of-line ASCII values at offsets 62 / 68 / 75.
    def entryAscii(tag: Int, len: Int, ofs: Int) =
      u16(tag) ++ u16(2) ++ u32(len) ++ u32(ofs)
    def entryShort(tag: Int, v: Int) =
      u16(tag) ++ u16(3) ++ u32(1) ++ (u16(v) ++ u16(0))
    val tiff =
      ascii(if (little) "II" else "MM") ++ u16(42) ++ u32(8) ++
        u16(4) ++
        entryAscii(0x010f, makeB.length, 62) ++
        entryAscii(0x0110, modelB.length, 68) ++
        entryShort(0x0112, (id % 8 + 1).toInt) ++
        entryAscii(0x0132, dtB.length, 75) ++
        u32(0) ++ makeB ++ modelB ++ dtB
    // SOI + APP1(len + "Exif\0\0" + tiff) + body
    Array(0xff, 0xd8, 0xff, 0xe1).map(_.toByte) ++
      be16(2 + 6 + tiff.length) ++ ascii("Exif") ++ Array[Byte](0, 0) ++
      tiff ++ body
  }
}
