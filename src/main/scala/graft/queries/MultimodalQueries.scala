package graft.queries

import graft.ops.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column queries: a deterministic media table synthesized from
  * `documents` (UTF-8 payload bytes), exercising binary columns, metadata
  * extraction, frame sampling, and the decode plumbing. All three queries
  * (including `mm_features`, since the stub checksum became a native
  * arithmetic expression) are DuckDB-oracle-checked.
  */
object MultimodalQueries {

  private def media(s: SparkSession, dir: String): DataFrame =
    Multimodal.mediaFromDocuments(Tables(s, dir, "documents"), "doc_id", "text")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Binary-column metadata (byte length per payload + modality tag).
    "mm_media_meta" -> ((s, dir) =>
      media(s, dir).select(col("media_id"), col("kind"),
        length(col("payload")).cast("long").as("n_bytes"))),

    // Frame-sample plumbing: deterministic offsets every 128 bytes.
    "mm_frame_sample" -> ((s, dir) =>
      Multimodal.sampleFrames(media(s, dir).where(col("kind") === "video"), stride = 128)),

    // Sample-then-featurize per frame: stride-64 windows of the video
    // payloads, each with its byte count and window checksum (the video
    // feature-pipeline compose; payload rides the explode, no re-join).
    "mm_frame_features" -> ((s, dir) =>
      Multimodal.frameFeatures(
        media(s, dir).where(col("kind") === "video"), stride = 64)),

    // Feature extraction (stubbed codec as a native checksum expression;
    // the batched mapPartitions twin is pinned equal in OpsSpec).
    "mm_features" -> ((s, dir) =>
      Multimodal.extractFeatures(media(s, dir))),

    // REAL header decode: payloads carrying actual PNG/JPEG/WAV/MP4
    // container bytes (id-derived dimensions), parsed by the native
    // MediaHeaderExpr — big-endian IHDR/SOF fields, little-endian RIFF
    // chunk walk, ISO-BMFF box walk (mvhd timescale/duration + tkhd
    // 16.16 dimensions), exact integer durations. The oracle recomputes
    // every field from the fixture formula, so a parser that misreads
    // any offset or endianness hash-mismatches.
    "mm_decode_meta" -> ((s, dir) =>
      Multimodal.decodeHeaders(
        Multimodal.mediaWithRealHeaders(Tables(s, dir, "documents"),
          "doc_id", "text"))),

    // Container-integrity audit (dq for binary media): the DECLARED
    // total size parsed from the container's own headers vs the actual
    // byte count ([[graft.expressions.DeclaredSizeExpr]] — RIFF chunk
    // size, ISO-BMFF box walk; PNG/JPEG declare none → NULL). The
    // fixture's WAV headers declare an id-derived data size while
    // carrying the text body — declared ≠ actual (the truncation/
    // padding class an ingest audit must catch); the BMFF mdat box is
    // built FROM the body — consistent. Per-row codegen walk; the
    // oracle recomputes BOTH sides from the fixture formula, so a
    // parser misreading any offset or endianness hash-mismatches.
    "mm_integrity_audit" -> ((s, dir) =>
      Multimodal.mediaWithRealHeaders(Tables(s, dir, "documents"),
          "doc_id", "text")
        .select(col("media_id"), col("kind"),
          length(col("payload")).cast("long").as("n_bytes"),
          graft.expressions.MediaExpressions.declaredSize(col("payload"))
            .as("__d"))
        // null-free output (driver row-sort contract): 0/'undeclared'
        // stand for "format has no total-size field"
        .select(col("media_id"), col("kind"), col("n_bytes"),
          coalesce(col("__d"), lit(0L)).as("declared_bytes"),
          when(col("__d").isNull, "undeclared")
            .when(col("__d") === col("n_bytes"), "consistent")
            .otherwise("mismatch").as("verdict"),
          coalesce(col("__d") - col("n_bytes"), lit(0L)).as("delta"))),

    // Aspect-ratio bucketing (the SDXL-style resolution-bucket step a
    // real image-training pipeline runs after decode): each image/video
    // snaps to the closest of {1:1, 4:3, 16:9, 3:4, 9:16} — closeness
    // decided LOG-FREE by exact integer cross-multiplication
    // (|w·hb − h·wb| scaled by 144/hb puts all five errors on one
    // integer axis; lcm(1,3,9,4,16) = 144), ties to the earliest
    // declared bucket via the (error, index) struct min.
    "mm_aspect_buckets" -> ((s, dir) => {
      val buckets = Seq(("1:1", 1, 1), ("4:3", 4, 3), ("16:9", 16, 9),
        ("3:4", 3, 4), ("9:16", 9, 16))
      val names = array(buckets.map(b => lit(b._1)): _*)
      val errs = array(buckets.zipWithIndex.map { case ((_, wb, hb), i) =>
        struct((abs(col("width").cast("long") * hb -
          col("height").cast("long") * wb) * (144 / hb)).as("e"),
          lit(i).as("i"))
      }: _*)
      Multimodal.decodeHeaders(
        Multimodal.mediaWithRealHeaders(Tables(s, dir, "documents"),
          "doc_id", "text"))
        .where(col("width").isNotNull && col("height").isNotNull)
        .select(col("media_id"), col("width"), col("height"),
          element_at(names, array_min(errs).getField("i") + 1)
            .as("aspect_bucket"))
    }),

    // GIF/BMP header decode: little-endian logical-screen dims (GIF89a)
    // and signed BITMAPINFOHEADER dims + bpp-derived channels (BMP,
    // including the negative top-down height) — same oracle contract as
    // mm_decode_meta: every field recomputed from the fixture formula.
    "mm_gifbmp_meta" -> ((s, dir) =>
      Multimodal.decodeHeaders(
        Multimodal.mediaWithGifBmpHeaders(Tables(s, dir, "documents"),
          "doc_id", "text"))),

    // TIFF header decode — the one mainstream raster format whose
    // ENDIANNESS is data, not spec: byte-order mark + magic 42 + IFD0
    // entry walk (tags 256/257/277, LONG dims + SHORT samples/pixel),
    // fixtures alternating II/MM by id parity so a parser that assumes
    // one order hash-mismatches half the corpus.
    "mm_tiff_meta" -> ((s, dir) =>
      Multimodal.decodeHeaders(
        Multimodal.mediaWithTiffHeaders(Tables(s, dir, "documents"),
          "doc_id", "text"))),

    // MP3 header decode: ID3v2 syncsafe-size skip + MPEG-1 Layer III
    // frame fields (bitrate/sample-rate table lookups, mono vs stereo
    // mode) + the CBR duration estimate — same oracle contract: every
    // field recomputed from the fixture formula, so a misread table
    // index or a non-syncsafe size walk hash-mismatches.
    "mm_mp3_meta" -> ((s, dir) =>
      Multimodal.decodeHeaders(
        Multimodal.mediaWithMp3Headers(Tables(s, dir, "documents"),
          "doc_id", "text"))),

    // FLAC + OGG-Vorbis header decode: FLAC's packed STREAMINFO bit
    // fields (rate 20 / channels−1 3 / bps−1 5 / total samples 36) and
    // OGG's page structure (BOS identification packet + EOS granule
    // position for the duration, 255-byte segment lacing) — same oracle
    // contract as the other mm_*_meta queries: every field recomputed
    // from the fixture formula, so a misplaced bit shift or a lacing
    // miscount hash-mismatches.
    "mm_flacogg_meta" -> ((s, dir) =>
      Multimodal.decodeHeaders(
        Multimodal.mediaWithFlacOggHeaders(Tables(s, dir, "documents"),
          "doc_id", "text"))),

    // WebP header decode: one RIFF form type, THREE bitstream headers —
    // lossy 'VP8 ' (14-bit le dims behind the 9D 01 2A start code),
    // lossless 'VP8L' (one packed u32: width−1 / height−1 / alpha bit),
    // extended 'VP8X' (24-bit le canvas dims + alpha flag byte) — so a
    // parser that only handles the common lossy chunk mismatches two
    // thirds of the corpus. Same oracle contract as the other mm_*_meta
    // queries: every field recomputed from the fixture formula.
    "mm_webp_meta" -> ((s, dir) =>
      Multimodal.decodeHeaders(
        Multimodal.mediaWithWebpHeaders(Tables(s, dir, "documents"),
          "doc_id", "text"))),

    // EXIF provenance decode: APP1 'Exif\0\0' + embedded TIFF IFD0 walk
    // for Orientation (SHORT) / Make / Model / DateTime (ASCII, inline
    // AND offset paths) — the rotation/device/capture-time fields media
    // curation keys on. Fixtures alternate II/MM byte order by id
    // parity, so a parser that assumes one order hash-mismatches half
    // the corpus; the oracle recomputes every field from the fixture
    // formula.
    "mm_exif_meta" -> ((s, dir) =>
      Multimodal.decodeExif(
        Multimodal.mediaWithExifHeaders(Tables(s, dir, "documents"),
          "doc_id", "text"))),

    // Exact payload dedup (content-hash grouping — step one of a media
    // dedup pipeline; the sf corpus has no byte-identical payloads, so
    // every group is a singleton here, which the oracle verifies too).
    "mm_exact_dedup" -> ((s, dir) =>
      Multimodal.exactDedup(media(s, dir))),

    // Aspect-preserving resize planning over the extracted dimensions.
    "mm_resize" -> ((s, dir) =>
      Multimodal.resizeTo(Multimodal.extractFeatures(media(s, dir)), 640, 480)
        .select("media_id", "width", "height", "resized_w", "resized_h")),

    // 60-bit blockhash perceptual sketch per payload (block byte-mass
    // vs global mass, exact integer cross-multiplication — the
    // binary-payload SimHash twin).
    "mm_phash" -> ((s, dir) =>
      Multimodal.blockHashed(media(s, dir))),

    // Perceptual near-dup pairs at Hamming ≤ 3 over corpus ∪ perturbed
    // copies (each payload re-emitted with its FIRST BYTE rewritten,
    // same length, under id+100000 — the local corruption exact hashing
    // can never match): the 4-band pigeonhole pair machinery on the
    // blockhash.
    "mm_phash_pairs" -> ((s, dir) => {
      val m = media(s, dir)
      val perturbed = Tables(s, dir, "documents").select(
        (col("doc_id") + 100000L).as("media_id"),
        lit("image").as("kind"),
        encode(concat(lit("Z"), expr("substring(text, 2)")), "UTF-8").as("payload"))
      Multimodal.phashPairs(m.unionByName(perturbed), maxHamming = 3)
    }),

    // Media-dedup pipeline e2e over corpus ∪ perturbed copies: ONE
    // blockhash pass feeds both the 4-band pair generation and the
    // output; near-dup pairs → connected components (min-id label) →
    // losers dropped. Every perturbed copy pairs with its original
    // (local byte churn survives the block-mass profile), so exactly
    // the originals plus any genuinely isolated rows survive — the
    // oracle recomputes the whole chain including a recursive-CTE
    // closure.
    "mm_pipeline_e2e" -> ((s, dir) => {
      val m = media(s, dir)
      val perturbed = Tables(s, dir, "documents").select(
        (col("doc_id") + 100000L).as("media_id"),
        lit("image").as("kind"),
        encode(concat(lit("Z"), expr("substring(text, 2)")), "UTF-8").as("payload"))
      val corpus = m.unionByName(perturbed)
      val hashed = Multimodal.blockHashed(corpus).localCheckpoint(true)
      val pairs = Multimodal.phashPairsOf(hashed, maxHamming = 3)
      val losers = graft.ops.Dedup.resolveClusters(pairs)
        .where(col("cluster") < col("id"))
        .select(col("id").as("media_id"))
      corpus.select(col("media_id"), length(col("payload")).cast("long").as("n_bytes"))
        .join(hashed, "media_id")
        .join(losers, Seq("media_id"), "left_anti")
    })
  )

  private val kindSql = "(['image','audio','video'])[(doc_id % 3 + 1)::INT]"

  /** Blockhash CTE chain (media(media_id, payload-as-hex, n) → hh
    * (media_id, phash)) from any media CTE named `media` exposing
    * (media_id, ph, n): per byte the block is ⌊i·60/n⌋, per block the
    * mass sum, bit i iff 60·blockSum > totalSum — the
    * [[graft.expressions.BlockHash60Expr]] arithmetic verbatim. */
  private val phashCtes =
    s"""b AS (SELECT media_id, ph, n, unnest(range(0, n)) AS i FROM media),
       |pv AS (
       |  SELECT media_id, (i * 60) // n AS blk,
       |    16*(strpos('0123456789abcdef', substr(ph, (2*i+1)::INT, 1))-1)
       |      + strpos('0123456789abcdef', substr(ph, (2*i+2)::INT, 1))-1 AS v
       |  FROM b),
       |bs AS (SELECT media_id, blk, sum(v)::BIGINT AS bsum FROM pv GROUP BY 1, 2),
       |tot AS (SELECT media_id, sum(bsum)::BIGINT AS total FROM bs GROUP BY 1),
       |hbits AS (
       |  SELECT bs.media_id,
       |    sum(CASE WHEN 60 * bsum > total THEN (1::BIGINT << blk::INT) ELSE 0 END)::BIGINT AS phash
       |  FROM bs JOIN tot USING (media_id) GROUP BY 1),
       |hh AS (
       |  SELECT m.media_id, coalesce(hbits.phash, 0)::BIGINT AS phash
       |  FROM media m LEFT JOIN hbits USING (media_id))""".stripMargin

  val oracles: Map[String, String] = Map(
    "mm_phash" ->
      s"""WITH media AS (
         |  SELECT doc_id AS media_id, lower(hex(encode(text))) AS ph,
         |         octet_length(encode(text))::BIGINT AS n
         |  FROM documents),
         |$phashCtes
         |SELECT media_id, phash FROM hh""".stripMargin,

    "mm_phash_pairs" ->
      s"""WITH media AS (
         |  SELECT doc_id AS media_id, lower(hex(encode(text))) AS ph,
         |         octet_length(encode(text))::BIGINT AS n
         |  FROM documents
         |  UNION ALL
         |  SELECT doc_id + 100000 AS media_id,
         |         lower(hex(encode('Z' || substr(text, 2)))) AS ph,
         |         octet_length(encode('Z' || substr(text, 2)))::BIGINT AS n
         |  FROM documents),
         |$phashCtes,
         |keyed AS (
         |  SELECT media_id, phash,
         |         (phash >> 0)  & 32767 AS bk0, (phash >> 15) & 32767 AS bk1,
         |         (phash >> 30) & 32767 AS bk2, (phash >> 45) & 32767 AS bk3
         |  FROM hh),
         |capped AS (
         |  SELECT *, count(*) OVER (PARTITION BY bk0) AS bk0_n,
         |            count(*) OVER (PARTITION BY bk1) AS bk1_n,
         |            count(*) OVER (PARTITION BY bk2) AS bk2_n,
         |            count(*) OVER (PARTITION BY bk3) AS bk3_n FROM keyed),
         |cand AS (
         |  SELECT a.media_id AS id_a, b.media_id AS id_b, a.phash AS h_a, b.phash AS h_b
         |  FROM capped a JOIN capped b ON a.bk0 = b.bk0 AND a.media_id < b.media_id
         |  WHERE a.bk0_n <= 1000
         |  UNION
         |  SELECT a.media_id, b.media_id, a.phash, b.phash
         |  FROM capped a JOIN capped b ON a.bk1 = b.bk1 AND a.media_id < b.media_id
         |  WHERE a.bk1_n <= 1000
         |  UNION
         |  SELECT a.media_id, b.media_id, a.phash, b.phash
         |  FROM capped a JOIN capped b ON a.bk2 = b.bk2 AND a.media_id < b.media_id
         |  WHERE a.bk2_n <= 1000
         |  UNION
         |  SELECT a.media_id, b.media_id, a.phash, b.phash
         |  FROM capped a JOIN capped b ON a.bk3 = b.bk3 AND a.media_id < b.media_id
         |  WHERE a.bk3_n <= 1000)
         |SELECT id_a, id_b,
         |       bit_count(xor(h_a::UBIGINT, h_b::UBIGINT))::BIGINT AS hamming
         |FROM cand
         |WHERE bit_count(xor(h_a::UBIGINT, h_b::UBIGINT)) <= 3""".stripMargin,
    "mm_media_meta" ->
      s"""SELECT doc_id AS media_id, $kindSql AS kind,
         |       octet_length(encode(text))::BIGINT AS n_bytes
         |FROM documents""".stripMargin,

    // Integrity mirror: both sides recomputed from the fixture formula —
    // actual = header overhead + body (PNG 33 / JPEG 34 incl. EOI / WAV
    // 44 / BMFF 240), declared = RIFF 44 + id-derived data size, BMFF
    // 240 + body, images NULL.
    "mm_integrity_audit" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |    CASE doc_id % 4 WHEN 2 THEN 'audio' WHEN 3 THEN 'video'
        |         ELSE 'image' END AS kind,
        |    octet_length(encode(text))::BIGINT AS body_len,
        |    doc_id AS id
        |  FROM documents),
        |v AS (
        |  SELECT media_id, kind,
        |    (CASE kind WHEN 'audio' THEN 44 + body_len
        |               WHEN 'video' THEN 240 + body_len
        |               ELSE CASE WHEN id % 4 = 0 THEN 33 + body_len
        |                         ELSE 34 + body_len END
        |     END)::BIGINT AS n_bytes,
        |    (CASE kind WHEN 'audio' THEN 44 + (id % 100 + 1) * 1000
        |               WHEN 'video' THEN 240 + body_len END)::BIGINT AS declared_bytes
        |  FROM m)
        |SELECT media_id, kind, n_bytes,
        |       coalesce(declared_bytes, 0)::BIGINT AS declared_bytes,
        |       CASE WHEN declared_bytes IS NULL THEN 'undeclared'
        |            WHEN declared_bytes = n_bytes THEN 'consistent'
        |            ELSE 'mismatch' END AS verdict,
        |       coalesce(declared_bytes - n_bytes, 0)::BIGINT AS delta
        |FROM v""".stripMargin,

    // The full chain of mm_phash_pairs plus a recursive reachability
    // closure: losers are members whose component holds a smaller id.
    "mm_pipeline_e2e" ->
      s"""WITH RECURSIVE media AS (
         |  SELECT doc_id AS media_id, lower(hex(encode(text))) AS ph,
         |         octet_length(encode(text))::BIGINT AS n
         |  FROM documents
         |  UNION ALL
         |  SELECT doc_id + 100000 AS media_id,
         |         lower(hex(encode('Z' || substr(text, 2)))) AS ph,
         |         octet_length(encode('Z' || substr(text, 2)))::BIGINT AS n
         |  FROM documents),
         |$phashCtes,
         |keyed AS (
         |  SELECT media_id, phash,
         |         (phash >> 0)  & 32767 AS bk0, (phash >> 15) & 32767 AS bk1,
         |         (phash >> 30) & 32767 AS bk2, (phash >> 45) & 32767 AS bk3
         |  FROM hh),
         |capped AS (
         |  SELECT *, count(*) OVER (PARTITION BY bk0) AS bk0_n,
         |            count(*) OVER (PARTITION BY bk1) AS bk1_n,
         |            count(*) OVER (PARTITION BY bk2) AS bk2_n,
         |            count(*) OVER (PARTITION BY bk3) AS bk3_n FROM keyed),
         |cand AS (
         |  SELECT a.media_id AS id_a, b.media_id AS id_b, a.phash AS h_a, b.phash AS h_b
         |  FROM capped a JOIN capped b ON a.bk0 = b.bk0 AND a.media_id < b.media_id
         |  WHERE a.bk0_n <= 1000
         |  UNION
         |  SELECT a.media_id, b.media_id, a.phash, b.phash
         |  FROM capped a JOIN capped b ON a.bk1 = b.bk1 AND a.media_id < b.media_id
         |  WHERE a.bk1_n <= 1000
         |  UNION
         |  SELECT a.media_id, b.media_id, a.phash, b.phash
         |  FROM capped a JOIN capped b ON a.bk2 = b.bk2 AND a.media_id < b.media_id
         |  WHERE a.bk2_n <= 1000
         |  UNION
         |  SELECT a.media_id, b.media_id, a.phash, b.phash
         |  FROM capped a JOIN capped b ON a.bk3 = b.bk3 AND a.media_id < b.media_id
         |  WHERE a.bk3_n <= 1000),
         |nd AS (SELECT id_a, id_b FROM cand
         |       WHERE bit_count(xor(h_a::UBIGINT, h_b::UBIGINT)) <= 3),
         |edges AS (
         |  SELECT id_a AS src, id_b AS dst FROM nd
         |  UNION SELECT id_b, id_a FROM nd),
         |reach(src, dst) AS (
         |  SELECT src, dst FROM edges
         |  UNION
         |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
         |losers AS (
         |  SELECT src AS media_id FROM reach GROUP BY src
         |  HAVING least(src, min(dst)) < src)
         |SELECT m.media_id, m.n AS n_bytes, h.phash
         |FROM media m JOIN hh h ON m.media_id = h.media_id
         |WHERE m.media_id NOT IN (SELECT media_id FROM losers)""".stripMargin,

    "mm_frame_sample" ->
      s"""SELECT doc_id AS media_id, unnest(range(0, octet_length(encode(text)), 128)) AS frame_offset
         |FROM documents WHERE $kindSql = 'video'""".stripMargin,

    // Per-frame mirror: same stride series, frame window sliced from the
    // payload's HEX form (DuckDB blobs don't slice, but substr on the hex
    // string clamps at the end exactly like Spark's binary substring —
    // byte i = hex chars 2i+1..2i+2), then the same (a*31 + byte) % 2^31
    // fold as mm_features over the window.
    "mm_frame_features" ->
      s"""WITH m AS (
         |  SELECT doc_id AS media_id, lower(hex(encode(text))) AS ph,
         |         octet_length(encode(text))::BIGINT AS n_bytes
         |  FROM documents WHERE $kindSql = 'video' AND octet_length(encode(text)) > 0),
         |f AS (
         |  SELECT media_id, ph, n_bytes,
         |         unnest(generate_series(0, n_bytes - 1, 64)) AS frame_offset
         |  FROM m),
         |sl AS (
         |  SELECT media_id, frame_offset,
         |         least(64, n_bytes - frame_offset)::BIGINT AS frame_bytes,
         |         substr(ph, (2 * frame_offset + 1)::INT, 128) AS fh
         |  FROM f),
         |bytes AS (
         |  SELECT media_id, frame_offset, frame_bytes,
         |    list_transform(range(0, len(fh) // 2),
         |      i -> 16*(strpos('0123456789abcdef', substr(fh, (2*i+1)::INT, 1))-1)
         |         + strpos('0123456789abcdef', substr(fh, (2*i+2)::INT, 1))-1) AS bs
         |  FROM sl)
         |SELECT media_id, frame_offset, frame_bytes,
         |  list_reduce(list_prepend(0::BIGINT, bs), (a, x) -> (a*31 + x) % 2147483648) AS frame_checksum
         |FROM bytes""".stripMargin,

    // md5 over the hex form of the payload (DuckDB md5 is VARCHAR-only;
    // hex is injective, so grouping is exact content identity). Both
    // engines emit uppercase hex for blobs.
    "mm_exact_dedup" ->
      """SELECT md5(hex(encode(text))) AS payload_md5,
        |  min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY 1""".stripMargin,

    // The decode stub's byte-fold checksum `(acc*31 + byte) mod 2^31` and
    // the per-kind dimension math, byte-for-byte over the UTF-8 payload
    // (bytes recovered from hex(blob) two chars at a time).
    "mm_features" ->
      s"""WITH media AS (
         |  SELECT doc_id AS media_id, $kindSql AS kind, encode(text) AS payload
         |  FROM documents),
         |bytes AS (
         |  SELECT media_id, kind, octet_length(payload)::BIGINT AS n_bytes,
         |    list_transform(range(0, octet_length(payload)),
         |      i -> 16*(strpos('0123456789abcdef', substr(lower(hex(payload)), (2*i+1)::INT, 1))-1)
         |         + strpos('0123456789abcdef', substr(lower(hex(payload)), (2*i+2)::INT, 1))-1) AS bs
         |  FROM media),
         |cs AS (
         |  SELECT media_id, kind, n_bytes,
         |    list_reduce(list_prepend(0::BIGINT, bs), (a, x) -> (a*31 + x) % 2147483648) AS c
         |  FROM bytes)
         |SELECT media_id, kind, n_bytes,
         |  (CASE WHEN kind = 'image' THEN c % 1920 + 1
         |        WHEN kind = 'audio' THEN 1
         |        ELSE c % 3840 + 1 END)::INT AS width,
         |  (CASE WHEN kind = 'image' THEN c % 1080 + 1
         |        WHEN kind = 'audio' THEN 1
         |        ELSE c % 2160 + 1 END)::INT AS height,
         |  (CASE WHEN kind = 'image' THEN 0.0
         |        WHEN kind = 'audio' THEN (n_bytes % 600)::DOUBLE + (c % 1000)::DOUBLE / 1000.0
         |        ELSE (n_bytes % 7200)::DOUBLE END) AS duration_s
         |FROM cs""".stripMargin,

    // mm_decode_meta mirror: every field from the fixture's id-derived
    // formula (header sizes: PNG 33 B, JPEG 34 B, WAV 44 B, MP4 240 B
    // around the UTF-8 body; WAV duration is exact integer division of
    // declared data bytes by byte rate, MP4 duration of mvhd duration
    // ticks by the mvhd timescale).
    "mm_decode_meta" ->
      """SELECT doc_id AS media_id,
        |  CASE doc_id % 4 WHEN 2 THEN 'audio' WHEN 3 THEN 'video'
        |       ELSE 'image' END AS kind,
        |  (octet_length(encode(text))
        |    + CASE doc_id % 4 WHEN 0 THEN 33 WHEN 1 THEN 34
        |           WHEN 2 THEN 44 ELSE 240 END)::BIGINT AS n_bytes,
        |  CASE doc_id % 4 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
        |       WHEN 2 THEN 'wav' ELSE 'mp4' END AS format,
        |  (CASE doc_id % 4 WHEN 0 THEN doc_id % 1920 + 1
        |        WHEN 1 THEN doc_id % 3840 + 1
        |        WHEN 3 THEN doc_id % 1280 + 16 END)::INT AS width,
        |  (CASE doc_id % 4 WHEN 0 THEN doc_id % 1080 + 1
        |        WHEN 1 THEN doc_id % 2160 + 1
        |        WHEN 3 THEN doc_id % 720 + 16 END)::INT AS height,
        |  (CASE WHEN doc_id % 4 = 2 THEN (doc_id // 4) % 2 + 1 END)::INT AS channels,
        |  (CASE WHEN doc_id % 4 = 2 THEN 8000 * ((doc_id // 4) % 4 + 1) END)::INT AS sample_rate,
        |  (CASE doc_id % 4
        |     WHEN 2 THEN ((doc_id % 100 + 1) * 1000) * 1000
        |       // (8000 * ((doc_id // 4) % 4 + 1) * ((doc_id // 4) % 2 + 1) * 2)
        |     WHEN 3 THEN ((doc_id % 50 + 1) * (600 * ((doc_id // 4) % 3 + 1))
        |                   + (doc_id % 7) * 37) * 1000
        |       // (600 * ((doc_id // 4) % 3 + 1))
        |   END)::BIGINT AS duration_ms
        |FROM documents""".stripMargin,

    // Aspect mirror: dims from the id formulas, the same scaled
    // integer errors, struct list_min tie-break.
    "mm_aspect_buckets" ->
      """WITH d AS (
        |  SELECT doc_id AS media_id,
        |    (CASE doc_id % 4 WHEN 0 THEN doc_id % 1920 + 1
        |          WHEN 1 THEN doc_id % 3840 + 1
        |          WHEN 3 THEN doc_id % 1280 + 16 END)::BIGINT AS width,
        |    (CASE doc_id % 4 WHEN 0 THEN doc_id % 1080 + 1
        |          WHEN 1 THEN doc_id % 2160 + 1
        |          WHEN 3 THEN doc_id % 720 + 16 END)::BIGINT AS height
        |  FROM documents WHERE doc_id % 4 <> 2),
        |e AS (
        |  SELECT media_id, width, height,
        |    list_min([
        |      {'e': abs(width*1 - height*1) * 144, 'i': 0},
        |      {'e': abs(width*3 - height*4) * 48, 'i': 1},
        |      {'e': abs(width*9 - height*16) * 16, 'i': 2},
        |      {'e': abs(width*4 - height*3) * 36, 'i': 3},
        |      {'e': abs(width*16 - height*9) * 9, 'i': 4}]) AS m
        |  FROM d)
        |SELECT media_id, width::INT AS width, height::INT AS height,
        |  ['1:1','4:3','16:9','3:4','9:16'][(struct_extract(m, 'i') + 1)::INT]
        |    AS aspect_bucket
        |FROM e""".stripMargin,

    "mm_exif_meta" ->
      """SELECT doc_id AS media_id,
        |  (octet_length(encode(text)) + 107)::BIGINT AS n_bytes,
        |  (doc_id % 8 + 1)::INT AS orientation,
        |  'Make'||(doc_id % 5) AS make,
        |  'Model'||(doc_id % 3) AS model,
        |  '2024:'||lpad((doc_id % 12 + 1)::VARCHAR, 2, '0')||':'
        |    ||lpad((doc_id % 28 + 1)::VARCHAR, 2, '0')||' '
        |    ||lpad((doc_id % 24)::VARCHAR, 2, '0')||':00:00' AS taken_at
        |FROM documents""".stripMargin,

    "mm_tiff_meta" ->
      """SELECT doc_id AS media_id, 'image' AS kind,
        |  (octet_length(encode(text)) + 50)::BIGINT AS n_bytes,
        |  'tiff' AS format,
        |  (doc_id % 2048 + 1)::INT AS width,
        |  (doc_id % 1536 + 1)::INT AS height,
        |  (CASE (doc_id // 2) % 3 WHEN 0 THEN 1 WHEN 1 THEN 3 ELSE 4 END)::INT AS channels,
        |  NULL::INT AS sample_rate,
        |  NULL::BIGINT AS duration_ms
        |FROM documents""".stripMargin,

    "mm_mp3_meta" ->
      """SELECT doc_id AS media_id, 'audio' AS kind,
        |  (octet_length(encode(text)) + 10 + doc_id % 17 + 4)::BIGINT AS n_bytes,
        |  'mp3' AS format,
        |  NULL::INT AS width,
        |  NULL::INT AS height,
        |  (CASE doc_id % 4 WHEN 3 THEN 1 ELSE 2 END)::INT AS channels,
        |  ([44100, 48000, 32000])[((doc_id // 2) % 3 + 1)::INT]::INT AS sample_rate,
        |  ((octet_length(encode(text)) + 4) * 8
        |    // ([32,40,48,56,64,80,96,112,128,160,192,224,256,320])[(doc_id % 14 + 1)::INT]
        |  )::BIGINT AS duration_ms
        |FROM documents""".stripMargin,

    // FLAC: 42 header bytes before the body; OGG: 58-byte BOS page +
    // 27-byte EOS header + (len//255 + 1) lacing bytes + the body.
    "mm_flacogg_meta" ->
      """SELECT doc_id AS media_id, 'audio' AS kind,
        |  (octet_length(encode(text)) + CASE doc_id % 2 WHEN 0 THEN 42
        |     ELSE 86 + octet_length(encode(text)) // 255 END)::BIGINT AS n_bytes,
        |  CASE doc_id % 2 WHEN 0 THEN 'flac' ELSE 'ogg' END AS format,
        |  NULL::INT AS width,
        |  NULL::INT AS height,
        |  ((doc_id // 2) % 2 + 1)::INT AS channels,
        |  (CASE doc_id % 2 WHEN 0 THEN 8000 * ((doc_id // 2) % 6 + 1)
        |        ELSE 11025 * ((doc_id // 2) % 4 + 1) END)::INT AS sample_rate,
        |  (CASE doc_id % 2
        |     WHEN 0 THEN ((doc_id % 100 + 1) * 1000 * 1000)
        |                   // (8000 * ((doc_id // 2) % 6 + 1))
        |     ELSE ((doc_id % 50 + 1) * 2000 * 1000)
        |            // (11025 * ((doc_id // 2) % 4 + 1))
        |   END)::BIGINT AS duration_ms
        |FROM documents""".stripMargin,

    // WebP: header overhead 30 B (VP8 /VP8X) or 25 B (VP8L); channels
    // 3 + alpha, where lossy VP8 never carries alpha.
    "mm_webp_meta" ->
      """SELECT doc_id AS media_id, 'image' AS kind,
        |  (octet_length(encode(text))
        |    + CASE doc_id % 3 WHEN 1 THEN 25 ELSE 30 END)::BIGINT AS n_bytes,
        |  'webp' AS format,
        |  (CASE doc_id % 3 WHEN 0 THEN doc_id % 3000 + 1
        |        WHEN 1 THEN doc_id % 2048 + 1
        |        ELSE doc_id % 4096 + 1 END)::INT AS width,
        |  (CASE doc_id % 3 WHEN 0 THEN doc_id % 1700 + 1
        |        WHEN 1 THEN doc_id % 1365 + 1
        |        ELSE doc_id % 2304 + 1 END)::INT AS height,
        |  (CASE doc_id % 3 WHEN 0 THEN 3
        |        ELSE 3 + (doc_id // 3) % 2 END)::INT AS channels,
        |  NULL::INT AS sample_rate,
        |  NULL::BIGINT AS duration_ms
        |FROM documents""".stripMargin,

    "mm_gifbmp_meta" ->
      """SELECT doc_id AS media_id, 'image' AS kind,
        |  (octet_length(encode(text))
        |    + CASE doc_id % 2 WHEN 0 THEN 14 ELSE 54 END)::BIGINT AS n_bytes,
        |  CASE doc_id % 2 WHEN 0 THEN 'gif' ELSE 'bmp' END AS format,
        |  (CASE doc_id % 2 WHEN 0 THEN doc_id % 1024 + 1
        |        ELSE doc_id % 800 + 1 END)::INT AS width,
        |  (CASE doc_id % 2 WHEN 0 THEN doc_id % 640 + 1
        |        ELSE doc_id % 600 + 1 END)::INT AS height,
        |  (CASE WHEN doc_id % 2 = 1 THEN
        |     CASE (doc_id // 2) % 3 WHEN 0 THEN 1 WHEN 1 THEN 3 ELSE 4 END
        |   END)::INT AS channels,
        |  NULL::INT AS sample_rate,
        |  NULL::BIGINT AS duration_ms
        |FROM documents""".stripMargin,

    // resizeTo(640, 480): aspect-preserving fit of the mm_features
    // dimensions — scale = min(maxW/w, maxH/h, 1), floor, clamp ≥ 1.
    "mm_resize" ->
      s"""WITH media AS (
         |  SELECT doc_id AS media_id, $kindSql AS kind, encode(text) AS payload
         |  FROM documents),
         |bytes AS (
         |  SELECT media_id, kind,
         |    list_transform(range(0, octet_length(payload)),
         |      i -> 16*(strpos('0123456789abcdef', substr(lower(hex(payload)), (2*i+1)::INT, 1))-1)
         |         + strpos('0123456789abcdef', substr(lower(hex(payload)), (2*i+2)::INT, 1))-1) AS bs
         |  FROM media),
         |cs AS (
         |  SELECT media_id, kind,
         |    list_reduce(list_prepend(0::BIGINT, bs), (a, x) -> (a*31 + x) % 2147483648) AS c
         |  FROM bytes),
         |dims AS (
         |  SELECT media_id,
         |    (CASE WHEN kind = 'image' THEN c % 1920 + 1
         |          WHEN kind = 'audio' THEN 1
         |          ELSE c % 3840 + 1 END)::INT AS width,
         |    (CASE WHEN kind = 'image' THEN c % 1080 + 1
         |          WHEN kind = 'audio' THEN 1
         |          ELSE c % 2160 + 1 END)::INT AS height
         |  FROM cs),
         |scaled AS (
         |  SELECT *, least(640.0 / width, least(480.0 / height, 1.0)) AS s FROM dims)
         |SELECT media_id, width, height,
         |  greatest(floor(width * s)::INT, 1) AS resized_w,
         |  greatest(floor(height * s)::INT, 1) AS resized_h
         |FROM scaled""".stripMargin
  )
}
