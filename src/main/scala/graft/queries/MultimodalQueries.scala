package graft.queries

import graft.ops.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column queries: a deterministic media table synthesized from
  * `documents` (UTF-8 payload bytes), exercising binary columns, metadata
  * extraction, frame sampling, and the batched decode plumbing.
  * `mm_features` has no oracle (the decode stub is JVM-side by design) —
  * the driver records a rows-only check; scalatest pins its values.
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

    // Batched decode + feature extraction (stubbed codec, real plumbing).
    "mm_features" -> ((s, dir) =>
      Multimodal.extractFeatures(media(s, dir)))
  )

  private val kindSql = "(['image','audio','video'])[(doc_id % 3 + 1)::INT]"

  val oracles: Map[String, String] = Map(
    "mm_media_meta" ->
      s"""SELECT doc_id AS media_id, $kindSql AS kind,
         |       octet_length(encode(text))::BIGINT AS n_bytes
         |FROM documents""".stripMargin,

    "mm_frame_sample" ->
      s"""SELECT doc_id AS media_id, unnest(range(0, octet_length(encode(text)), 128)) AS frame_offset
         |FROM documents WHERE $kindSql = 'video'""".stripMargin
    // mm_features: intentionally no oracle (JVM decode stub) — rows-only.
  )
}
