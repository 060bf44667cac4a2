package graft.ops

import graft.expressions.TextSketches
import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document-corpus analysis operators: token statistics, quality scoring,
  * language identification, fingerprinting. All per-row column math
  * (codegen, no shuffle, no UDFs) — at 100 TB these run at parquet scan
  * speed with full column pruning (only the text column is read).
  */
object TextAnalysis {

  /** Token statistics per document. */
  def tokenStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = tokens(col(textCol))
    docs.select(col(idCol),
      size(t).cast("long").as("n_tokens"),
      size(array_distinct(t)).cast("long").as("n_distinct"),
      meanTokenLength(t).as("mean_token_len"),
      typeTokenRatio(t).as("type_token_ratio"))
  }

  /** Quality signals + composite score per document. */
  def qualityScores(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = tokens(col(textCol))
    docs.select(col(idCol),
      length(col(textCol)).cast("long").as("n_chars"),
      size(t).cast("long").as("n_tokens"),
      stopwordRatio(t).as("stopword_ratio"),
      punctRatio(col(textCol)).as("punct_ratio"),
      qualityScore(col(textCol)).as("quality"))
  }

  /** Stopword sets per language for the n-gram/stopword language-ID
    * heuristic. Membership counting only — deterministic. */
  val LangStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "of", "and", "to", "in", "is", "that", "it", "for", "with"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "por", "con", "los"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "en", "un", "du", "que"),
    "de" -> Seq("der", "die", "und", "das", "von", "zu", "mit", "den", "ein", "ist"),
    "zh" -> Seq("的", "了", "是", "在", "我", "有", "和", "就", "不", "人"))

  /** Language-ID: count stopword hits per language, argmax with a
    * deterministic tie-break (count desc, language code asc), 'und' when
    * nothing matches. */
  def languageId(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // One native tokenization+membership pass → array of per-lang counts
    // (declared order); the argmax over 5 elements is cheap Column math.
    // Tie-break: max hits, then lexicographically smallest language code.
    val hitsArr = TextSketches.langHits(col(textCol), LangStopwords.map(_._2))
    val scored = LangStopwords.zipWithIndex.map { case ((lang, _), i) =>
      struct(element_at(col("__hits"), i + 1).as("hits"), lit(lang).as("lang"))
    }
    val arr = array(scored: _*)
    val maxHits = array_max(transform(arr, s => s.getField("hits")))
    val winner = array_min(transform(
      filter(arr, s => s.getField("hits") === maxHits),
      s => s.getField("lang")))
    docs.withColumn("__hits", hitsArr).select(col(idCol),
      when(maxHits === 0L, lit("und")).otherwise(winner).as("predicted_lang"),
      maxHits.as("stopword_hits"))
  }

  /** Content fingerprints: exact md5 of normalized text + a rolling
    * content hash (min of shingle hashes — stable under small reorders). */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String,
                   shingleWords: Int = 3): DataFrame =
    docs.select(col(idCol),
      fingerprint(col(textCol)).as("fingerprint"),
      TextSketches.shingleMinHash(col(textCol), shingleWords).as("content_hash"))
}
