package graft.ops

import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: find training documents that share word
  * n-grams with an evaluation/benchmark set, so they can be dropped before
  * training (the standard leakage guard for LLM training corpora).
  *
  * Scale design: the benchmark side is small by construction (eval suites
  * are 10^3–10^5 docs, the corpus is 10^9+), so its distinct n-grams are
  * BROADCAST; the corpus side streams through scan → shingle → explode →
  * broadcast-hash-join, and non-matching grams (the overwhelming majority)
  * die inside the scan stage without ever shuffling. The only Exchange is
  * the (doc, bench) hit-count aggregation, whose input is bounded by the
  * number of *matches*, not corpus size. If the benchmark outgrows
  * broadcast range, swap the broadcast for a bloom pre-filter
  * ([[BloomJoin]]) in front of a shuffle join — same semantics.
  */
object Decontaminate {

  /** (doc, bench) pairs sharing ≥ `minShared` distinct `shingleWords`-word
    * n-grams, with the shared-gram count. Both sides' gram sets are
    * de-duplicated per document, so `n_shared` counts distinct grams. */
  def contaminationPairs(docs: DataFrame, idCol: String, textCol: String,
                         bench: DataFrame, benchIdCol: String, benchTextCol: String,
                         shingleWords: Int = 3, minShared: Int = 2): DataFrame =
    grams(docs, Seq(col(idCol).as("doc_id")), textCol, shingleWords)
      .join(broadcast(
        grams(bench, Seq(col(benchIdCol).as("bench_id")), benchTextCol, shingleWords)), "gram")
      .groupBy("doc_id", "bench_id")
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)

  /** Per-document contamination fraction against the POOLED benchmark
    * gram set — the decision rule training pipelines actually apply
    * (drop a document when ≥ `threshold` of its distinct n-grams appear
    * anywhere in the eval suite), vs [[contaminationPairs]]'s
    * per-(doc, bench) evidence counts.
    *
    * Scale: identical shape to [[contaminationPairs]] — the benchmark's
    * distinct grams broadcast; the corpus streams scan → shingle →
    * explode → broadcast LEFT join (hits and misses both counted, so
    * `n_grams` needs no second pass); the only Exchange is the per-doc
    * count aggregation. Every document keeps ≥ 1 gram ([[wordShingles]]
    * emits the whole-text shingle under `shingleWords` tokens), so the
    * explode never drops a document and `overlap_frac` never divides by
    * zero.
    *
    * Output: (doc_id, n_grams, n_shared, overlap_frac, contaminated). */
  def contaminationScores(docs: DataFrame, idCol: String, textCol: String,
                          bench: DataFrame, benchTextCol: String,
                          shingleWords: Int = 3,
                          threshold: Double = 0.5): DataFrame =
    contaminationScoresAgainst(docs, idCol, textCol,
      benchGramSet(bench, benchTextCol, shingleWords), shingleWords, threshold)

  /** The benchmark's distinct gram set — compute ONCE and reuse when the
    * same eval suite gates many corpora/deliveries (e.g. materialized at
    * stream start by [[graft.streaming.CurationStream]] instead of
    * re-shingling the suite every micro-batch). Output: (gram). */
  def benchGramSet(bench: DataFrame, benchTextCol: String,
                   shingleWords: Int = 3): DataFrame =
    grams(bench, Nil, benchTextCol, shingleWords).distinct()

  /** [[contaminationScores]] against a PRE-COMPUTED benchmark gram set
    * ([[benchGramSet]] output). The gram set rides a broadcast HINT (a
    * checkpointed/reused set carries no size stats, and an auto-demotion
    * to sort-merge would shuffle the corpus gram stream — the exact
    * exchange this shape avoids; eval suites are broadcast-sized by
    * construction). */
  def contaminationScoresAgainst(docs: DataFrame, idCol: String,
                                 textCol: String, benchGrams: DataFrame,
                                 shingleWords: Int = 3,
                                 threshold: Double = 0.5): DataFrame = {
    // Defensive distinct: a non-distinct gram set would multiply every
    // matching corpus gram through the join and silently corrupt BOTH
    // counts (a no-op on [[benchGramSet]] output — the set is eval-suite-
    // sized, so the dedup is broadcast-side cheap either way).
    val bg = broadcast(benchGrams.select(col("gram")).distinct()
      .withColumn("__hit", lit(1)))
    grams(docs, Seq(col(idCol).as("doc_id")), textCol, shingleWords)
      .join(bg, Seq("gram"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"), count(col("__hit")).as("n_shared"))
      .withColumn("overlap_frac",
        col("n_shared").cast("double") / col("n_grams").cast("double"))
      .withColumn("contaminated", col("overlap_frac") >= threshold)
  }

  /** One distinct-gram row per (kept columns, gram); tokens bound as an
    * attribute before shingling (lambda-inlining rule). The explode rides
    * a `col("*")` projection so `keep`'s aliases are applied exactly once
    * (re-stating an aliased column in a second select would reference the
    * pre-rename name and fail resolution). */
  private def grams(df: DataFrame, keep: Seq[org.apache.spark.sql.Column],
                    text: String, shingleWords: Int) =
    df.select(keep :+ tokens(col(text)).as("__toks"): _*)
      .select(col("*"),
        explode(array_distinct(wordShingles(col("__toks"), shingleWords))).as("gram"))
      .drop("__toks")

  /** The corpus with contaminated documents removed (anti-join on the
    * doc side of [[contaminationPairs]]). */
  def apply(docs: DataFrame, idCol: String, textCol: String,
            bench: DataFrame, benchIdCol: String, benchTextCol: String,
            shingleWords: Int = 3, minShared: Int = 2): DataFrame = {
    val hits = contaminationPairs(docs, idCol, textCol,
      bench, benchIdCol, benchTextCol, shingleWords, minShared)
      .select(col("doc_id").as("__contaminated"))
    docs.join(hits, col(idCol) === col("__contaminated"), "left_anti")
  }
}
