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
                         shingleWords: Int = 3, minShared: Int = 2): DataFrame = {
    // tokens bound as a real attribute before shingling (lambda-inlining
    // rule, see TextFunctions.wordShingles)
    def grams(df: DataFrame, id: String, text: String, outId: String) =
      df.select(col(id).as(outId), tokens(col(text)).as("__toks"))
        .select(col(outId),
          explode(array_distinct(wordShingles(col("__toks"), shingleWords))).as("gram"))
    grams(docs, idCol, textCol, "doc_id")
      .join(broadcast(grams(bench, benchIdCol, benchTextCol, "bench_id")), "gram")
      .groupBy("doc_id", "bench_id")
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }

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
