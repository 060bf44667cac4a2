package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for large-scale training-data pipelines,
  * expressed as pure Column functions (whole-stage-codegen'd, zero UDFs,
  * zero shuffles — every operator here is per-row and scales linearly).
  *
  * Hashing is md5-based so every function is reproducible bit-for-bit in
  * the DuckDB oracle: `hash60(s)` = first 15 hex digits of md5 as a 60-bit
  * non-negative BIGINT (`('0x'||substr(md5(s),1,15))::BIGINT` in DuckDB).
  */
object TextFunctions {

  /** Whitespace tokenizer (the testdata corpus is space-separated). */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  /** Deterministic 60-bit hash of a string, identical in DuckDB. */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Normalized text: lowercase, trimmed, whitespace collapsed — the
    * canonical form for exact-dup fingerprints. */
  def normalize(c: Column): Column =
    regexp_replace(lower(trim(c)), "\\s+", " ")

  /** Exact-duplicate fingerprint (md5 of normalized text). */
  def fingerprint(c: Column): Column = md5(normalize(c))

  /** k-word shingles: `["a b c", "b c d", ...]` from the token array.
    *
    * PERFORMANCE: pass a BOUND column (a real attribute), not an
    * expression like `tokens(col("text"))` — Column lambdas inline their
    * argument, so an inlined `split` would re-tokenize the text once per
    * shingle position. Project the token array first (`.select(tokens(c)
    * .as("__toks"))`), then shingle the attribute. */
  def wordShingles(toks: Column, k: Int): Column =
    when(size(toks) < k, array(concat_ws(" ", toks)))
      .otherwise(transform(
        sequence(lit(1), size(toks) - (k - 1)),
        i => concat_ws(" ", slice(toks, i, lit(k)))))

  /** Character n-grams of the normalized text. Same binding rule as
    * [[wordShingles]]: `c` must be a bound attribute, and this function
    * normalizes it into a nested projection ONCE via a two-step select in
    * the caller when hot — see [[charNgramsOf]] for the pre-normalized
    * variant (the [[normalize]] regex inlined into the per-position lambda
    * cost ~12 s over 2.8k docs at sf0.1). */
  def charNgrams(c: Column, n: Int): Column = charNgramsOf(normalize(c), n)

  /** Character n-grams of an ALREADY-NORMALIZED bound string attribute —
    * the hot-path variant: bind `normalize(text)` as a real column first,
    * so the lambda references a cheap attribute instead of re-running the
    * normalization regex at every n-gram position. */
  def charNgramsOf(s: Column, n: Int): Column =
    when(length(s) < n, array(s))
      .otherwise(transform(sequence(lit(1), length(s) - (n - 1)),
        i => s.substr(i, lit(n))))

  /** MinHash/SimHash sketches live in
    * [[graft.expressions.TextSketches]] as native Catalyst expressions
    * (the transform/aggregate formulation evaluates interpreted and was
    * ~100x slower); LSH banding over a signature stays Column math. */
  def lshBandKeys(signature: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => concat(b.cast("string"), lit(":"),
        md5(concat_ws(",", slice(signature, b * rowsPerBand + 1, lit(rowsPerBand))))))

  /** Hamming distance between two SimHash values. */
  def hammingDistance(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b)).cast("long")

  /** Jaccard similarity of two string arrays (as distinct sets) — exact
    * integer set sizes, divided in double (bit-identical across engines). */
  def jaccard(a: Column, b: Column): Column = {
    val ad = array_distinct(a)
    val bd = array_distinct(b)
    val inter = size(array_intersect(ad, bd))
    val uni = size(array_union(ad, bd))
    when(uni === 0, lit(0.0)).otherwise(inter.cast("double") / uni.cast("double"))
  }

  /** Jaccard of two ALREADY-DISTINCT string arrays:
    * `|a∩b| / (|a| + |b| − |a∩b|)`. Same value as [[jaccard]] (set union
    * size by inclusion–exclusion, exact integers), but the per-pair cost
    * is ONE array_intersect instead of two array_distincts plus an
    * array_union — the verify stage deduplicates each document's set once,
    * not once per candidate pair. */
  def jaccardDistinct(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b))
    val uni = size(a) + size(b) - inter
    when(uni === 0, lit(0.0)).otherwise(inter.cast("double") / uni.cast("double"))
  }

  // ---- quality signals -----------------------------------------------

  /** English-ish stopwords used by quality scoring and language ID. */
  val StopwordsEn: Seq[String] = Seq(
    "the", "a", "an", "of", "to", "in", "and", "is", "it", "that", "for", "on", "with", "as")

  /** Fraction of tokens that are stopwords (exact int ratio → double). */
  def stopwordRatio(toks: Column, stopwords: Seq[String] = StopwordsEn): Column = {
    val sw = array(stopwords.map(lit): _*)
    when(size(toks) === 0, lit(0.0))
      .otherwise(size(filter(toks, t => array_contains(sw, t))).cast("double")
        / size(toks).cast("double"))
  }

  /** Mean token length (exact int ratio → double). */
  def meanTokenLength(toks: Column): Column =
    when(size(toks) === 0, lit(0.0))
      .otherwise(aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double")
        / size(toks).cast("double"))

  /** Type-token ratio: distinct tokens / tokens (lexical diversity). */
  def typeTokenRatio(toks: Column): Column =
    when(size(toks) === 0, lit(0.0))
      .otherwise(size(array_distinct(toks)).cast("double") / size(toks).cast("double"))

  /** Ratio of non-alphanumeric, non-space characters (punctuation/noise). */
  def punctRatio(c: Column): Column =
    when(length(c) === 0, lit(0.0))
      .otherwise(length(regexp_replace(c, "[A-Za-z0-9\\s]", "")).cast("double")
        / length(c).cast("double"))

  /** Composite quality score in [0,1]: blend of lexical diversity,
    * stopword presence, token-length sanity, and low punctuation noise.
    * Deterministic arithmetic over exact ratios. */
  def qualityScore(text: Column): Column = {
    val t = tokens(text)
    val lenScore = least(size(t).cast("double") / 100.0, lit(1.0))
    val diversity = typeTokenRatio(t)
    val stop = least(stopwordRatio(t) * 5.0, lit(1.0))
    val punct = lit(1.0) - least(punctRatio(text) * 4.0, lit(1.0))
    (lenScore + diversity + stop + punct) / 4.0
  }
}
