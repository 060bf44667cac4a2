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

  /** Token statistics per document. Tokenization is bound to a real
    * attribute first (see repetitionRatio): four derived columns referencing
    * an inlined tokens(...) would each re-tokenize the full text per row. */
  def tokenStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col("__toks")
    docs.select(col(idCol), tokens(col(textCol)).as("__toks"))
      .select(col(idCol),
        size(t).cast("long").as("n_tokens"),
        size(array_distinct(t)).cast("long").as("n_distinct"),
        meanTokenLength(t).as("mean_token_len"),
        typeTokenRatio(t).as("type_token_ratio"))
  }

  /** Simpson diversity per document — the EXACT repeated-token collision
    * profile: n_tokens, n_distinct, collisions = Σ c·(c−1) over the
    * token multiset, and the Simpson repeat probability
    * collisions / (n·(n−1)) (the chance two tokens drawn without
    * replacement coincide; 1 − Gini-Simpson). The log-free twin of
    * Shannon-entropy diversity — every statistic is exact integer
    * arithmetic until the single final IEEE division, so the oracle
    * mirrors it bit-for-bit — and a sharper repetitiveness flag than
    * type-token ratio (a doc half-filled by ONE token scores far worse
    * than one with uniformly doubled types). Distributed shape: explode
    * → (doc, token) partial-agg → per-doc fold; both aggs map-side
    * combine, state bounded by distinct tokens per doc, never a
    * collect_list of the corpus. Docs of exactly 1 token report NULL
    * (undefined draw); zero-token docs are ABSENT from the output (the
    * explode drops them — under this repo's tokenizer only a null text
    * can produce zero tokens). */
  def simpsonDiversity(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), explode(tokens(col(textCol))).as("__t"))
      .groupBy(col(idCol), col("__t")).agg(count(lit(1)).as("__c"))
      .groupBy(col(idCol))
      .agg(sum(col("__c")).as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        sum(col("__c") * (col("__c") - 1)).as("collisions"))
      .withColumn("simpson",
        when(col("n_tokens") > 1,
          col("collisions").cast("double") /
            (col("n_tokens") * (col("n_tokens") - 1)).cast("double")))

  /** Quality signals + composite score per document. Shared tokenization
    * bound once, same as tokenStats. */
  def qualityScores(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col("__toks")
    docs.select(col(idCol), col(textCol), tokens(col(textCol)).as("__toks"))
      .select(col(idCol),
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

  /** PII-pattern scan counts per document (emails, URLs, phone-shaped
    * digit runs) — the screening pass a training-data pipeline runs before
    * masking/filtering. RE2-compatible patterns (no backtracking
    * constructs), so the same regexes run in the DuckDB oracle and, at
    * scale, in any RE2-based scrubber. Per-row regex extraction: scan
    * speed, no shuffle. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlRe = "https?://[^\\s]+"
  val PhoneRe = "\\+?[0-9][0-9()\\- ]{7,}[0-9]"

  def piiScan(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    docs.select(col(idCol),
      size(regexp_extract_all(t, lit(EmailRe), lit(0))).cast("long").as("n_emails"),
      size(regexp_extract_all(t, lit(UrlRe), lit(0))).cast("long").as("n_urls"),
      size(regexp_extract_all(t, lit(PhoneRe), lit(0))).cast("long").as("n_phones"))
      .withColumn("has_pii",
        col("n_emails") + col("n_urls") + col("n_phones") > 0L)
  }

  /** PII masking — the scrub pass [[piiScan]] screens for: emails, then
    * URLs, then phone-shaped digit runs are replaced with typed
    * placeholder tags. Replacement ORDER is part of the contract: emails
    * first (an address must not have its digits half-eaten by the phone
    * pattern), URLs second (query strings carry digit runs), phones last.
    * Same RE2-compatible patterns as the scan, so the masked output is
    * reproducible in any RE2-based scrubber; per-row regex rewrite — scan
    * speed, no shuffle, and the plan prunes to (id, text). */
  /** The masking expression itself — for callers that rewrite a text
    * column in place (e.g. scrub-on-ingest,
    * [[graft.streaming.CurationStream]]) rather than consuming the
    * (id, redacted, was_redacted) frame. */
  def piiRedactCol(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, lit(EmailRe), lit("<EMAIL>")),
        lit(UrlRe), lit("<URL>")),
      lit(PhoneRe), lit("<PHONE>"))

  def piiRedact(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // Bind both once so the three-regex rewrite runs a single time per
    // row; was_redacted is an exact inequality against the original (a
    // literal "<EMAIL>" already present in the source is not a rewrite).
    docs.select(col(idCol), col(textCol).as("__orig"),
        piiRedactCol(col(textCol)).as("redacted"))
      .select(col(idCol), col("redacted"),
        (col("redacted") =!= col("__orig")).as("was_redacted"))
  }

  /** Fixed-size token chunks with stride — the context-window preparation
    * step for training sequences and retrieval passages: chunk `i` covers
    * tokens `[i·stride, i·stride + chunkSize)`, so consecutive chunks
    * overlap by `chunkSize - stride` tokens (stride = chunkSize ⇒
    * disjoint). A chunk starts at every stride boundary `< n_tokens`, so
    * the final chunk may be short but no token is left uncovered.
    *
    * Per-row column math: tokenize once, `sequence` generates the stride
    * starts, one `posexplode` + `slice` emits the chunks — no shuffle, no
    * UDF, and output order is a pure function of the row (chunk_id =
    * start div stride, exact). At 100 TB this runs at scan speed and the
    * fan-out (≈ n_tokens/stride rows per doc) stays partition-local.
    *
    * Output: (idCol, chunk_id, n_chunk_tokens, chunk_text). */
  def chunkTokens(docs: DataFrame, idCol: String, textCol: String,
                  chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize >= 1, s"chunkSize must be >= 1: $chunkSize")
    require(stride >= 1, s"stride must be >= 1: $stride")
    // stride > chunkSize would leave (stride - chunkSize) tokens out of
    // every window — silently violating the full-coverage contract above.
    require(stride <= chunkSize,
      s"stride ($stride) must be <= chunkSize ($chunkSize): larger strides skip tokens")
    docs.select(col(idCol), tokens(col(textCol)).as("__toks"))
      .select(col(idCol), col("__toks"),
        posexplode(sequence(lit(0), size(col("__toks")) - 1, lit(stride))))
      .select(col(idCol), col("pos").cast("long").as("chunk_id"),
        slice(col("__toks"), col("col") + 1, lit(chunkSize)).as("__chunk"))
      .select(col(idCol), col("chunk_id"),
        size(col("__chunk")).cast("long").as("n_chunk_tokens"),
        array_join(col("__chunk"), " ").as("chunk_text"))
  }

  /** Top-k distinguishing terms per document by TF-IDF with a log-free
    * idf (`tf · N/df`): rank-equivalent to `tf · log(N/df)` within a
    * document for df-monotone comparisons, and — unlike log — exactly
    * reproducible across engines (only IEEE multiply/divide on exact
    * integers, no transcendental library variance).
    *
    * Plan shape at scale: one explode of the token column feeding a
    * (doc, term) partial-agg (map-side combine eats the duplicates), df
    * derived from the tf table (no second scan), a term-keyed shuffle join
    * against the vocabulary-sized df table, and a per-doc top-k window
    * that plans as WindowGroupLimit (partial top-k before its shuffle). */
  def tfIdfTopTerms(docs: DataFrame, idCol: String, textCol: String,
                    k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(tokens(col(textCol))).as("term"))
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("term"))
    tf.join(dfq, "term")
      .crossJoin(broadcast(n))
      .withColumn("score",
        col("tf").cast("double") * (col("n_docs").cast("double") / col("df").cast("double")))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= k)
      .select("doc_id", "term", "tf", "df", "score", "rnk")
  }

  /** Cross-corpus duplicated-span statistics per document: how much of a
    * document's word `n`-gram content appears elsewhere in the corpus
    * (count > 1 globally, including within-document repeats) — the span
    * duplication signal behind C4/Lee-et-al-style span dedup, surfaced as
    * a per-document rate so curation can threshold on it.
    *
    * Plan shape at scale: spans travel as 60-bit hashes (never the span
    * text), one partial-agg shuffle builds the global span-frequency
    * table, and one hash join flags each occurrence — no self-join, no
    * per-group state beyond a count. Output: (id, n_spans, n_dup_spans,
    * dup_rate). */
  def spanDupRate(docs: DataFrame, idCol: String, textCol: String,
                  n: Int = 3): DataFrame = {
    // Materialized once (eager, cleaner-reclaimed): the narrow (id, hash)
    // stream feeds both the global count agg and the flagging join —
    // without it each side re-tokenizes and re-hashes the corpus, which
    // doubles the operator's cost (measured 3.0 → 1.8 s at sf0.1).
    val grams = spanHashes(docs, idCol, textCol, n).localCheckpoint(true)
    val counts = grams.groupBy("__gh").agg(count(lit(1)).as("__n"))
    grams.join(counts, "__gh")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_spans"),
        sum(when(col("__n") > 1L, 1L).otherwise(0L)).as("n_dup_spans"))
      .withColumn("dup_rate",
        col("n_dup_spans").cast("double") / col("n_spans").cast("double"))
  }

  /** RAKE keyphrase extraction (Rose et al. 2010): candidate phrases are
    * maximal runs of non-stopword tokens (stopword positions break the
    * run via a per-doc running break count — the sessionize trick on
    * token positions); each word scores deg/freq where freq counts its
    * phrase occurrences and deg sums the lengths of the phrases it
    * appears in; a phrase scores the SUM of its words' scores, folded
    * in token order (deterministic IEEE order, mirrorable), and the
    * corpus top-`topN` distinct phrases win on (score desc, phrase).
    * Work: one tokenize pass, a phrase-run agg, a vocabulary-sized word
    * stats agg joined back broadcast-style, and a TakeOrderedAndProject
    * top-N — no corpus sort, no N² anywhere.
    * Output: (phrase, n_occurrences, score). */
  def rakeKeyphrases(docs: DataFrame, idCol: String, textCol: String,
                     stopwords: Seq[String], topN: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(idCol).orderBy("__pos")
    val marked = docs
      .select(col(idCol), posexplode(tokens(col(textCol)))
        .as(Seq("__pos", "__w")))
      .withColumn("__stop", col("__w").isInCollection(stopwords))
      .withColumn("__brk",
        sum(when(col("__stop"), 1L).otherwise(0L)).over(w))
    val phrases = marked.where(!col("__stop"))
      .groupBy(col(idCol), col("__brk"))
      .agg(expr("transform(array_sort(collect_list(struct(__pos, __w))), x -> x.__w)")
        .as("__ws"))
      .select(col(idCol), col("__brk"),
        col("__ws"), size(col("__ws")).cast("long").as("__plen"),
        concat_ws(" ", col("__ws")).as("phrase"))
      .localCheckpoint(true)
    val wstats = phrases
      .select(explode(col("__ws")).as("__w"), col("__plen"))
      .groupBy("__w")
      .agg(count(lit(1)).as("__freq"), sum(col("__plen")).as("__deg"))
      .withColumn("__wscore",
        col("__deg").cast("double") / col("__freq").cast("double"))
    phrases
      .select(col(idCol), col("__brk"), col("phrase"),
        posexplode(col("__ws")).as(Seq("__wpos", "__w")))
      .join(wstats.select("__w", "__wscore"), "__w")
      .groupBy(col(idCol), col("__brk"), col("phrase"))
      .agg(aggregate(
        array_sort(collect_list(struct(col("__wpos"), col("__wscore").as("v")))),
        lit(0.0), (acc, s) => acc + s.getField("v")).as("__score"))
      .groupBy("phrase")
      .agg(count(lit(1)).as("n_occurrences"), max(col("__score")).as("score"))
      .orderBy(col("score").desc, col("phrase")).limit(topN)
  }

  /** Per-document n-gram novelty: the share of a document's DISTINCT
    * word n-grams that occur in NO other document — the inverse signal
    * of [[spanDupRate]]: high novelty marks content the corpus has not
    * seen anywhere else (worth keeping at dedup time, worth up-weighting
    * in a mixture). Document frequency is computed over distinct
    * (doc, gram) pairs FIRST, so in-doc repetition cannot inflate a
    * gram's df — a doc that repeats its own phrase still counts it
    * novel if no other doc has it. One distinct pass + one gram-count
    * agg + one hash join, the same cost class as [[spanDupRate]]; the
    * rate is one IEEE division of exact longs. */
  def noveltyRate(docs: DataFrame, idCol: String, textCol: String,
                  n: Int = 3): DataFrame = {
    val grams = spanHashes(docs, idCol, textCol, n)
      .distinct().localCheckpoint(true)
    val dfreq = grams.groupBy("__gh").agg(count(lit(1)).as("__df"))
    grams.join(dfreq, "__gh")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("__df") === 1L, 1L).otherwise(0L)).as("n_unique"))
      .withColumn("novelty",
        col("n_unique").cast("double") / col("n_grams").cast("double"))
  }

  /** One row per word-`n`-gram occurrence, the span as its 60-bit hash:
    * (idCol, `__gh`). The exploded span stream [[spanDupRate]] and the
    * incremental span index ([[graft.streaming.CurationStream]]) share. */
  private[graft] def spanHashes(docs: DataFrame, idCol: String,
                                textCol: String, n: Int): DataFrame =
    docs
      .select(col(idCol), tokens(col(textCol)).as("__toks"))
      .select(col(idCol), explode(wordShingles(col("__toks"), n)).as("__g"))
      .select(col(idCol), hash60(col("__g")).as("__gh"))

  /** Gopher-style quality-rule cascade (Rae et al. 2021, arXiv:2112.11446
    * table A1, the subset that is exact cross-engine arithmetic): word
    * count bounds, mean-word-length bounds, symbol-to-word ratio ('#' and
    * '...'), fraction of words containing an alphabetic character, and
    * minimum distinct-stopword presence. Emits every signal AND its
    * per-rule verdict so a pipeline can both filter (`pass`) and audit
    * which rule fired. Per-row column math — scan speed, no shuffle. */
  def gopherRules(docs: DataFrame, idCol: String, textCol: String,
                  minWords: Int = 50, maxWords: Int = 100000,
                  minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
                  maxSymbolRatio: Double = 0.1, minAlphaFrac: Double = 0.8,
                  minStopwordKinds: Int = 2): DataFrame = {
    val t = col("__toks")
    val txt = col(textCol)
    val hashes = length(txt) - length(regexp_replace(txt, "#", ""))
    val ellipses = (length(txt) - length(regexp_replace(txt, "\\.\\.\\.", ""))) / 3
    val sw = array(graft.functions.TextFunctions.StopwordsEn.map(lit): _*)
    docs.select(col(idCol), txt, tokens(txt).as("__toks"))
      .select(col(idCol),
        size(t).cast("long").as("n_words"),
        meanTokenLength(t).as("mean_word_len"),
        ((hashes + ellipses).cast("double") / size(t).cast("double"))
          .as("symbol_ratio"),
        (size(filter(t, x => x.rlike("[A-Za-z]"))).cast("double")
          / size(t).cast("double")).as("alpha_frac"),
        size(array_intersect(array_distinct(t), sw)).cast("long")
          .as("stopword_kinds"))
      .withColumn("pass_word_count",
        col("n_words") >= minWords && col("n_words") <= maxWords)
      .withColumn("pass_mean_len",
        col("mean_word_len") >= minMeanLen && col("mean_word_len") <= maxMeanLen)
      .withColumn("pass_symbols", col("symbol_ratio") <= maxSymbolRatio)
      .withColumn("pass_alpha", col("alpha_frac") >= minAlphaFrac)
      .withColumn("pass_stopwords", col("stopword_kinds") >= minStopwordKinds)
      .withColumn("pass",
        col("pass_word_count") && col("pass_mean_len") && col("pass_symbols")
          && col("pass_alpha") && col("pass_stopwords"))
  }

  /** Out-of-vocabulary rate per document against the corpus' own top-k
    * vocabulary (count desc, token asc — a deterministic cut): the
    * garbage/non-text signal curation uses when no external vocabulary
    * ships with the corpus. The vocabulary is top-k by CONSTRUCTION, so it
    * broadcasts (k rows) and the flagging join is shuffle-free on the
    * corpus side; the vocabulary build itself is one explode + partial-agg
    * + global top-k (per-partition heaps, no global sort). */
  def oovRate(docs: DataFrame, idCol: String, textCol: String,
              vocabSize: Int = 1000): DataFrame = {
    // Materialized once (eager, cleaner-reclaimed): the (id, token) stream
    // feeds both the vocabulary build and the flagging join — the same
    // shared-stream shape spanDupRate materializes, and without it each
    // side re-scans and re-tokenizes the corpus.
    val toks = docs.select(col(idCol), explode(tokens(col(textCol))).as("__tok"))
      .localCheckpoint(true)
    val vocab = toks.groupBy("__tok").agg(count(lit(1)).as("__n"))
      .orderBy(col("__n").desc, col("__tok")).limit(vocabSize)
      .select(col("__tok"), lit(true).as("__iv"))
    toks.join(broadcast(vocab), Seq("__tok"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__iv").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_rate",
        col("n_oov").cast("double") / col("n_tokens").cast("double"))
  }

  /** Repetition ratio: fraction of duplicated word bigrams,
    * `1 − distinct(bigrams)/bigrams` — the classic boilerplate/spam
    * signal (model-generated and templated text repeats n-grams). Exact
    * integer ratio in double. */
  def repetitionRatio(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol), tokens(col(textCol)).as("__toks"))
      .select(col(idCol), wordShingles(col("__toks"), 2).as("__bg"))
      .select(col(idCol),
        size(col("__bg")).cast("long").as("n_bigrams"),
        size(array_distinct(col("__bg"))).cast("long").as("n_distinct_bigrams"))
      .withColumn("repetition_ratio",
        when(col("n_bigrams") === 0L, lit(0.0))
          .otherwise(lit(1.0) - col("n_distinct_bigrams").cast("double")
            / col("n_bigrams").cast("double")))

  /** Per-group composition drift: the L1 distance between each group's
    * hashed-term distribution and the whole corpus' — the monitoring
    * signal that flags a mis-crawled / contaminated / off-distribution
    * source (or ingest day) before it skews a training mixture. Terms
    * hash into `buckets` (the mirrored 60-bit hash), so per-group state
    * is `buckets` counters regardless of vocabulary size — the same
    * bounded-state trick as DSIR's hashed features — and drift is
    * `Σ_b |c_gb/n_g − C_b/N|` with every division an exact-input IEEE
    * op, folded in bucket order (engine-exact; L1 ∈ [0, 2]).
    *
    * Plan: one tokenize pass into a (group, bucket) partial-agg (≤
    * groups·buckets rows after map-side combine); totals and the corpus
    * distribution derive from that tiny table; the fold is
    * bucket-bounded. Output: (groupCol, n_tokens, l1_drift). */
  def sourceDrift(docs: DataFrame, groupCol: String, textCol: String,
                  buckets: Int = 256): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1: $buckets")
    val gb = docs
      .select(col(groupCol),
        explode(tokens(col(textCol))).as("term"))
      .select(col(groupCol),
        pmod(hash60(col("term")), lit(buckets.toLong)).as("bucket"))
      .groupBy(groupCol, "bucket").agg(count(lit(1)).as("c"))
      .localCheckpoint(true) // group totals, corpus buckets, grid all read it
    val gt = gb.groupBy(groupCol).agg(sum("c").as("n_tokens"))
    val cb = gb.groupBy("bucket").agg(sum("c").as("ct"))
    val tot = broadcast(cb.agg(sum("ct").as("N")))
    // grid = every (group, corpus bucket): a group missing a bucket
    // contributes |0 − C_b/N| — absent rows must still count
    val grid = gt.crossJoin(broadcast(cb))
      .join(gb, Seq(groupCol, "bucket"), "left")
      .crossJoin(tot)
      .select(col(groupCol), col("n_tokens"), col("bucket"),
        abs(coalesce(col("c"), lit(0L)).cast("double") / col("n_tokens").cast("double")
          - col("ct").cast("double") / col("N").cast("double")).as("__d"))
    grid.groupBy(groupCol)
      .agg(first(col("n_tokens")).as("n_tokens"),
        aggregate(
          array_sort(collect_list(struct(col("bucket"), col("__d").as("v")))),
          lit(0.0), (acc, s) => acc + s.getField("v")).as("l1_drift"))
      .select(col(groupCol), col("n_tokens"), col("l1_drift"))
  }

  /** EXACT φ-frequent heavy hitters with BOUNDED aggregation state —
    * the query a plain `GROUP BY value HAVING count ≥ φ·N` answers with
    * per-distinct-value state (vocabulary-sized at 100 TB), answered
    * here with ⌈1/φ⌉ counters per task:
    *
    *  1. per-partition Misra-Gries summaries (Misra & Gries 1982) keep
    *     at most ⌈phiDen/phiNum⌉ counters — on overflow every counter
    *     decrements and zeros evict (the classic step). An item with
    *     global frequency ≥ φ·N has frequency ≥ φ·n_p in SOME partition
    *     (averaging), and MG at capacity c retains any item with
    *     partition frequency > n_p/(c+1) — so the candidate union has
    *     NO FALSE NEGATIVES;
    *  2. one exact recount of the (≤ tasks·⌈1/φ⌉, broadcast) candidate
    *     set, then the exact integer threshold phiDen·cnt ≥ phiNum·N.
    *
    * The sketch only prunes the candidate space; the output is exactly
    * the φ-frequent set — which is why a plain GROUP BY/HAVING oracle
    * can hash-check it (`text_heavy_hitters`), independent of partition
    * count or arrival order. The only full passes are the count and the
    * semi-joined recount; per-task memory never depends on the
    * vocabulary. This is the rare justified `mapPartitions`: the
    * decrement-all eviction is genuinely per-partition imperative
    * state no Column expression holds. */
  def heavyHitters(df: DataFrame, valueCol: String,
                   phiNum: Int, phiDen: Int): DataFrame = {
    require(phiNum >= 1 && phiNum < phiDen,
      s"phi must be a rational in (0,1): $phiNum/$phiDen")
    val spark = df.sparkSession
    import spark.implicits._
    val cap = (phiDen + phiNum - 1) / phiNum
    val candidates = df.select(col(valueCol).cast("string")).as[String]
      .mapPartitions { it =>
        val m = scala.collection.mutable.HashMap.empty[String, Long]
        it.foreach { v =>
          if (m.contains(v)) m(v) += 1L
          else if (m.size < cap) m(v) = 1L
          else {
            m.mapValuesInPlace((_, c) => c - 1L)
            m.filterInPlace((_, c) => c > 0L)
          }
        }
        m.keysIterator
      }.toDF(valueCol).distinct()
    val total = df.count()
    df.join(broadcast(candidates), valueCol)
      .groupBy(valueCol).agg(count(lit(1)).as("cnt"))
      .where(lit(phiDen.toLong) * col("cnt") >= lit(phiNum.toLong) * lit(total))
  }
}
