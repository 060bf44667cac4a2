package graft.queries

import graft.ops.{Bpe, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Text-analysis operators over the `documents` table. */
object TextQueries {

  private def docs(s: SparkSession, dir: String) = Tables(s, dir, "documents")

  /** Shared Viterbi-segmentation pipeline (corpus word counts →
    * ≤4-char piece vocabulary at freq ≥ 3 ∪ single chars → exact DP):
    * one copy feeding text_unigram_segment and text_unigram_em, so an
    * edit to the vocabulary rule hits both (the oracle pair shares
    * viterbiCtes the same way). Returns (word, cnt, len, n_pieces,
    * sum_freq, seq). */
  private def unigramSegmented(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val TF = graft.functions.TextFunctions
    val toks = docs(s, dir)
      .select(explode(TF.tokens(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .withColumn("len", length(col("word")).cast("int"))
      .localCheckpoint(true)
    val pieces = toks.select(col("cnt"), explode(expr(
      "flatten(transform(sequence(1, len), " +
        "s -> transform(sequence(1, least(4, len - s + 1)), " +
        "l -> substring(word, s, l))))")).as("piece"))
    val vocab = pieces.groupBy("piece").agg(sum(col("cnt")).as("freq"))
      .where(col("freq") >= 3 || length(col("piece")) === 1)
    graft.ops.Bpe.viterbiSegment(toks.select("word", "len"), vocab, maxLen = 12)
      .join(toks, "word")
  }

  /** text_grep_pruned fixture, built once per (session, sf dir): an
    * 8-file range-layout documents copy + its token-bloom sidecar (the
    * [[RelationalQueries]] statsPruneFixture pattern — a deployment
    * maintains the sidecar continuously; rebuilding per run would time
    * fixture construction, not the pruned read path). */
  private val grepFixtures =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def grepFixture(s: SparkSession, dir: String): (String, DataFrame) = {
    import org.apache.spark.sql.functions.col
    val base = grepFixtures.computeIfAbsent(
      s"${s.sparkContext.applicationId}:$dir", _ => {
        val b = java.nio.file.Paths.get(QueryTmp.dir("tokbloom"))
        docs(s, dir).repartitionByRange(8, col("doc_id"))
          .write.mode("overwrite").parquet(s"$b/documents")
        graft.io.StatsIndex.buildTokenBloom(s, s"$b/documents", "text")
          .coalesce(1).write.parquet(s"$b/stats")
        Runtime.getRuntime.addShutdownHook(new Thread(() => {
          import java.nio.file.{Files, Path}
          import java.util.Comparator
          try Files.walk(b).sorted(Comparator.reverseOrder[Path]())
            .forEach(p => Files.deleteIfExists(p): Unit)
          catch { case _: Throwable => () }
        }))
        b.toString
      })
    (s"$base/documents", s.read.parquet(s"$base/stats"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_token_stats" -> ((s, dir) =>
      TextAnalysis.tokenStats(docs(s, dir), "doc_id", "text")),
    "text_quality" -> ((s, dir) =>
      TextAnalysis.qualityScores(docs(s, dir), "doc_id", "text")),
    "text_langid" -> ((s, dir) =>
      TextAnalysis.languageId(docs(s, dir), "doc_id", "text")),

    // Degenerate-repetition detector (the "the the the…" filter for
    // looped LM output / boilerplate): per doc the longest run of one
    // repeated token and the token share inside runs ≥ 3. Runs via the
    // classic null-safe lag → new-run bit → running-sum run id — one
    // per-doc-ordered window pass (doc-bounded, like every text window
    // here), then two integer aggs and one division.
    "text_token_runs" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      val TF = graft.functions.TextFunctions
      val wOrd = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy("pos")
      val p = docs(s, dir)
        .select(col("doc_id"), posexplode(TF.tokens(col("text"))).as(Seq("pos", "tok")))
        .withColumn("__nw",
          when(lag(col("tok"), 1).over(wOrd) <=> col("tok"), 0L).otherwise(1L))
        .withColumn("__rid", sum(col("__nw")).over(wOrd))
      p.groupBy("doc_id", "__rid").agg(count(lit(1)).as("__len"))
        .groupBy("doc_id")
        .agg(sum(col("__len")).as("n_tokens"),
          max(col("__len")).as("max_run"),
          sum(when(col("__len") >= 3L, col("__len")).otherwise(0L))
            .as("run3_tokens"))
        .withColumn("run3_share",
          col("run3_tokens").cast("double") / col("n_tokens").cast("double"))
    }),

    // Positional proximity search: documents where the corpus's two
    // most frequent terms occur within ≤ 3 token positions (min
    // distance + close-pair count) — the WITHIN-k operator beside the
    // phrase index's exact-adjacency probes. Per-(doc, term) position
    // lists are capped at the first 100 occurrences (deterministic
    // prefix — the boundedness guard for stopword-dense docs at scale;
    // no doc in the fixture reaches it, so the oracle is exact).
    "text_proximity" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      val TF = graft.functions.TextFunctions
      val W = org.apache.spark.sql.expressions.Window
      val pos = docs(s, dir)
        .select(col("doc_id"),
          posexplode(TF.tokens(col("text"))).as(Seq("pos", "term")))
        .where(col("term") =!= "")
        .withColumn("__rn", row_number().over(
          W.partitionBy("doc_id", "term").orderBy("pos")))
        .where(col("__rn") <= 100)
        .localCheckpoint(true) // term ranking + both probe sides read it
      val top = pos.groupBy("term").agg(count(lit(1)).as("cf"))
        .withColumn("rk", row_number().over(
          W.orderBy(col("cf").desc, col("term"))))
        .where(col("rk") <= 2)
      def side(rk: Int, p: String) = pos
        .join(broadcast(top.where(col("rk") === rk).select("term")), "term")
        .select(col("doc_id"), col("pos").as(p))
      side(1, "__p1").join(side(2, "__p2"), "doc_id")
        .groupBy("doc_id")
        .agg(min(abs(col("__p1") - col("__p2"))).cast("long").as("min_dist"),
          sum(when(abs(col("__p1") - col("__p2")) <= 3, 1L).otherwise(0L))
            .as("n_close_pairs"))
        .where(col("n_close_pairs") >= 1)
    }),

    // Term burstiness (Church & Gale 1995): P(term recurs in a doc |
    // it appears) = df₂₊/df per term — bursty terms are topical
    // content, evenly-sprinkled terms are function words; the log-free
    // IR statistic that separates them without IDF. One (doc, term)
    // count pass; top-20 by collection frequency for bounded output.
    "text_burstiness" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      val TF = graft.functions.TextFunctions
      val dt = docs(s, dir)
        .select(col("doc_id"), explode(TF.tokens(col("text"))).as("term"))
        .where(col("term") =!= "")
        .groupBy("doc_id", "term").agg(count(lit(1)).as("c"))
      dt.groupBy("term")
        .agg(count(lit(1)).as("df"),
          sum(when(col("c") >= 2, 1L).otherwise(0L)).as("df2"),
          sum("c").as("cf"))
        .select(col("term"), col("df"), col("df2"), col("cf"),
          (col("df2").cast("double") / col("df").cast("double")).as("burstiness"))
        .orderBy(col("cf").desc, col("term")).limit(20)
    }),

    // Vocabulary concentration per source: the exact Gini coefficient
    // of the token-frequency distribution — G = (2·Σ i·f_i − (n+1)·Σf)
    // / (n·Σf) over frequency-ranked terms. The log-free concentration
    // twin of entropy: boilerplate-heavy sources read near 1, diverse
    // prose lower. All-integer rank/moment sums (one term-count pass +
    // one source-partitioned window), one final division.
    "text_vocab_gini" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      val TF = graft.functions.TextFunctions
      val tf = docs(s, dir)
        .select(col("source"), explode(TF.tokens(col("text"))).as("term"))
        .where(col("term") =!= "")
        .groupBy("source", "term").agg(count(lit(1)).as("f"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("source").orderBy(col("f"), col("term"))
      tf.withColumn("i", row_number().over(w).cast("long"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_terms"), sum("f").as("total_tokens"),
          sum(col("i") * col("f")).as("__s"))
        .select(col("source"), col("n_terms"), col("total_tokens"),
          ((lit(2L) * col("__s") - (col("n_terms") + 1L) * col("total_tokens"))
            .cast("double") /
            (col("n_terms") * col("total_tokens")).cast("double")).as("gini"))
    }),

    // Language-ID confusion matrix: predicted vs the corpus's declared
    // lang label, with the per-declared-label share — the classifier
    // eval a curation pipeline reads before trusting langid gates.
    // Taxonomy²-sized output; the share division is the only float.
    "text_langid_confusion" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      val pred = TextAnalysis.languageId(docs(s, dir), "doc_id", "text")
        .select(col("doc_id"), col("predicted_lang"))
      val joined = docs(s, dir).select(col("doc_id"), col("lang")).join(pred, "doc_id")
      val w = org.apache.spark.sql.expressions.Window.partitionBy("lang")
      joined.groupBy("lang", "predicted_lang").agg(count(lit(1)).as("n_docs"))
        .withColumn("share",
          col("n_docs").cast("double") / sum("n_docs").over(w).cast("double"))
    }),
    // Exact token-collision diversity (Simpson repeat probability) —
    // the log-free repetitiveness flag beside type-token ratio.
    "text_simpson_diversity" -> ((s, dir) =>
      TextAnalysis.simpsonDiversity(docs(s, dir), "doc_id", "text")),
    "text_fingerprint" -> ((s, dir) =>
      TextAnalysis.fingerprints(docs(s, dir), "doc_id", "text", shingleWords = 3)),

    // Exact Viterbi word segmentation (WordPiece/unigram-LM-flavored)
    // against a corpus-derived piece vocabulary — the tokenizer family's
    // DP half beside BPE's merge training: pieces are the ≤4-char
    // substrings occurring ≥3 times (all single chars unioned in for
    // coverage), frequencies weighted by token counts; each distinct
    // word ≤12 chars segments by the DETERMINISTIC integer objective
    // (fewest pieces, then max summed frequency, then lexicographic) —
    // no log-probs, so the optimum is engine-exact and the oracle
    // re-derives the SAME segmentation through a generated chained-CTE
    // DP (MATERIALIZED stages — a plain chain re-inlines exponentially,
    // the sim_ktruss lesson). Work: vocabulary-of-words-sized stages,
    // maxLen-bounded rounds, never corpus-sized.
    "text_unigram_segment" -> ((s, dir) =>
      unigramSegmented(s, dir)
        .select("word", "cnt", "n_pieces", "sum_freq", "seq")),

    // One hard-EM re-estimation round for the unigram-LM tokenizer
    // (SentencePiece's training loop with Viterbi counts as the
    // E-step): explode each word's optimal segmentation weighted by its
    // corpus count, sum per piece (exact LONGs), normalize once against
    // the broadcast scalar total — the piece-probability table that
    // would seed the NEXT Viterbi round. Vocabulary-sized output; the
    // only float is the final single division per piece.
    "text_unigram_em" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      val pc = unigramSegmented(s, dir)
        .select(col("cnt"), explode(split(col("seq"), " ")).as("piece"))
        .groupBy("piece").agg(sum(col("cnt")).as("n_uses"))
      val tot = pc.agg(sum("n_uses").as("__total"))
      pc.crossJoin(broadcast(tot))
        .select(col("piece"), col("n_uses"),
          (col("n_uses").cast("double") / col("__total").cast("double"))
            .as("prob"))
    }),

    // Heaps-law vocabulary growth curve: distinct terms seen after the
    // first k documents (k ∈ {16, 64, 256, 1024, 4096}, in a seeded
    // hash order so the curve is a pure function of the corpus) plus
    // the token count consumed — the "how fast does vocabulary grow"
    // readout behind tokenizer budgeting and the token-bloom sizing
    // note. Scale shape: doc ranks and cumulative tokens are two-phase
    // parallelRunningSums (never a single-task window); each term
    // contributes ONE (term, first_rank) row (min over its distinct
    // docs), and the checkpoint join is vocabulary×5 — vocabulary is
    // sublinear in the corpus (the law being measured).
    "text_heaps_curve" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      import s.implicits._
      val TF = graft.functions.TextFunctions
      val d = docs(s, dir).select(col("doc_id"),
          TF.hash60(concat(lit("heaps:"), col("doc_id").cast("string"))).as("h"),
          TF.tokens(col("text")).as("toks"))
        .withColumn("n_tokens", size(col("toks")).cast("long"))
        .localCheckpoint(true) // feeds two rank passes + the explode
      val ranked = graft.ops.Curation.parallelRunningSum(
        graft.ops.Curation.parallelRunningSum(
          d.withColumn("__one", lit(1L)), Nil, Seq("h", "doc_id"),
          "__one", "rank"),
        Nil, Seq("h", "doc_id"), "n_tokens", "cum_tokens")
        .localCheckpoint(true)
      val firstRank = ranked
        .select(col("rank"), explode(array_distinct(col("toks"))).as("term"))
        .groupBy("term").agg(min("rank").as("first_rank"))
      val n = ranked.agg(max("rank").as("__n"))
      val cks = Seq(16L, 64L, 256L, 1024L, 4096L).toDF("n_docs")
        .crossJoin(broadcast(n)).where(col("n_docs") <= col("__n"))
        .select("n_docs").localCheckpoint(true)
      val vocab = firstRank.crossJoin(broadcast(cks))
        .where(col("first_rank") <= col("n_docs"))
        .groupBy("n_docs").agg(count(lit(1)).as("vocab_size"))
      val toksAt = ranked.join(broadcast(cks), col("rank") === col("n_docs"))
        .select(col("n_docs"), col("cum_tokens"))
      vocab.join(toksAt, "n_docs")
    }),

    // "Grep the lake" through the token-bloom sidecar: which raw files
    // mention a term AT ALL (PII incident response, trigger-phrase
    // audits) — the access path nothing else serves: min/max is
    // meaningless on prose and the BM25/phrase indexes answer RANKED
    // queries over their own layout, not raw-file membership. The probe
    // opens only bloom-candidate files (StatsIndexSpec asserts the
    // files-actually-read shrink; 'dup' lives in the planted near-dup
    // docs, clustered in id space, so the range layout genuinely
    // prunes), then applies the exact token predicate — row-identical
    // to the full scan the oracle runs.
    "text_grep_pruned" -> ((s, dir) => {
      import org.apache.spark.sql.functions.col
      val (t, stats) = grepFixture(s, dir)
      graft.io.StatsIndex.prunedReadToken(s, t, stats, "text", "dup")
        .select(col("doc_id"), col("lang"), col("source"))
    }),

    // Dataset card in one row — the summary block every corpus release
    // ships (n_docs, token total/mean, language spread, majority-lang
    // share, exact-dup rate): ONE partial-agg pass over per-row
    // derivations (token count, exact fingerprint), exact LONG counts
    // into two mirrored IEEE divisions. The distinct-fingerprint term is
    // the only second exchange; at 100 TB swap it for the HLL register
    // fold the sketch family already maintains (documented, same shape
    // as events_unique_users' swap note).
    "text_corpus_report" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      val TF = graft.functions.TextFunctions
      docs(s, dir)
        .select(col("lang"),
          size(TF.tokens(col("text"))).cast("long").as("n_tokens"),
          TF.fingerprint(col("text")).as("f"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("total_tokens"),
          countDistinct(col("f")).as("n_unique"),
          countDistinct(col("lang")).as("n_langs"),
          sum(when(col("lang") === "en", 1L).otherwise(0L)).as("n_en"))
        .select(col("n_docs"), col("total_tokens"), col("n_unique"),
          col("n_langs"), col("n_en"),
          (col("total_tokens").cast("double") / col("n_docs").cast("double"))
            .as("mean_tokens"),
          ((col("n_docs") - col("n_unique")).cast("double") /
            col("n_docs").cast("double")).as("dup_rate"))
    }),

    // Top-5 quality documents per language (curation shortlist; plans as
    // WindowGroupLimit — partial top-k before the shuffle).
    // Per-domain quality floor: drop each source's bottom 20% by quality
    // percent_rank (FineWeb-style curation rule; exact integer-ratio
    // rank math, engine-portable — see Curation.qualityFloor).
    "text_quality_floor" -> ((s, dir) => {
      import graft.ops.{Curation, TextAnalysis}
      val scored = TextAnalysis.qualityScores(docs(s, dir), "doc_id", "text")
        .join(docs(s, dir).select("doc_id", "source"), "doc_id")
        .select("source", "doc_id", "quality")
      Curation.qualityFloor(scored, "source", "quality", "doc_id", dropFrac = 0.2)
    }),

    // The sortless floor: per-domain quantile-sketch cutoff + scan filter
    // instead of a per-domain rank — the shape that survives one domain
    // dominating the corpus (no sort; bounded sketch state per domain).
    "text_quality_cutoff" -> ((s, dir) => {
      import graft.ops.{Curation, TextAnalysis}
      val scored = TextAnalysis.qualityScores(docs(s, dir), "doc_id", "text")
        .join(docs(s, dir).select("doc_id", "source"), "doc_id")
        .select("source", "doc_id", "quality")
      Curation.qualityFloorByCutoff(scored, "source", "quality", dropFrac = 0.2)
    }),

    "text_topk_quality" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("lang").orderBy(col("quality").desc, col("doc_id"))
      TextAnalysis.qualityScores(docs(s, dir), "doc_id", "text")
        .join(docs(s, dir).select("doc_id", "lang"), "doc_id")
        .withColumn("rn", row_number().over(w).cast("long"))
        .where(col("rn") <= 5)
        .select("lang", "doc_id", "quality", "rn")
    }),

    // Corpus-level vocabulary: top-20 word bigrams by frequency. Explode →
    // partial agg (map-side combine eats per-doc duplicates) → top-N via
    // TakeOrderedAndProject (per-partition heaps, no global sort) — the
    // corpus-statistics shape that survives 100 TB. Full (n desc, bigram)
    // tie-break keeps the cut boundary deterministic.
    "text_top_ngrams" -> ((s, dir) => {
      import graft.functions.TextFunctions.{tokens, wordShingles}
      import org.apache.spark.sql.functions._
      docs(s, dir)
        .select(tokens(col("text")).as("__toks"))
        .select(explode(wordShingles(col("__toks"), 2)).as("bigram"))
        .groupBy("bigram")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("bigram"))
        .limit(20)
    }),

    // Vocabulary coverage curve: what share of all token OCCURRENCES the
    // top-k vocabulary covers, at k ∈ {10, 100, 1k, 10k} — the tokenizer-
    // budget question (how big must a vocab be before <unk> is rare).
    // One tokenize pass → vocabulary-sized term counts; the frequency-
    // rank and the cumulative occurrence sum are BOTH two-phase
    // parallelRunningSums over the deterministic (count desc, term)
    // order — no single-task global window over the vocabulary — and a
    // checkpoint past the vocabulary clamps to the last rank. Exact
    // integers to one share division per row.
    "text_vocab_coverage" -> ((s, dir) => {
      import graft.functions.TextFunctions.tokens
      import graft.ops.Curation
      import org.apache.spark.sql.functions._
      import s.implicits._
      val counts = docs(s, dir)
        .select(explode(tokens(col("text"))).as("term"))
        .groupBy("term").agg(count(lit(1)).as("__c"))
        .withColumn("__neg", -col("__c"))
        .localCheckpoint(true) // two rank passes + the totals agg read it
      val cum = Curation.parallelRunningSum(counts, Nil,
          Seq("__neg", "term"), "__c", "__cum")
        .select("term", "__neg", "__c", "__cum")
      val ranked = Curation.parallelRunningSum(
          cum.withColumn("__one", lit(1L)), Nil,
          Seq("__neg", "term"), "__one", "__rank")
        .select("__rank", "__cum")
      val totals = counts.groupBy()
        .agg(sum(col("__c")).as("__tot"), count(lit(1)).as("__nv"))
      Seq(10L, 100L, 1000L, 10000L).toDF("k")
        .crossJoin(broadcast(totals))
        .join(ranked, col("__rank") === least(col("k"), col("__nv")))
        .select(col("k"), col("__rank").as("vocab_rank"),
          col("__cum").as("covered_tokens"), col("__tot").as("total_tokens"),
          (col("__cum").cast("double") / col("__tot").cast("double"))
            .as("share"))
    }),

    // Winnowing-style rolling fingerprint: min Rabin-Karp hash over 16-char
    // windows of the normalized text (partial-duplicate detection).
    "text_rolling_fingerprint" -> ((s, dir) => {
      import graft.expressions.TextSketches
      import graft.functions.TextFunctions.normalize
      import org.apache.spark.sql.functions.col
      docs(s, dir).select(col("doc_id"),
        TextSketches.rollingMinHash(normalize(col("text")), 16).as("rolling_fp"))
    }),

    // BPE-ish token accounting: regex word pieces + 4-char subword chunks
    // (ceil(len/4) pieces per word — a codepoint-budget proxy for real BPE).
    "text_bpe_tokens" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      val words = regexp_extract_all(lower(col("text")), lit("[a-z]+|[0-9]+"), lit(0))
      docs(s, dir).select(col("doc_id"),
        size(words).cast("long").as("n_words"),
        aggregate(words, lit(0L),
          (acc, w) => acc + ((length(w) + lit(3)) / lit(4)).cast("long"))
          .as("n_subword_tokens"))
    }),

    // Distributed BPE merge training: 8 merge rounds on the corpus
    // word-frequency table (the real tokenizer-training step — one
    // corpus pass, then vocabulary-sized rounds with a 1-row argmax on
    // the driver; deterministic (count desc, lhs, rhs) tie-break). The
    // oracle re-derives the same merges via a chained-CTE fold.
    "text_bpe_train" -> ((s, dir) =>
      Bpe.mergeTable(s, Bpe.trainMerges(docs(s, dir), "text", BpeMerges))),

    // The learned merges applied back to the corpus: per-source token
    // compression stats (the fertility/compression read a tokenizer
    // trainer checks before accepting a merge table). Segmentation is a
    // vocabulary-sized chained rewrite; docs join the segmented
    // vocabulary on the word key.
    "text_bpe_segment" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      val d = docs(s, dir)
      val vocab = Bpe.segmentVocab(d, "text", Bpe.trainMerges(d, "text", BpeMerges))
      val sw = d.where(col("text").isNotNull)
        .select(col("source"), explode(graft.functions.TextFunctions.tokens(col("text"))).as("w"))
        .where(col("w") =!= "")
        .groupBy("source", "w").agg(count(lit(1)).as("f"))
      sw.join(vocab.select("w", "n_bpe"), "w")
        .groupBy("source")
        .agg(count(lit(1)).as("n_words"), sum("f").as("n_tokens"),
          sum(col("f") * col("n_bpe")).as("n_bpe_tokens"),
          (sum(col("f") * col("n_bpe")).cast("double") /
            sum("f").cast("double")).as("avg_bpe_per_token"))
    }),

    // Curriculum ordering: 4 quality phases (phase 1 = cleanest band)
    // + seeded in-phase shuffle key — reading in (phase, pos_key) order
    // IS the training curriculum.
    "text_curriculum" -> ((s, dir) => {
      import graft.ops.{Curation, TextAnalysis}
      val scored = TextAnalysis.qualityScores(docs(s, dir), "doc_id", "text")
        .select("doc_id", "quality")
      Curation.curriculumOrder(scored, "doc_id", "quality", phases = 4)
    }),

    // Epoch plan: per-source full-pass + remainder decomposition of the
    // mixing budgets — the "3.2 epochs of wiki" arithmetic, exact LONGs.
    "text_epoch_plan" -> ((s, dir) =>
      graft.ops.Curation.epochPlan(docs(s, dir), "text", "source",
        EpochBudgets.toMap)),

    // Weighted corpus subsampling: 500 systematic PPS draws with
    // inclusion probability ∝ n_chars (the token-budget-faithful
    // subsample). Deterministic pointer sweep over the hash-shuffled
    // cumulative-weight axis; the drawn multiset hash-matches the
    // oracle's identical IEEE pointer arithmetic.
    "text_pps_sample" -> ((s, dir) =>
      graft.ops.Curation.ppsSample(docs(s, dir), "doc_id", "n_chars", n = 500)),

    // The production tokenize step: encode every document with the
    // learned merges, keep the first 32 ordered (pos, piece) rows per
    // doc — order-preserving BPE segmentation, hash-oracled.
    "text_bpe_encode" -> ((s, dir) => {
      import org.apache.spark.sql.functions.col
      val d = docs(s, dir)
      Bpe.encode(d, "doc_id", "text", Bpe.trainMerges(d, "text", BpeMerges))
        .where(col("pos") <= 32)
    }),

    // Tokenizer round-trip integrity + fertility: concatenating each
    // doc's BPE pieces in position order must reproduce the doc's
    // token characters exactly (the detokenization law every tokenizer
    // deploy checks), and pieces-per-word is the fertility number that
    // prices a vocabulary. Per-doc grain; the piece concat is a
    // doc-length-bounded ordered fold.
    "text_bpe_roundtrip" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      val TF = graft.functions.TextFunctions
      val d = docs(s, dir)
      val enc = Bpe.encode(d, "doc_id", "text",
        Bpe.trainMerges(d, "text", BpeMerges))
      val rec = enc.groupBy("doc_id").agg(
        count(lit(1)).as("n_pieces"),
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("piece")))),
          _.getField("piece")), "").as("__rec"))
      val orig = d.select(col("doc_id"),
        size(filter(TF.tokens(col("text")), _ =!= "")).cast("long").as("n_words"),
        array_join(filter(TF.tokens(col("text")), _ =!= ""), "").as("__orig"))
        .where(col("n_words") > 0)
      orig.join(rec, "doc_id")
        .select(col("doc_id"), col("n_words"), col("n_pieces"),
          (col("n_pieces").cast("double") / col("n_words").cast("double"))
            .as("fertility"),
          (col("__rec") === col("__orig")).as("roundtrip_ok"))
    }),

    // PII-pattern screening counts (emails / URLs / phone-shaped runs).
    "text_pii_scan" -> ((s, dir) =>
      TextAnalysis.piiScan(docs(s, dir), "doc_id", "text")),

    // PII masking: the scrub pass after the screen — emails → <EMAIL>,
    // URLs → <URL>, phone runs → <PHONE>, in that order (contract).
    "text_pii_redact" -> ((s, dir) =>
      TextAnalysis.piiRedact(docs(s, dir), "doc_id", "text")),

    // Fixed-size token chunks with stride-64 overlap (context-window /
    // retrieval-passage preparation; final short chunk included).
    "text_chunk" -> ((s, dir) =>
      TextAnalysis.chunkTokens(docs(s, dir), "doc_id", "text",
        chunkSize = 128, stride = 64)),

    // Chunk → pack end-to-end: disjoint 128-token chunks greedily packed
    // into 512-token training sequences by global (doc, chunk) order —
    // the context-window prep pipeline (chunking keeps documents intact
    // at boundaries; packing fills sequences without splitting a chunk).
    // The running sum is the two-phase parallel prefix sum, so one
    // mega-corpus never serializes through a single window task.
    "text_chunk_pack" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      val chunks = TextAnalysis.chunkTokens(docs(s, dir), "doc_id", "text",
        chunkSize = 128, stride = 128)
        .select(col("doc_id"), col("chunk_id"), col("n_chunk_tokens"))
      graft.ops.Curation.parallelRunningSum(chunks, Nil,
        Seq("doc_id", "chunk_id"), "n_chunk_tokens", "__cum")
        .select(col("doc_id"), col("chunk_id"), col("n_chunk_tokens"),
          expr("(__cum - n_chunk_tokens) div 512").as("pack_id"))
    }),

    // HTML → main text extraction (the crawl-corpus stage 0): the
    // fixture wraps each document in a full page — nav bar, headings,
    // comments, entity-laden content, link lists, link-dense footer,
    // script with a bare "<" — and the operator must recover the
    // content lines: tag/entity strip + trafilatura-style boilerplate
    // line filter (link density as exact-integer 2·anchor ≤ alnum;
    // short-line runs dropped unless adjacent to kept content). The
    // oracle re-derives the page AND the strip verbatim in SQL.
    "text_html_strip" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      val id = col("doc_id").cast("string")
      val html = concat(
        lit("<html><head><title>Doc "), id,
        lit("</title><style>body { color: #fff; }</style></head><body>"),
        lit("<div class=\"nav\"><a href=\"/\">Home</a> | <a href=\"/a\">About</a> | <a href=\"/c\">Contact us</a></div>"),
        lit("<h1>Doc "), id, lit("</h1>"),
        lit("<!-- rendered by engine v2 -->"),
        lit("<p>"), col("text"), lit("</p>"),
        lit("<p>Fish &amp; chips &lt;tasty&gt; &quot;double&quot; &#39;single&#39;&nbsp;done for doc "), id, lit("</p>"),
        lit("<ul><li><a href=\"/x\">first link</a></li><li><a href=\"/y\">second link</a></li></ul>"),
        lit("<div class=\"footer\"><a href=\"/tos\">Terms of Service</a> | <a href=\"/privacy\">Privacy Policy</a> &copy; 2024</div>"),
        lit("<script>if (1 < 2) { alert(\"x\"); }</script></body></html>"))
      // The staged (DataFrame) overload: line metrics evaluate ONCE as
      // bound attributes — the Column form's inlined neighbor reads
      // re-evaluate the regex array per index, O(lines²) per document
      // (measured 15.8 s vs 1.7 s at sf0.1). The repartition splits the
      // (small-file, single-task) scan to cluster width — on a real
      // crawl the scan is already thousands of tasks.
      graft.functions.HtmlFunctions.extractMainText(
        docs(s, dir).repartition(s.sessionState.conf.numShufflePartitions),
        html, "main_text")
        .select("doc_id", "main_text")
    }),

    // Training-prep pipeline e2e over the round's new operators:
    // HTML strip of the tag-wrapped corpus (stage 0 — a real corpus
    // enters as markup; the structural strip is content-preserving, so
    // recovering the clean text exactly is pinned by HtmlStripSpec and
    // the oracle keeps mirroring the clean-text stages) → per-source
    // MAD length-outlier screen → PII masking → disjoint 128-token
    // chunking of the MASKED text (training must never see the raw
    // PII, so redaction precedes tokenization — "<PHONE>" is one token
    // where "+1 (415) 555-0199" was three) → greedy 512-token sequence
    // packing by global (doc, chunk) order.
    "text_prep_pipeline" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      val wrapped = docs(s, dir).withColumn("text", concat(
        lit("<html><body><script>var x = 1 < 2;</script><p>"),
        col("text"), lit("</p></body></html>")))
      val stripped = wrapped.withColumn("text",
        graft.functions.HtmlFunctions.stripHtml(col("text")))
      val kept = graft.ops.Curation.lengthOutliers(
          stripped, "doc_id", "text", "source", k = 4.0)
        .where(!col("is_outlier")).select("doc_id")
      val masked = stripped.join(kept, Seq("doc_id"), "left_semi")
        .withColumn("text", TextAnalysis.piiRedactCol(col("text")))
      val chunks = TextAnalysis.chunkTokens(masked, "doc_id", "text",
        chunkSize = 128, stride = 128)
        .select(col("doc_id"), col("chunk_id"), col("n_chunk_tokens"))
      graft.ops.Curation.parallelRunningSum(chunks, Nil,
        Seq("doc_id", "chunk_id"), "n_chunk_tokens", "__cum")
        .select(col("doc_id"), col("chunk_id"), col("n_chunk_tokens"),
          expr("(__cum - n_chunk_tokens) div 512").as("pack_id"))
    }),

    // Per-source robust length outliers (median/MAD on token counts —
    // integer metric keeps every interpolation engine-exact).
    "text_length_outliers" -> ((s, dir) =>
      graft.ops.Curation.lengthOutliers(docs(s, dir), "doc_id", "text",
        "source", k = 4.0)),

    // Duplicated-bigram ratio (boilerplate / generated-text signal).
    "text_repetition" -> ((s, dir) =>
      TextAnalysis.repetitionRatio(docs(s, dir), "doc_id", "text")),

    // Top-3 distinguishing terms per document (log-free TF-IDF).
    "text_tfidf" -> ((s, dir) =>
      TextAnalysis.tfIdfTopTerms(docs(s, dir), "doc_id", "text", k = 3)),

    // Exact interpolated token-count quantiles per language (corpus
    // profiling). Dyadic percentages over integer counts are bit-exact in
    // both engines (the interpolation arithmetic never rounds).
    // Exact percentile is scale-safe HERE (unlike a collect_list fold):
    // Spark's Percentile agg buffers a value→count map, so per-lang state
    // is O(distinct token counts) — bounded by max document length, not
    // corpus size. Corpora with unbounded value domains should use the
    // sketch path instead (see qualityFloorByCutoff / percentile_approx).
    "text_token_quantiles" -> ((s, dir) => {
      import graft.functions.TextFunctions.tokens
      import org.apache.spark.sql.functions._
      docs(s, dir)
        .select(col("lang"), size(tokens(col("text"))).cast("long").as("n_tokens"))
        .groupBy("lang")
        .agg(percentile(col("n_tokens"), lit(0.25)).as("p25"),
          percentile(col("n_tokens"), lit(0.5)).as("p50"),
          percentile(col("n_tokens"), lit(0.75)).as("p75"),
          count(lit(1)).as("n"))
    }),

    // Sequence packing for training-batch construction: assign documents
    // to context-budget packs (2048 tokens) via prefix-sum binning —
    // pack_id = floor(tokens-before-me / budget) over a deterministic
    // per-language order. The running sum is Curation.parallelRunningSum
    // (two-phase slice/offset prefix sum), so a one-language-dominated
    // corpus still packs with full parallelism; the classic sequential
    // first-fit packer is O(n) single-threaded, this over-fills each pack
    // by at most one document (the standard streaming-packing relaxation).
    "text_pack_sequences" -> ((s, dir) => {
      import graft.functions.TextFunctions.tokens
      import org.apache.spark.sql.functions._
      val budget = 2048L
      val t = docs(s, dir)
        .select(col("doc_id"), col("lang"), size(tokens(col("text"))).cast("long").as("n_tokens"))
      graft.ops.Curation.parallelRunningSum(t, Seq("lang"),
        Seq("n_tokens", "doc_id"), "n_tokens", "__cum")
        .select(col("doc_id"), col("lang"), col("n_tokens"),
          expr(s"(__cum - n_tokens) div $budget").as("pack_id"))
    }),

    // Fixed-width document-length histogram (100-char buckets).
    "text_length_hist" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      docs(s, dir)
        .groupBy(expr("n_chars div 100").as("bucket"))
        .agg(count(lit(1)).as("n"),
          min(col("n_chars")).cast("long").as("min_chars"),
          max(col("n_chars")).cast("long").as("max_chars"))
    }),

    // Domain-mixture sampling: deterministic hash-ordered token budget
    // per source (src0-9 weighted 1/16, src10+ 1/32 of an 8192-token
    // budget — exactly-representable binary weights, so the
    // weight×budget arithmetic can't drift between engines).
    "text_domain_mix" -> ((s, dir) =>
      graft.ops.Curation.domainMix(docs(s, dir), "doc_id", "text", "source",
        DomainWeights, totalTokenBudget = 8192L, seed = "mix")),

    // Deterministic training-data shuffle: reproducible 60-bit key →
    // shard (mod 8) → position within shard.
    "text_shuffle_shard" -> ((s, dir) =>
      graft.ops.Curation.shuffleShard(docs(s, dir), "doc_id",
        numShards = 8, seed = "shuffle")),

    // Bigram-LM fluency: mean add-one-smoothed P(w2|w1) under a corpus
    // model (log-free → bit-identical across engines).
    "text_bigram_lm" -> ((s, dir) =>
      graft.ops.Curation.bigramLmScore(docs(s, dir), "doc_id", "text")),

    // Trigram stupid-backoff LM (Brants 2007): trained on the even-id
    // half, scored over the whole corpus — a real held-out split, so
    // the trigram→bigram→unigram backoff chain actually fires. Mean S
    // per doc, log-free (see [[graft.ops.Curation.stupidBackoffScore]]).
    "text_stupid_backoff" -> ((s, dir) => {
      import org.apache.spark.sql.functions.col
      val d = docs(s, dir)
      graft.ops.Curation.stupidBackoffScore(d,
        d.where(col("doc_id") % 2 === 0L), "doc_id", "text")
    }),

    // Compression-ratio quality signal (RedPajama-v2/Dolma-class):
    // deflate_len / raw_len per document via the native
    // [[graft.expressions.DeflateSizeExpr]] (thread-local zlib, zero
    // per-row allocation). Repetitive boilerplate compresses far below
    // prose — a corpus-statistics-free per-row filter signal. Oracle =
    // a committed Python-zlib fixture keyed by md5(text) (r10: the last
    // ∅ row, now a cross-implementation byte-length check).
    "text_compression_ratio" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      docs(s, dir).select(col("doc_id"),
        octet_length(col("text")).as("raw_len"),
        graft.expressions.DeflateSizeExpr.deflateSize(col("text")).as("deflate_len"))
        .withColumn("ratio", when(col("raw_len") === 0, lit(0.0))
          .otherwise(col("deflate_len").cast("double") / col("raw_len").cast("double")))
    }),

    // Deterministic train/val/test assignment: seeded-hash interval
    // split (7/8, 1/16, 1/16 — dyadic, exact thresholds), stable under
    // corpus growth. Per-row math, no shuffle.
    "text_split_assign" -> ((s, dir) =>
      graft.ops.Curation.splitAssign(docs(s, dir), "doc_id",
        Seq("train" -> 0.875, "val" -> 0.0625, "test" -> 0.0625))),

    // DSIR importance scores: how target-like is each document's hashed
    // unigram+bigram profile (target = the src0 domain; log-free mean
    // likelihood ratio — see [[graft.ops.Curation.dsirScores]]).
    "text_dsir_scores" -> ((s, dir) => {
      import org.apache.spark.sql.functions.col
      graft.ops.Curation.dsirScores(docs(s, dir),
        docs(s, dir).where(col("source") === "src0"),
        "doc_id", "text", buckets = 1024)
    }),

    // DSIR selection: deterministic top-100 by (score, id) — the
    // data-selection read of the scores (global top-N plans as
    // TakeOrderedAndProject, k rows per partition cross the exchange).
    "text_dsir_select" -> ((s, dir) => {
      import org.apache.spark.sql.functions.col
      graft.ops.Curation.dsirScores(docs(s, dir),
        docs(s, dir).where(col("source") === "src0"),
        "doc_id", "text", buckets = 1024)
        .orderBy(col("dsir_score").desc, col("doc_id"))
        .limit(100)
    }),

    // End-to-end curation pipeline, composed from the operator library:
    // exact-dedup keepers → quality gate (≥ 0.5) → domain-mixture budget
    // → context packing (2048) with intra-pack offsets → shard layout.
    // One flagship query proving the stages compose into the full
    // training-data assembly a pipeline user runs — each stage keeps its
    // own scale shape (hash-agg, scan filter, window per source, per-row
    // hash).
    "text_pipeline_e2e" -> ((s, dir) => {
      import graft.functions.TextFunctions.hash60
      import org.apache.spark.sql.functions._
      val d = docs(s, dir)
      val keep = graft.ops.Dedup.exact(d, "doc_id", "text")
        .select(col("keep_id").as("doc_id"))
      val quality = graft.ops.TextAnalysis.qualityScores(d, "doc_id", "text")
        .where(col("quality") >= 0.5).select("doc_id")
      val survivors = d.join(keep, Seq("doc_id"), "left_semi")
        .join(quality, Seq("doc_id"), "left_semi")
      graft.ops.Curation.domainMix(survivors, "doc_id", "text", "source",
        DomainWeights, totalTokenBudget = 8192L, seed = "mix")
        .select(col("source"), col("doc_id"), col("n_tokens"),
          expr("(cum_tokens - n_tokens) div 2048").as("pack_id"),
          expr("(cum_tokens - n_tokens) % 2048").as("pack_offset"),
          pmod(hash60(concat(lit("shard:"), col("doc_id").cast("string"))), lit(8L))
            .as("shard"))
    }),

    // Cross-corpus duplicated-span rate (word trigrams): the C4-style
    // span-duplication signal per document.
    "text_span_dup_rate" -> ((s, dir) =>
      TextAnalysis.spanDupRate(docs(s, dir), "doc_id", "text", n = 3)),

    // Power-of-two length-bucketed batching stats: each doc lands in
    // the smallest 2^k >= its token count (log-free via the binary-
    // string length of n-1 — the dynamic-batching bucket layout), and
    // each bucket reports its padding waste and packing efficiency —
    // the numbers that decide the bucket boundaries of a training
    // dataloader. One tokenize pass, one partial agg; two mirrored
    // divisions.
    "text_length_buckets" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      docs(s, dir)
        .select(col("doc_id"),
          size(graft.functions.TextFunctions.tokens(col("text")))
            .cast("long").as("n"))
        .withColumn("cap",
          when(col("n") <= 1L, 1L)
            .otherwise(expr("shiftleft(1L, length(bin(n - 1)))").cast("long")))
        .groupBy("cap")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n")).as("total_tokens"),
          sum(col("cap") - col("n")).as("padding_waste"))
        .withColumn("efficiency",
          col("total_tokens").cast("double") /
            (col("n_docs") * col("cap")).cast("double"))
    }),

    // RAKE keyphrase extraction: stopword-delimited candidate phrases
    // scored by the deg/freq word statistic, corpus top-20.
    "text_keyphrases" -> ((s, dir) =>
      TextAnalysis.rakeKeyphrases(docs(s, dir), "doc_id", "text",
        RakeStopwords, topN = 20)),

    // Per-doc trigram novelty: share of the doc's distinct trigrams no
    // other document has — the keep/up-weight counterpoint to the
    // duplication signal above.
    "text_novelty" -> ((s, dir) =>
      TextAnalysis.noveltyRate(docs(s, dir), "doc_id", "text", n = 3)),

    // Gopher-style quality-rule cascade: per-rule verdicts + overall pass.
    "text_gopher_filter" -> ((s, dir) =>
      TextAnalysis.gopherRules(docs(s, dir), "doc_id", "text")),

    // Out-of-vocabulary rate against the corpus' own top-20 vocabulary
    // (the synthetic corpus has ~30 distinct words, so the cut bites).
    "text_oov_rate" -> ((s, dir) =>
      TextAnalysis.oovRate(docs(s, dir), "doc_id", "text", vocabSize = 20)),

    // Temperature-scaled (α = 1/2) domain sampling weights + budgets.
    "text_domain_temperature" -> ((s, dir) =>
      graft.ops.Curation.temperatureWeights(docs(s, dir), "text", "source",
        totalTokenBudget = 8192L)),

    // Curation flagship v2, composing this round's operators with no
    // driver round-trip: Gopher rule gate → span-duplication gate →
    // temperature-scaled budgets computed FROM the survivors
    // (temperatureWeights → domainMixBudgets as DataFrames) → tempered
    // domain mixture.
    "text_curation_v2" -> ((s, dir) => {
      import org.apache.spark.sql.functions.col
      val d = docs(s, dir)
      val gopher = TextAnalysis.gopherRules(d, "doc_id", "text", minWords = 30)
        .where(col("pass")).select("doc_id")
      val spans = TextAnalysis.spanDupRate(d, "doc_id", "text", n = 3)
        .where(col("dup_rate") <= 0.9).select("doc_id")
      // Materialized once: surv feeds temperatureWeights (two consumers of
      // its per-source agg) AND domainMixBudgets' keyed scan — without it
      // each evaluation re-runs both gate joins.
      val surv = d.join(gopher, Seq("doc_id"), "left_semi")
        .join(spans, Seq("doc_id"), "left_semi")
        .localCheckpoint(true)
      val budgets = graft.ops.Curation.temperatureWeights(surv, "text", "source",
        totalTokenBudget = 4096L)
      graft.ops.Curation.domainMixBudgets(surv, "doc_id", "text", "source",
        budgets, seed = "mix")
    }),

    // BM25 lexical retrieval (rational-idf variant — exactly reproducible
    // cross-engine; see Retrieval.bm25TopK): top-5 docs per query over a
    // fixed literal query set, the lexical side of hybrid retrieval
    // (pairs with the ANN operators under sim_rrf-style fusion).
    "text_bm25" -> ((s, dir) => {
      import s.implicits._
      val q = Bm25Queries.toDF("qid", "qtext")
      graft.ops.Retrieval.bm25TopK(docs(s, dir), q, "doc_id", "text",
        "qid", "qtext", k = 5)
    }),

    // CDC-maintained BM25 index: build the persisted index over the full
    // corpus, apply a merged change batch (docs ≡ 1 mod 7 rewritten,
    // docs ≡ 3 mod 7 deleted) through Retrieval.updateBm25Index —
    // O(batch) tombstone maintenance, NOT a rebuild — then probe. The
    // oracle computes BM25 from scratch over the merged corpus: the
    // maintained index must be hash-identical to it (exact ledger stats,
    // tombstone-excluded df recount, same fold order).
    "text_bm25_after_update" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.functions.{col, concat, lit}
      val d = docs(s, dir)
      val changes = d.where(col("doc_id") % 7 === 1L)
        .select(col("doc_id"),
          concat(col("text"), lit(" refreshed merge batch")).as("text"),
          lit("U").as("op"))
        .unionByName(d.where(col("doc_id") % 7 === 3L)
          .select(col("doc_id"), lit(null).cast("string").as("text"),
            lit("D").as("op")))
      // base index build = one-time fixture (cached per JVM); the TIMED
      // body is the steady-state delivery + probe. Re-deliveries under
      // fresh ledger ids tombstone the prior generation and re-add
      // identical postings, so the probe (and the oracle) are
      // invocation-independent.
      val table = s"bm25_upd_idx_${math.abs(dir.hashCode)}"
      QueryTmp.cached(s"bm25_upd:$dir") { _ =>
        graft.ops.Retrieval.writeBm25Index(d, "doc_id", "text", table, buckets = 8)
      }
      graft.ops.Retrieval.updateBm25Index(s, changes, "doc_id", "text", "op",
        table, 8, batchId = QueryTmp.nextId("bmchg"))
      val q = Bm25Queries.toDF("qid", "qtext")
      graft.ops.Retrieval.bm25AgainstIndex(s, table, q, "qid", "qtext", k = 5)
    }),

    // Conjunctive boolean retrieval against the persisted BM25 index:
    // docs whose live postings cover EVERY distinct query term — the
    // unranked pre-filter of a retrieval stack, integer-exact, probing
    // only the query terms' bucket files. The oracle recomputes the
    // containment from the corpus directly.
    "text_boolean_and" -> ((s, dir) => {
      import s.implicits._
      val table = s"bool_and_idx_${math.abs(dir.hashCode)}"
      graft.ops.Retrieval.writeBm25Index(docs(s, dir), "doc_id", "text",
        table, buckets = 8)
      val q = Bm25Queries.toDF("qid", "qtext")
      graft.ops.Retrieval.booleanAndAgainstIndex(s, table, q, "qid", "qtext")
    }),

    // Query-by-example hybrid retrieval — the composed retrieval
    // frontend: exemplar documents query BOTH the lexical index (BM25
    // over their text, self excluded post-ranking) and the vector side
    // (brute cosine kNN over their embedding; at scale swap in
    // ivfPqKnn — same output shape), fused rank-wise by RRF. Every
    // stage is an existing oracle-checked operator; this pins the
    // composition.
    "text_hybrid_retrieval" -> ((s, dir) => {
      import org.apache.spark.sql.functions.col
      val d = docs(s, dir)
      val e = Tables(s, dir, "embeddings")
      val ex = Seq(0L, 100L, 200L, 300L)
      val q = d.where(col("doc_id").isin(ex: _*))
        .select(col("doc_id").as("qid"), col("text").as("qtext"))
      val lex = graft.ops.Retrieval.bm25TopK(d, q, "doc_id", "text",
          "qid", "qtext", k = 10)
        .where(col("doc_id") =!= col("qid"))
      val qe = e.where(col("vec_id").isin(ex: _*))
        .select(col("vec_id").as("qid"), col("embedding"))
      val sem = graft.ops.Similarity.bruteForceKnn(e, qe,
          "vec_id", "embedding", "qid", k = 10)
        .withColumnRenamed("vec_id", "doc_id")
      graft.ops.Similarity.rrfFuse(lex, sem, "qid", "doc_id", k = 5)
    }),

    // Phrase-aware retrieval: BM25 bag-of-words ranking fused rank-wise
    // (RRF) with adjacent-bigram phrase evidence — a doc containing the
    // query's exact phrases climbs past scatter matches, no score
    // calibration involved.
    "text_phrase_retrieval" -> ((s, dir) => {
      import s.implicits._
      val d = docs(s, dir)
      val q = Bm25Queries.toDF("qid", "qtext")
      val lex = graft.ops.Retrieval.bm25TopK(d, q, "doc_id", "text",
        "qid", "qtext", k = 10)
      val phr = graft.ops.Retrieval.phraseTopK(d, q, "doc_id", "text",
        "qid", "qtext", k = 10)
      graft.ops.Similarity.rrfFuse(lex, phr, "qid", "doc_id", k = 5)
    }),

    // The maintained lexical frontend end-to-end: BM25 + phrase indexes
    // built via two RetrievalStream deliveries each (even then odd doc
    // ids), probed and fused exactly like text_phrase_retrieval — the
    // ingest path must be indistinguishable from recompute over the
    // union, so the TWO queries share one oracle.
    "text_retrieval_after_ingest" -> ((s, dir) => {
      import org.apache.spark.sql.functions.col
      import s.implicits._
      val d = docs(s, dir)
      val bt = "bm25_ingest_q"
      val pt = "phrase_ingest_q"
      Seq(bt, bt + "_docs", bt + "_segments", bt + "_tombstones",
        pt, pt + "_segments", pt + "_tombstones")
        .foreach(t => s.sql(s"DROP TABLE IF EXISTS $t"))
      // Base build from the even half + ONE ingest delivery of the odd
      // half per index (the empty-bootstrap two-delivery variant is
      // spec-covered in RetrievalStreamSpec; trimmed here to keep the
      // per-round bench write count bounded, as with
      // sim_graph_after_ingest).
      val even = d.where(col("doc_id") % 2 === 0)
      val odd = d.where(col("doc_id") % 2 === 1)
      // The BM25 and phrase chains touch disjoint tables and have no
      // ordering contract between them — overlap the two build+deliver
      // chains (each chain stays internally ordered: build THEN ingest).
      graft.io.Overlap.awaitAll(Seq(
        () => {
          graft.ops.Retrieval.writeBm25Index(even, "doc_id", "text", bt, buckets = 8)
          graft.streaming.RetrievalStream.ingestBatch(odd, 1L, bt, "doc_id", "text", buckets = 8)
        },
        () => {
          graft.ops.Retrieval.writePhraseIndex(even, "doc_id", "text", pt, buckets = 8)
          graft.streaming.RetrievalStream.phraseBatch(odd, 1L, pt, "doc_id", "text", buckets = 8)
        }))
      val q = Bm25Queries.toDF("qid", "qtext")
      val lex = graft.ops.Retrieval.bm25AgainstIndex(s, bt, q, "qid", "qtext", k = 10)
      val phr = graft.ops.Retrieval.phraseAgainstIndex(s, pt, q, "qid", "qtext", k = 10)
      graft.ops.Similarity.rrfFuse(lex, phr, "qid", "doc_id", k = 5)
    }),

    // Per-source composition drift: L1 distance between each source's
    // hashed-term distribution and the corpus-wide one — flags a
    // mis-crawled or contaminated source before it skews a mixture.
    // Bounded state (256 buckets per group), engine-exact fold.
    "text_source_drift" -> ((s, dir) =>
      TextAnalysis.sourceDrift(docs(s, dir), "source", "text", buckets = 256)),

    // CDC-maintained phrase index: build, apply the %7 change batch
    // (rewrites + deletes) through Retrieval.updatePhraseIndex, probe.
    // The oracle counts distinct-bigram hits over the merged corpus —
    // the maintained index must be indistinguishable from it.
    "text_phrase_after_update" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.functions.{col, concat, lit}
      val d = docs(s, dir)
      val changes = d.where(col("doc_id") % 7 === 1L)
        .select(col("doc_id"),
          concat(col("text"), lit(" refreshed merge batch")).as("text"),
          lit("U").as("op"))
        .unionByName(d.where(col("doc_id") % 7 === 3L)
          .select(col("doc_id"), lit(null).cast("string").as("text"),
            lit("D").as("op")))
      // same fixture/steady-state split as text_bm25_after_update
      val table = s"phrase_upd_idx_${math.abs(dir.hashCode)}"
      QueryTmp.cached(s"phrase_upd:$dir") { _ =>
        graft.ops.Retrieval.writePhraseIndex(d, "doc_id", "text", table, buckets = 8)
      }
      graft.ops.Retrieval.updatePhraseIndex(s, changes, "doc_id", "text", "op",
        table, 8, batchId = QueryTmp.nextId("phchg"))
      graft.ops.Retrieval.phraseAgainstIndex(s, table,
        Bm25Queries.toDF("qid", "qtext"), "qid", "qtext", k = 5)
    }),

    // HyperLogLog distinct-token profile per source: 64 MAX-mergeable
    // registers per group replace per-key distinct state — the bounded
    // sketch a 100 TB profiling sidecar keeps instead of re-counting
    // distincts. Raw estimator (no log-based corrections — engine-exact;
    // n_buckets_set rides along for downstream correction).
    "text_hll_distinct" -> ((s, dir) => {
      import org.apache.spark.sql.functions.{col, explode}
      val terms = docs(s, dir).select(col("source"),
        explode(graft.functions.TextFunctions.tokens(col("text"))).as("term"))
      graft.ops.Sketches.hllDistinct(terms, Seq("source"), "term", m = 64)
    }),

    // HLL merge law: registers built independently on the doc_id-parity
    // halves MAX-merge into EXACTLY the single-pass registers — the
    // property that lets per-segment sketches answer whole-corpus
    // questions without rescans. The oracle computes the single pass.
    "text_hll_merged" -> ((s, dir) => {
      import org.apache.spark.sql.functions.{col, explode}
      val d = docs(s, dir)
      def terms(part: DataFrame) = part.select(col("source"),
        explode(graft.functions.TextFunctions.tokens(col("text"))).as("term"))
      val r0 = graft.ops.Sketches.hllRegisters(
        terms(d.where(col("doc_id") % 2 === 0L)), Seq("source"), "term", m = 64)
      val r1 = graft.ops.Sketches.hllRegisters(
        terms(d.where(col("doc_id") % 2 === 1L)), Seq("source"), "term", m = 64)
      graft.ops.Sketches.hllEstimate(
        graft.ops.Sketches.hllMerge(Seq(r0, r1), Seq("source")), Seq("source"), m = 64)
    }),

    // Count-min watchlist frequencies: a 4×256 sketch (map-side combine
    // caps each task's shuffle output at the sketch size) estimates the
    // stopword watchlist's counts with one-sided error — never under.
    "text_cms_counts" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.functions.{col, explode}
      val terms = docs(s, dir).select(
        explode(graft.functions.TextFunctions.tokens(col("text"))).as("term"))
      val cms = graft.ops.Sketches.cmsBuild(terms, "term", depth = 4, width = 256)
      graft.ops.Sketches.cmsEstimate(cms,
        graft.functions.TextFunctions.StopwordsEn.toDF("term"), "term",
        depth = 4, width = 256)
    }),

    // CMS merge law: cell-SUM of the parity-half sketches ≡ the
    // single-pass sketch (counts are additive) — same oracle as
    // text_cms_counts, equality IS the distributed-maintenance claim.
    "text_cms_merged" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.functions.{col, explode}
      val d = docs(s, dir)
      def terms(part: DataFrame) = part.select(
        explode(graft.functions.TextFunctions.tokens(col("text"))).as("term"))
      val c0 = graft.ops.Sketches.cmsBuild(
        terms(d.where(col("doc_id") % 2 === 0L)), "term", depth = 4, width = 256)
      val c1 = graft.ops.Sketches.cmsBuild(
        terms(d.where(col("doc_id") % 2 === 1L)), "term", depth = 4, width = 256)
      graft.ops.Sketches.cmsEstimate(graft.ops.Sketches.cmsMerge(Seq(c0, c1)),
        graft.functions.TextFunctions.StopwordsEn.toDF("term"), "term",
        depth = 4, width = 256)
    }),

    // KMV bottom-k distinct sketch per source over 3-word shingles (the
    // shingle space is rich enough to exceed k; the tiny synthetic token
    // vocabulary is not): 64 smallest distinct hashes, estimator
    // (k−1)·2^60/h_(k) — one correctly-rounded division, the log-free
    // exactness convention. Groups under k hashes report EXACT counts.
    "text_kmv_distinct" -> ((s, dir) => {
      import org.apache.spark.sql.functions.{col, explode}
      val TF = graft.functions.TextFunctions
      val grams = docs(s, dir)
        .select(col("source"), TF.tokens(col("text")).as("__toks"))
        .select(col("source"),
          explode(TF.wordShingles(col("__toks"), 3)).as("gram"))
      graft.ops.Sketches.kmvDistinct(grams, Seq("source"), "gram", k = 64)
    }),

    // KMV merge law: bottom-k sketches of the doc_id-parity halves merge
    // (bottom-k of the union) into EXACTLY the single-pass sketch — the
    // oracle computes the single pass. Sketch-sized merge work.
    "text_kmv_merged" -> ((s, dir) => {
      import org.apache.spark.sql.functions.{col, explode}
      val TF = graft.functions.TextFunctions
      val d = docs(s, dir)
      def grams(part: DataFrame) = part
        .select(col("source"), TF.tokens(col("text")).as("__toks"))
        .select(col("source"),
          explode(TF.wordShingles(col("__toks"), 3)).as("gram"))
      val s0 = graft.ops.Sketches.kmvSketch(
        grams(d.where(col("doc_id") % 2 === 0L)), Seq("source"), "gram", k = 64)
      val s1 = graft.ops.Sketches.kmvSketch(
        grams(d.where(col("doc_id") % 2 === 1L)), Seq("source"), "gram", k = 64)
      graft.ops.Sketches.kmvEstimate(
        graft.ops.Sketches.kmvMerge(Seq(s0, s1), Seq("source"), k = 64),
        Seq("source"), k = 64)
    }),

    // Mergeable quantile sketch (deterministic bottom-k-by-hash row
    // sample — the engine-mirrorable stand-in for KLL's randomized
    // compactors): per-source token-count quantiles at 1/4, 1/2, 3/4,
    // 9/10 from a k=256 sample; rank-based selection on exact integers,
    // no interpolation. Groups with ≤ k rows are EXACT.
    "text_quantile_sketch" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      val t = docs(s, dir).select(col("source"), col("doc_id"),
        size(graft.functions.TextFunctions.tokens(col("text"))).cast("long").as("n_tokens"))
      graft.ops.Sketches.quantiles(t, Seq("source"), "doc_id", "n_tokens",
        probs = Seq((1, 4), (1, 2), (3, 4), (9, 10)), k = 256)
    }),

    // Quantile-sketch merge law: sketches built independently on the
    // doc_id-parity halves bottom-k-merge into EXACTLY the single-pass
    // sketch (any member of the union's true bottom-k is in its own
    // part's bottom-k) — per-segment quantile summaries fold into
    // whole-corpus quantiles without rescans. Oracle = the single pass.
    "text_quantile_merged" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      val d = docs(s, dir)
      def t(part: DataFrame) = part.select(col("source"), col("doc_id"),
        size(graft.functions.TextFunctions.tokens(col("text"))).cast("long").as("n_tokens"))
      val s0 = graft.ops.Sketches.quantileSketch(
        t(d.where(col("doc_id") % 2 === 0L)), Seq("source"), "doc_id", "n_tokens", k = 256)
      val s1 = graft.ops.Sketches.quantileSketch(
        t(d.where(col("doc_id") % 2 === 1L)), Seq("source"), "doc_id", "n_tokens", k = 256)
      graft.ops.Sketches.quantileEstimate(
        graft.ops.Sketches.quantileMerge(Seq(s0, s1), Seq("source"), k = 256),
        Seq("source"), probs = Seq((1, 4), (1, 2), (3, 4), (9, 10)))
    }),

    // The quality floor's cutoff derived from the MERGEABLE sketch
    // instead of a fresh percentile_approx pass — the swap that lets a
    // maintained profiling sidecar (per-segment samples, folded) set
    // the floor without rescanning history. Same discrete kept-set
    // semantics as text_quality_cutoff (cutoff is an element of the
    // data; quality ≥ cutoff survives).
    "text_quality_cutoff_sketch" -> ((s, dir) => {
      import graft.ops.{Curation, TextAnalysis}
      val scored = TextAnalysis.qualityScores(docs(s, dir), "doc_id", "text")
        .join(docs(s, dir).select("doc_id", "source"), "doc_id")
        .select("source", "doc_id", "quality")
      Curation.qualityFloorBySketch(scored, "source", "doc_id", "quality",
        dropNum = 1, dropDen = 5, k = 256)
    }),

    // Quantile profile via the INGEST path: two parity-half deliveries
    // through the segment-ledgered quantile gate, then the read-side
    // bottom-k-of-union fold — shares the single-pass oracle verbatim
    // (ingest indistinguishable from recompute, the merge law applied
    // per delivery).
    "text_quantile_after_ingest" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      val t = "qsk_ingest_q"
      Seq(t + "_qsk", graft.io.SegmentedIndex.ledgerTable(t + "_qsk"))
        .foreach(x => s.sql(s"DROP TABLE IF EXISTS $x"))
      val d = docs(s, dir)
      def lens(part: org.apache.spark.sql.DataFrame) = part.select(
        col("source"), col("doc_id"),
        size(graft.functions.TextFunctions.tokens(col("text"))).cast("long").as("n_tokens"))
      graft.streaming.SketchStream.ingestQuantileBatch(
        lens(d.where(col("doc_id") % 2 === 0L)), "b0", t,
        Seq("source"), "doc_id", "n_tokens", 256)
      graft.streaming.SketchStream.ingestQuantileBatch(
        lens(d.where(col("doc_id") % 2 === 1L)), "b1", t,
        Seq("source"), "doc_id", "n_tokens", 256)
      graft.streaming.SketchStream.readQuantiles(s, t, Seq("source"),
        Seq((1, 4), (1, 2), (3, 4), (9, 10)), 256)
    }),

    // Deterministic stratified sample — "5 documents per source", the
    // corpus-inspection op every curation decision starts from:
    // hash-ordered bottom-n, so the sample is a pure function of the
    // id set (reproducible cross-engine, stable under growth, uniform).
    "text_sample_per_source" -> ((s, dir) =>
      graft.ops.Curation.stratifiedSample(
        docs(s, dir).select("source", "doc_id", "lang"),
        Seq("source"), "doc_id", n = 5)),

    // Windowed co-occurrence + association ratio (the log-free PMI
    // core every collocation/phrase-mining pass starts from): token
    // pairs within 3 positions, canonical unordered, with marginals and
    // the ratio n_pair·N/(n_a·n_b) — exact-int-to-double products and
    // ONE division, identical IEEE trees. Pair generation is an offset
    // EQUI-join (each token meets only its next 3 positions) — O(3N),
    // never a per-document quadratic self-join.
    "text_cooccurrence" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      val TF = graft.functions.TextFunctions
      val toks = docs(s, dir)
        .select(col("doc_id"), posexplode(TF.tokens(col("text"))))
        .withColumnRenamed("col", "term")
      val marg = toks.groupBy("term").agg(count(lit(1)).as("n_t"))
      val total = toks.count()
      val right = toks.select(col("doc_id"), col("pos").as("p2"),
        col("term").as("tb"))
      toks.select(col("doc_id"), col("term").as("ta"),
          explode(sequence(col("pos") + 1, col("pos") + 3)).as("p2"))
        .join(right, Seq("doc_id", "p2"))
        .select(least(col("ta"), col("tb")).as("term_a"),
          greatest(col("ta"), col("tb")).as("term_b"))
        .groupBy("term_a", "term_b").agg(count(lit(1)).as("n_pair"))
        .where(col("n_pair") >= 5)
        .join(marg.select(col("term").as("term_a"), col("n_t").as("n_a")), "term_a")
        .join(marg.select(col("term").as("term_b"), col("n_t").as("n_b")), "term_b")
        .withColumn("assoc",
          (col("n_pair").cast("double") * lit(total.toDouble)) /
            (col("n_a").cast("double") * col("n_b").cast("double")))
    }),

    // Pairwise source-similarity from KMV sketches — the operation HLL
    // registers cannot do: bottom-k sketches are comparable VALUE
    // samples, so the resemblance of two sources estimates from sketch
    // rows alone (|bottom-k of the union ∩ both sketches| / k), never
    // re-touching the corpus. 20 sources → 190 pairs of ≤ 2k sketch
    // rows each; one integer division per pair at the end.
    "text_kmv_jaccard" -> ((s, dir) => {
      import org.apache.spark.sql.functions.{col, count, explode, lit, max,
        row_number, sum}
      val TF = graft.functions.TextFunctions
      val grams = docs(s, dir)
        .select(col("source"), TF.tokens(col("text")).as("__toks"))
        .select(col("source"),
          explode(TF.wordShingles(col("__toks"), 3)).as("gram"))
      val sk = graft.ops.Sketches.kmvSketch(grams, Seq("source"), "gram", 64)
        .localCheckpoint(true) // sketch-sized (sources × k); read thrice
      val srcs = sk.select("source").distinct()
      val pairs = srcs.select(col("source").as("sa"))
        .crossJoin(srcs.select(col("source").as("sb")))
        .where(col("sa") < col("sb")) // source-dim × source-dim, broadcast
      val ra = pairs.join(sk.select(col("source").as("sa"), col("h")), "sa")
        .select(col("sa"), col("sb"), col("h"),
          lit(1L).as("ina"), lit(0L).as("inb"))
      val rb = pairs.join(sk.select(col("source").as("sb"), col("h")), "sb")
        .select(col("sa"), col("sb"), col("h"),
          lit(0L).as("ina"), lit(1L).as("inb"))
      val W = org.apache.spark.sql.expressions.Window
        .partitionBy("sa", "sb").orderBy("h")
      ra.unionByName(rb)
        .groupBy("sa", "sb", "h")
        .agg(max("ina").as("ina"), max("inb").as("inb"))
        .withColumn("__rn", row_number().over(W)).where(col("__rn") <= 64)
        .groupBy("sa", "sb")
        .agg(count(lit(1)).as("n_sketch"),
          sum(col("ina") * col("inb")).as("n_shared"))
        .withColumn("jaccard_est",
          col("n_shared").cast("double") / col("n_sketch").cast("double"))
    }),

    // EXACT φ-frequent shingles (φ = 1/4000) with bounded state:
    // per-partition Misra-Gries candidate summaries (⌈1/φ⌉ counters per
    // task, never the shingle vocabulary) + one exact broadcast-semi-
    // joined recount. The sketch only prunes candidates — no false
    // negatives by the MG guarantee — so the result equals the plain
    // GROUP BY/HAVING the oracle runs, at bounded aggregation state.
    "text_heavy_hitters" -> ((s, dir) => {
      import org.apache.spark.sql.functions.{col, explode}
      val TF = graft.functions.TextFunctions
      val grams = docs(s, dir)
        .select(TF.tokens(col("text")).as("__toks"))
        .select(explode(TF.wordShingles(col("__toks"), 3)).as("gram"))
      graft.ops.TextAnalysis.heavyHitters(grams, "gram",
        phiNum = 1, phiDen = 4000)
    })
  )

  /** The fixed BM25 query set (terms drawn from the synthetic corpus
    * vocabulary) — one copy, shared by the query and its oracle VALUES. */
  private val Bm25Queries: Seq[(Long, String)] = Seq(
    (0L, "spark merge join"),
    (1L, "window sort batch stream"),
    (2L, "customer order line data"),
    (3L, "vector quantile zorder"))

  /** Mixture weights for text_domain_mix: dyadic (exactly-representable)
    * fractions so `(w * budget).toLong` is identical in any engine. */
  private val DomainWeights: Map[String, Double] =
    ((0 until 10).map(i => s"src$i" -> 0.0625) ++
      (10 until 20).map(i => s"src$i" -> 0.03125)).toMap

  private val toksSql = "regexp_split_to_array(trim(text), '\\s+')"

  /** RAKE phrase delimiters — the gopherRules stopword list. */
  private val RakeStopwords = Seq("the", "a", "an", "of", "to", "in",
    "and", "is", "it", "that", "for", "on", "with", "as")
  private val rakeStopSql = RakeStopwords.map(s => s"'$s'").mkString(", ")

  /** Merge rounds for the BPE queries — shared by the Spark side and the
    * generated oracle CTE chain so they always train the same table. */
  private val BpeMerges = 8

  /** text_epoch_plan budgets — ONE copy, Spark map + oracle VALUES;
    * spans under-budget (epochs = 0), near-1, and multi-epoch sources. */
  private val EpochBudgets: Seq[(String, Long)] =
    (0 until 20).map(i => (s"src$i", 40000L + 35000L * i))

  private def epochBudgetsSql: String =
    EpochBudgets.map { case (s0, b) => s"('$s0', ${b}::BIGINT)" }.mkString(", ")

  /** The BPE training fold as chained CTEs — the oracle mirror of
    * [[graft.ops.Bpe.trainMerges]]: w0 is the word-frequency table with
    * the double-space symbol string, and each round i derives pair
    * counts (p_i), the deterministic argmax (b_i: count desc, l, r) and
    * the merged vocabulary (w_i) by the same literal string replace the
    * Spark side applies. `withFinal` additionally emits the
    * post-last-merge vocabulary w_m for the segmentation oracle. */
  private def bpeCtes(m: Int, withFinal: Boolean): String = {
    val sb = new StringBuilder
    sb.append(
      s"""w0 AS (
         |  SELECT w, count(*) AS freq,
         |    '  ' || list_aggregate(regexp_split_to_array(w, ''), 'string_agg', '  ') || '  ' AS s
         |  FROM (SELECT unnest($toksSql) AS w FROM documents WHERE text IS NOT NULL) t
         |  WHERE w <> '' GROUP BY w)""".stripMargin)
    for (i <- 1 to m) {
      sb.append(
        s""",
           |p$i AS (
           |  SELECT pr[pi] AS l, pr[pi+1] AS r, sum(freq) AS n
           |  FROM (SELECT freq, list_filter(string_split(s, '  '), x -> x <> '') AS pr
           |        FROM w${i - 1}) t,
           |       unnest(range(1, len(pr))) AS u(pi)
           |  GROUP BY 1, 2),
           |b$i AS (SELECT l, r, n FROM p$i ORDER BY n DESC, l, r LIMIT 1)""".stripMargin)
      if (i < m || withFinal) sb.append(
        s""",
           |w$i AS (
           |  SELECT w, freq, replace(s, ' ' || l || '  ' || r || ' ', ' ' || l || r || ' ') AS s
           |  FROM w${i - 1} CROSS JOIN b$i)""".stripMargin)
    }
    sb.toString
  }

  /** [[Bm25Queries]] as a SQL VALUES list (single copy of the fixture). */
  private def bm25ValuesSql: String =
    Bm25Queries.map { case (q, t) => s"($q, '$t')" }.mkString(", ")

  /** The BM25 CTE chain through `r` (ranked lexical list) over a
    * caller-supplied query CTE `q(qid, qtext)` — ONE mirror of
    * [[graft.ops.Retrieval.bm25TopK]] (rational idf, identical
    * parenthesization: IEEE double ops on exact inputs; constants written
    * as the same double expressions Spark evaluates, e.g. `1.2 + 1.0`
    * rather than the literal `2.2`, whose nearest double differs from the
    * computed sum; the per-(qid, doc) contribution folded in term order),
    * shared by the text_bm25 and text_hybrid_retrieval oracles. */
  private def bm25Ctes(qDef: String, src: String = "documents"): String =
    s"""toks AS (
       |  SELECT doc_id, unnest($toksSql) AS term FROM $src),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
       |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       |dl AS (SELECT doc_id, sum(tf)::BIGINT AS dl FROM tf GROUP BY 1),
       |stats AS (SELECT count(*)::BIGINT AS nd, sum(dl)::BIGINT AS tt FROM dl),
       |$qDef,
       |qt AS (SELECT qid::BIGINT AS qid,
       |         unnest(list_distinct(regexp_split_to_array(trim(qtext), '\\s+'))) AS term
       |       FROM q),
       |cand AS (
       |  SELECT qt.qid, tf.doc_id, tf.term,
       |    ((((nd::DOUBLE - df::DOUBLE) + 0.5::DOUBLE) / (df::DOUBLE + 0.5::DOUBLE))
       |     * (tf::DOUBLE * (1.2::DOUBLE + 1.0::DOUBLE)))
       |    / (tf::DOUBLE + (1.2::DOUBLE * (0.25::DOUBLE
       |         + ((0.75::DOUBLE * dl::DOUBLE) / (tt::DOUBLE / nd::DOUBLE))))) AS v
       |  FROM tf JOIN qt USING (term) JOIN dfq USING (term)
       |       JOIN dl USING (doc_id), stats),
       |scored AS (
       |  SELECT qid, doc_id,
       |    list_reduce(list_prepend(0.0, list(v ORDER BY term)), (a, x) -> a + x) AS score
       |  FROM cand GROUP BY 1, 2),
       |r AS (
       |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS rank
       |  FROM scored)""".stripMargin

  /** The PII masking rewrite over a SQL expression — the SINGLE mirror of
    * [[graft.ops.TextAnalysis.piiRedactCol]] (email → URL → phone order,
    * global flag); shared by the text_pii_redact and text_prep_pipeline
    * oracles so a pattern fix reaches every mirror at once. */
  private def piiRedactSql(e: String) =
    s"""regexp_replace(
       |      regexp_replace(
       |        regexp_replace($e,
       |          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
       |        'https?://[^\\s]+', '<URL>', 'g'),
       |      '\\+?[0-9][0-9()\\- ]{7,}[0-9]', '<PHONE>', 'g')""".stripMargin

  /** Median/MAD screen CTEs (lt/med/d/mad) over `src` — the SINGLE mirror
    * of [[graft.ops.Curation.lengthOutliers]]' centers (null-safe joins,
    * quantile_cont at 0.5); shared by text_length_outliers and
    * text_prep_pipeline. */
  private def madCtes(src: String) =
    s"""lt AS (
       |  SELECT doc_id, source, len($toksSql)::BIGINT AS n_tokens FROM $src),
       |med AS (SELECT source, quantile_cont(n_tokens, 0.5) AS med FROM lt GROUP BY source),
       |d AS (
       |  SELECT lt.doc_id, lt.source, lt.n_tokens, med.med,
       |         abs(lt.n_tokens - med.med) AS absdev
       |  FROM lt JOIN med ON lt.source IS NOT DISTINCT FROM med.source),
       |mad AS (SELECT source, quantile_cont(absdev, 0.5) AS mad FROM d GROUP BY source)""".stripMargin

  /** Chunk CTEs (s/ch) over a CTE named `t` carrying (doc_id, toks) — the
    * SINGLE mirror of [[graft.ops.TextAnalysis.chunkTokens]]' stride/slice
    * arithmetic; shared by text_chunk, text_chunk_pack, and
    * text_prep_pipeline. */
  private def chunkCtes(chunkSize: Int, stride: Int) =
    s"""s AS (
       |  SELECT doc_id, toks,
       |         unnest(generate_series(0, len(toks) - 1, $stride)) AS strt
       |  FROM t),
       |ch AS (
       |  SELECT doc_id, strt // $stride AS chunk_id,
       |         toks[strt + 1 : strt + $chunkSize] AS chunk
       |  FROM s)""".stripMargin

  /** The exclusive-prefix-sum packing tail (c) + final projection over the
    * `ch` chunk CTE — shared by text_chunk_pack and text_prep_pipeline. */
  private def packTailSql(budget: Int) =
    s"""c AS (
       |  SELECT doc_id, chunk_id, len(chunk)::BIGINT AS n_chunk_tokens,
       |         sum(len(chunk)::BIGINT) OVER (ORDER BY doc_id, chunk_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM ch)
       |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id, n_chunk_tokens,
       |       ((cum - n_chunk_tokens) // $budget)::BIGINT AS pack_id FROM c""".stripMargin
  private def h60(e: String) = s"('0x'||substr(md5($e),1,15))::BIGINT"

  /** Generated chained-CTE Viterbi DP for text_unigram_segment (the
    * bpeCtes technique): dp_i holds each word's best length-i-prefix
    * segmentation under (n_pieces ASC, sum_freq DESC, seq ASC); every
    * stage is MATERIALIZED — dp_j feeds up to 4 later stages, and
    * DuckDB re-inlines plain CTEs per reference (exponential without
    * the hint). Substring/ordering semantics match the Spark DP
    * operand for operand. */
  private def viterbiCtes(maxLen: Int): String = {
    val dps = (1 to maxLen).map { i =>
      val branches = (math.max(0, i - 4) until i).map { j =>
        s"""    SELECT d.word, d.len, d.n_pieces + 1 AS n_pieces,
           |           d.sum_freq + v.freq AS sum_freq,
           |           CASE WHEN d.seq = '' THEN v.piece
           |                ELSE d.seq || ' ' || v.piece END AS seq
           |    FROM dp$j d JOIN vocab v
           |      ON d.len >= $i AND v.piece = substr(d.word, ${j + 1}, ${i - j})""".stripMargin
      }.mkString("\n    UNION ALL\n")
      s"""dp$i AS MATERIALIZED (
         |  SELECT word, len, n_pieces, sum_freq, seq FROM (
         |    SELECT c.*, row_number() OVER (PARTITION BY word
         |      ORDER BY n_pieces, sum_freq DESC, seq) AS rn
         |    FROM (
         |$branches) c)
         |  WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    s"""toks AS MATERIALIZED (
       |  SELECT w AS word, count(*)::BIGINT AS cnt, len(w)::INT AS len
       |  FROM (SELECT unnest($toksSql) AS w FROM documents) GROUP BY 1),
       |p AS (
       |  SELECT t.cnt, substr(t.word, s.s::INT, l.l::INT) AS piece
       |  FROM toks t, range(1, 65) s(s), range(1, 5) l(l)
       |  WHERE s.s <= t.len AND s.s + l.l - 1 <= t.len),
       |vocab AS MATERIALIZED (
       |  SELECT piece, freq FROM (
       |    SELECT piece, sum(cnt)::BIGINT AS freq FROM p GROUP BY 1)
       |  WHERE freq >= 3 OR len(piece) = 1),
       |dp0 AS MATERIALIZED (
       |  SELECT word, len, 0::BIGINT AS n_pieces, 0::BIGINT AS sum_freq,
       |         '' AS seq
       |  FROM toks WHERE len BETWEEN 1 AND $maxLen),
       |$dps""".stripMargin
  }

  /** DSIR mirror: same normalize → tokens → unigram+bigram features →
    * hash-bucket pipeline, same add-one ratio expression order, same
    * bucket-sorted 0.0-seeded left fold (Curation.dsirScores). */
  private lazy val dsirSql = {
    def featCte(name: String, where: String) =
      s"""norm_$name AS (
         |  SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS t
         |  FROM documents $where),
         |toks_$name AS (
         |  SELECT doc_id, regexp_split_to_array(trim(t), '\\s+') AS tk FROM norm_$name),
         |fb_$name AS (
         |  SELECT doc_id, (${h60("feat")} % 1024) AS bucket FROM (
         |    SELECT doc_id, unnest(list_concat(tk,
         |      CASE WHEN len(tk) < 2 THEN []::VARCHAR[]
         |           ELSE list_transform(range(1, len(tk)),
         |                  i -> tk[i::INT] || ' ' || tk[(i+1)::INT]) END)) AS feat
         |    FROM toks_$name))""".stripMargin
    s"""WITH ${featCte("raw", "")},
       |${featCte("tgt", "WHERE source = 'src0'")},
       |tb AS (SELECT bucket, count(*) AS t_b FROM fb_tgt GROUP BY 1),
       |rb AS (SELECT bucket, count(*) AS r_b FROM fb_raw GROUP BY 1),
       |tt AS (SELECT sum(t_b)::BIGINT AS t_total FROM tb),
       |rt AS (SELECT sum(r_b)::BIGINT AS r_total FROM rb),
       |ratios AS (
       |  SELECT rb.bucket,
       |    ((coalesce(t_b, 0) + 1)::DOUBLE * (r_total + 1024)::DOUBLE) /
       |    ((r_b + 1)::DOUBLE * (t_total + 1024)::DOUBLE) AS ratio
       |  FROM rb LEFT JOIN tb USING (bucket) CROSS JOIN tt CROSS JOIN rt),
       |db AS (SELECT doc_id, bucket, count(*) AS c FROM fb_raw GROUP BY 1, 2),
       |terms AS (SELECT doc_id, bucket, c::DOUBLE * ratio AS term, c
       |          FROM db JOIN ratios USING (bucket)),
       |agg AS (
       |  SELECT doc_id,
       |    list_reduce(list_prepend(0.0, list(term ORDER BY bucket)), (a, x) -> a + x) AS tsum,
       |    sum(c)::BIGINT AS n_feats
       |  FROM terms GROUP BY doc_id)
       |SELECT doc_id, n_feats, tsum / n_feats::DOUBLE AS dsir_score FROM agg""".stripMargin
  }

  private val langValues = TextAnalysis.LangStopwords.map { case (lang, words) =>
    s"('$lang', [${words.map(w => s"'$w'").mkString(",")}])"
  }.mkString(", ")

  /** HLL mirror over the full corpus — shared verbatim by
    * text_hll_distinct and text_hll_merged (the merge law says the
    * parity-half MAX-merge must equal this single pass). m = 64, p = 6:
    * bucket = low 6 bits, 54-bit remainder, rho = 55 − bitlen (bin() is
    * exact integer formatting in both engines, no log2), 2^-r written as
    * 1/(1<<r) (exact doubles, no pow), folded in bucket order. */
  private val hllSql =
    s"""WITH toks AS (SELECT source, unnest($toksSql) AS term FROM documents),
       |h AS (SELECT source, ${h60("'hll:'||term")} AS h FROM toks),
       |r AS (SELECT source, h % 64 AS bucket,
       |        CASE WHEN (h // 64) = 0 THEN 55 ELSE 55 - length(bin(h // 64)) END AS rho
       |      FROM h),
       |regs AS (SELECT source, bucket, max(rho)::BIGINT AS register FROM r GROUP BY 1, 2),
       |est AS (SELECT source, count(*)::BIGINT AS n_buckets_set,
       |        list_reduce(list_prepend(0.0::DOUBLE,
       |          list((1.0::DOUBLE / ((1::BIGINT << register::INT)::DOUBLE)) ORDER BY bucket)),
       |          (a, x) -> a + x) AS fold
       |      FROM regs GROUP BY 1)
       |SELECT source, n_buckets_set,
       |  ((0.7213::DOUBLE / (1.0::DOUBLE + 1.079::DOUBLE / 64.0::DOUBLE))
       |    * 64.0::DOUBLE * 64.0::DOUBLE)
       |  / ((64 - n_buckets_set)::DOUBLE + fold) AS hll_distinct
       |FROM est""".stripMargin

  /** KMV mirror over the full corpus — shared verbatim by
    * text_kmv_distinct and text_kmv_merged (the merge law says the
    * parity-half bottom-k merge must equal this single pass). k = 64
    * over 3-word shingles; 63·2^60 is an exactly representable double
    * (mantissa 63), so the estimate is ONE correctly-rounded division in
    * both engines; groups under 64 distinct hashes are exact counts. */
  private val kmvSql =
    s"""WITH t AS (SELECT source, $toksSql AS tk FROM documents),
       |g AS (SELECT source, unnest(CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
       |  ELSE list_transform(range(1, len(tk)-1),
       |         i -> array_to_string(list_slice(tk, i::INT, i::INT+2), ' ')) END) AS gram
       |  FROM t),
       |h AS (SELECT DISTINCT source, ${h60("'kmv:'||gram")} AS h FROM g),
       |r AS (SELECT source, h,
       |        row_number() OVER (PARTITION BY source ORDER BY h) AS rn FROM h),
       |s AS (SELECT source, count(*)::BIGINT AS n_min_vals, max(h) AS kth_min
       |      FROM r WHERE rn <= 64 GROUP BY source)
       |SELECT source, n_min_vals, kth_min,
       |  CASE WHEN n_min_vals < 64 THEN n_min_vals::DOUBLE
       |       ELSE (63.0::DOUBLE * 1152921504606846976.0::DOUBLE) / kth_min::DOUBLE
       |  END AS kmv_distinct
       |FROM s""".stripMargin

  /** Quantile-sketch mirror over the full corpus — shared verbatim by
    * text_quantile_sketch and text_quantile_merged (the merge law says
    * the parity-half bottom-k merge must equal this single pass). The
    * sketch is the k=256 rows with the smallest md5-derived hashes of
    * their doc_id (a deterministic uniform row sample — pure function
    * of the input multiset, so both engines re-derive it
    * bit-identically); the estimate is rank-based selection on exact
    * integers, ⌈num·n/den⌉ as `(num·n + den − 1) // den` — no
    * interpolation, the value IS an element of the data. */
  private val quantileSketchSql =
    s"""WITH t AS (SELECT source, doc_id, len($toksSql)::BIGINT AS v FROM documents),
       |h AS (SELECT source, ${h60("'qsk:'||doc_id::VARCHAR")} AS h, v FROM t),
       |r AS (SELECT source, h, v,
       |        row_number() OVER (PARTITION BY source ORDER BY h, v) AS rn FROM h),
       |sk AS (SELECT source, h, v FROM r WHERE rn <= 256),
       |o AS (SELECT source, h, v,
       |        row_number() OVER (PARTITION BY source ORDER BY v, h) AS vr,
       |        count(*) OVER (PARTITION BY source) AS n
       |      FROM sk),
       |q(num, den) AS (VALUES (1, 4), (1, 2), (3, 4), (9, 10))
       |SELECT source, num / den AS q, n::BIGINT AS n_sample, v AS q_value
       |FROM o CROSS JOIN q
       |WHERE vr = (num * n + den - 1) // den""".stripMargin

  /** CMS mirror (4×256, watchlist = the stopword fixture) — shared by
    * text_cms_counts and text_cms_merged (cell sums are additive, so the
    * parity-half SUM-merge must equal this single pass). One md5 per
    * term; row i's cell is the i-th 15-bit slice of the 60-bit digest —
    * the [[graft.ops.Sketches.cmsBuild]] cell function verbatim. */
  private val cmsSql = {
    val watch = graft.functions.TextFunctions.StopwordsEn
      .map(t => s"('$t')").mkString(", ")
    s"""WITH toks AS (SELECT unnest($toksSql) AS term FROM documents),
       |hashed AS (SELECT ${h60("'cms:'||term")} AS h FROM toks),
       |cells AS (
       |  SELECT i, ((h >> (i * 15)::INT) & 32767) % 256 AS col,
       |         count(*)::BIGINT AS cnt
       |  FROM hashed, range(4) t(i) GROUP BY 1, 2),
       |watch(term) AS (VALUES $watch),
       |wh AS (SELECT term, ${h60("'cms:'||term")} AS h FROM watch),
       |probe AS (
       |  SELECT term, i, ((h >> (i * 15)::INT) & 32767) % 256 AS col
       |  FROM wh, range(4) t(i))
       |SELECT term, min(coalesce(cnt, 0::BIGINT))::BIGINT AS cms_count
       |FROM probe LEFT JOIN cells USING (i, col)
       |GROUP BY 1""".stripMargin
  }

  /** One copy of the BM25 ⊕ phrase RRF oracle — shared by the
    * recompute query (text_phrase_retrieval) and the maintained-index
    * composition (text_retrieval_after_ingest), whose probe is
    * bit-identical to recompute by design. */
  private lazy val phraseRetrievalOracle: String =
    s"""WITH ${bm25Ctes(s"q(qid, qtext) AS (VALUES $bm25ValuesSql)")},
         |lex AS (SELECT qid, doc_id, rank FROM r WHERE rank <= 10),
         |dtk AS (SELECT doc_id, $toksSql AS t FROM documents),
         |dbi AS (
         |  SELECT DISTINCT doc_id,
         |    unnest(list_transform(range(1, len(t)),
         |      i -> t[i::INT] || ' ' || t[(i+1)::INT])) AS bigram
         |  FROM dtk),
         |qtk AS (SELECT qid::BIGINT AS qid,
         |          regexp_split_to_array(trim(qtext), '\\s+') AS t FROM q),
         |qbi AS (
         |  SELECT qid, unnest(list_distinct(list_transform(range(1, len(t)),
         |    i -> t[i::INT] || ' ' || t[(i+1)::INT]))) AS bigram
         |  FROM qtk),
         |ph AS (
         |  SELECT qid, doc_id, count(*)::BIGINT AS hits
         |  FROM dbi JOIN qbi USING (bigram) GROUP BY 1, 2),
         |phr AS (
         |  SELECT qid, doc_id,
         |         row_number() OVER (PARTITION BY qid ORDER BY hits DESC, doc_id) AS rank
         |  FROM ph QUALIFY rank <= 10),
         |fused AS (
         |  SELECT coalesce(lex.qid, phr.qid) AS qid,
         |         coalesce(lex.doc_id, phr.doc_id) AS doc_id,
         |         coalesce(1.0::DOUBLE / (60 + lex.rank), 0.0::DOUBLE)
         |           + coalesce(1.0::DOUBLE / (60 + phr.rank), 0.0::DOUBLE) AS rrf_score
         |  FROM lex FULL OUTER JOIN phr
         |    ON lex.qid = phr.qid AND lex.doc_id = phr.doc_id)
         |SELECT qid, doc_id, rrf_score,
         |       row_number() OVER (PARTITION BY qid ORDER BY rrf_score DESC, doc_id)::BIGINT AS rank
         |FROM fused QUALIFY rank <= 5""".stripMargin

  val oracles: Map[String, String] = Map(
    "text_hll_distinct" -> hllSql,
    "text_hll_merged" -> hllSql,
    "text_cms_counts" -> cmsSql,
    "text_cms_merged" -> cmsSql,
    "text_kmv_distinct" -> kmvSql,
    "text_kmv_merged" -> kmvSql,
    "text_quantile_sketch" -> quantileSketchSql,
    "text_quantile_merged" -> quantileSketchSql,
    "text_quantile_after_ingest" -> quantileSketchSql,

    "text_sample_per_source" ->
      s"""WITH h AS (SELECT source, doc_id, lang,
         |             ${h60("'smp:'||doc_id::VARCHAR")} AS h FROM documents),
         |r AS (SELECT source, doc_id, lang,
         |        row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS rk
         |      FROM h)
         |SELECT source, doc_id, lang, rk::BIGINT AS sample_rank
         |FROM r WHERE rk <= 5""".stripMargin,

    // The sketch-derived quality floor: same quality CTE as
    // text_quality_cutoff, cutoff = the bottom-256 hash sample's value
    // at rank ceil(n/5) (discrete, an element of the data).
    "text_quality_cutoff_sketch" ->
      s"""WITH t AS (SELECT doc_id, source, text, $toksSql AS toks FROM documents),
         |sig AS (
         |  SELECT doc_id, source,
         |    least(len(toks)::DOUBLE / 100.0, 1.0) AS len_score,
         |    CASE WHEN len(toks) = 0 THEN 0.0
         |         ELSE len(list_distinct(toks))::DOUBLE / len(toks)::DOUBLE END AS diversity,
         |    CASE WHEN len(toks) = 0 THEN 0.0
         |         ELSE len(list_filter(toks, x -> list_contains(
         |              ['the','a','an','of','to','in','and','is','it','that','for','on','with','as'], x)))::DOUBLE
         |              / len(toks)::DOUBLE END AS stopword_ratio,
         |    CASE WHEN len(text) = 0 THEN 0.0
         |         ELSE len(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))::DOUBLE
         |              / len(text)::DOUBLE END AS punct_ratio
         |  FROM t),
         |q AS (
         |  SELECT doc_id, source,
         |    (len_score + diversity + least(stopword_ratio * 5.0, 1.0)
         |     + (1.0 - least(punct_ratio * 4.0, 1.0))) / 4.0 AS quality
         |  FROM sig),
         |hh AS (SELECT source, doc_id, quality,
         |         ${h60("'qsk:'||doc_id::VARCHAR")} AS h FROM q),
         |r AS (SELECT source, h, quality AS v,
         |        row_number() OVER (PARTITION BY source ORDER BY h, quality) AS rn FROM hh),
         |sk AS (SELECT source, h, v FROM r WHERE rn <= 256),
         |o AS (SELECT source, h, v,
         |        row_number() OVER (PARTITION BY source ORDER BY v, h) AS vr,
         |        count(*) OVER (PARTITION BY source) AS n FROM sk),
         |cut AS (SELECT source, v AS q_cutoff FROM o WHERE vr = (1 * n + 4) // 5)
         |SELECT q.source, q.doc_id, q.quality, cut.q_cutoff
         |FROM q JOIN cut USING (source) WHERE q.quality >= cut.q_cutoff""".stripMargin,

    "text_cooccurrence" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS tk FROM documents),
         |g AS (SELECT doc_id, unnest(tk) AS term,
         |        unnest(range(1, len(tk)+1)) AS pos FROM t),
         |tot AS (SELECT count(*)::BIGINT AS n FROM g),
         |marg AS (SELECT term, count(*)::BIGINT AS n_t FROM g GROUP BY term),
         |pr AS (
         |  SELECT least(a.term, b.term) AS term_a, greatest(a.term, b.term) AS term_b
         |  FROM g a JOIN g b
         |    ON a.doc_id = b.doc_id AND b.pos BETWEEN a.pos + 1 AND a.pos + 3),
         |pc AS (SELECT term_a, term_b, count(*)::BIGINT AS n_pair FROM pr
         |       GROUP BY 1, 2 HAVING count(*) >= 5)
         |SELECT pc.term_a, pc.term_b, pc.n_pair, ma.n_t AS n_a, mb.n_t AS n_b,
         |       (pc.n_pair::DOUBLE * tot.n::DOUBLE)
         |         / (ma.n_t::DOUBLE * mb.n_t::DOUBLE) AS assoc
         |FROM pc
         |JOIN marg ma ON pc.term_a = ma.term
         |JOIN marg mb ON pc.term_b = mb.term
         |CROSS JOIN tot""".stripMargin,

    "text_kmv_jaccard" ->
      s"""WITH t AS (SELECT source, $toksSql AS tk FROM documents),
         |g AS (SELECT source, unnest(CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
         |  ELSE list_transform(range(1, len(tk)-1),
         |         i -> array_to_string(list_slice(tk, i::INT, i::INT+2), ' ')) END) AS gram
         |  FROM t),
         |h AS (SELECT DISTINCT source, ${h60("'kmv:'||gram")} AS h FROM g),
         |r AS (SELECT source, h,
         |        row_number() OVER (PARTITION BY source ORDER BY h) AS rn FROM h),
         |sk AS (SELECT source, h FROM r WHERE rn <= 64),
         |p AS (SELECT a.source AS sa, b.source AS sb
         |      FROM (SELECT DISTINCT source FROM sk) a
         |      JOIN (SELECT DISTINCT source FROM sk) b ON a.source < b.source),
         |u AS (
         |  SELECT p.sa, p.sb, s.h,
         |         max(CASE WHEN s.source = p.sa THEN 1 ELSE 0 END) AS ina,
         |         max(CASE WHEN s.source = p.sb THEN 1 ELSE 0 END) AS inb
         |  FROM p JOIN sk s ON s.source = p.sa OR s.source = p.sb
         |  GROUP BY 1, 2, 3),
         |rk AS (SELECT sa, sb, h, ina, inb,
         |         row_number() OVER (PARTITION BY sa, sb ORDER BY h) AS rn FROM u),
         |agg AS (SELECT sa, sb, count(*)::BIGINT AS n_sketch,
         |          sum(ina * inb)::BIGINT AS n_shared
         |        FROM rk WHERE rn <= 64 GROUP BY 1, 2)
         |SELECT sa, sb, n_sketch, n_shared,
         |       n_shared::DOUBLE / n_sketch::DOUBLE AS jaccard_est
         |FROM agg""".stripMargin,

    "text_heavy_hitters" ->
      s"""WITH t AS (SELECT $toksSql AS tk FROM documents),
         |g AS (SELECT unnest(CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
         |  ELSE list_transform(range(1, len(tk)-1),
         |         i -> array_to_string(list_slice(tk, i::INT, i::INT+2), ' ')) END) AS gram
         |  FROM t),
         |n AS (SELECT count(*)::BIGINT AS total FROM g)
         |SELECT gram, count(*)::BIGINT AS cnt
         |FROM g CROSS JOIN n
         |GROUP BY gram, total
         |HAVING 4000 * count(*) >= 1 * total""".stripMargin,

    "text_span_dup_rate" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS tk FROM documents),
         |g AS (
         |  SELECT doc_id, unnest(CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
         |    ELSE list_transform(range(1, len(tk)-1),
         |           i -> array_to_string(list_slice(tk, i::INT, i::INT+2), ' ')) END) AS gram
         |  FROM t),
         |gh AS (SELECT doc_id, ${h60("gram")} AS h FROM g),
         |c AS (SELECT h, count(*) AS n FROM gh GROUP BY h)
         |SELECT doc_id, count(*)::BIGINT AS n_spans,
         |  sum(CASE WHEN n > 1 THEN 1 ELSE 0 END)::BIGINT AS n_dup_spans,
         |  sum(CASE WHEN n > 1 THEN 1 ELSE 0 END)::DOUBLE / count(*)::DOUBLE AS dup_rate
         |FROM gh JOIN c USING (h)
         |GROUP BY doc_id""".stripMargin,

    "text_length_buckets" ->
      s"""WITH t AS (SELECT doc_id, len($toksSql)::BIGINT AS n FROM documents),
         |c AS (
         |  SELECT doc_id, n,
         |    CASE WHEN n <= 1 THEN 1
         |         ELSE (1::BIGINT << length(bin(n - 1))::INT) END AS cap
         |  FROM t)
         |SELECT cap, count(*) AS n_docs,
         |  sum(n)::BIGINT AS total_tokens,
         |  CAST(sum(cap - n) AS BIGINT) AS padding_waste,
         |  sum(n)::DOUBLE / (count(*) * cap)::DOUBLE AS efficiency
         |FROM c GROUP BY cap""".stripMargin,

    // RAKE mirror: token positions -> stopword break counter -> phrase
    // runs (list ORDER BY pos), deg/freq word stats, per-phrase ordered
    // fold of word scores, top-20 on (score desc, phrase).
    "text_keyphrases" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS tk FROM documents),
         |tok AS (
         |  SELECT doc_id, unnest(tk) AS w, generate_subscripts(tk, 1) AS pos
         |  FROM t),
         |m AS (SELECT doc_id, pos, w, w IN ($rakeStopSql) AS is_stop FROM tok),
         |b AS (
         |  SELECT *, sum(CASE WHEN is_stop THEN 1 ELSE 0 END)
         |    OVER (PARTITION BY doc_id ORDER BY pos) AS brk
         |  FROM m),
         |ph AS (
         |  SELECT doc_id, brk, list(w ORDER BY pos) AS ws,
         |         count(*)::BIGINT AS plen,
         |         array_to_string(list(w ORDER BY pos), ' ') AS phrase
         |  FROM b WHERE NOT is_stop GROUP BY 1, 2),
         |wstats AS (
         |  SELECT w, count(*) AS freq, sum(plen)::BIGINT AS deg
         |  FROM (SELECT unnest(ws) AS w, plen FROM ph) GROUP BY 1),
         |pw AS (
         |  SELECT doc_id, brk, phrase, unnest(ws) AS w,
         |         generate_subscripts(ws, 1) AS wpos
         |  FROM ph),
         |sc AS (
         |  SELECT doc_id, brk, phrase,
         |    list_reduce(list_prepend(0.0,
         |      list(deg::DOUBLE / freq::DOUBLE ORDER BY wpos)),
         |      (a, x) -> a + x) AS score
         |  FROM pw JOIN wstats USING (w) GROUP BY 1, 2, 3)
         |SELECT phrase, count(*) AS n_occurrences, max(score) AS score
         |FROM sc GROUP BY 1
         |ORDER BY score DESC, phrase LIMIT 20""".stripMargin,

    "text_novelty" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS tk FROM documents),
         |g AS (
         |  SELECT doc_id, unnest(CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
         |    ELSE list_transform(range(1, len(tk)-1),
         |           i -> array_to_string(list_slice(tk, i::INT, i::INT+2), ' ')) END) AS gram
         |  FROM t),
         |gh AS (SELECT DISTINCT doc_id, ${h60("gram")} AS h FROM g),
         |c AS (SELECT h, count(*) AS df FROM gh GROUP BY h)
         |SELECT doc_id, count(*) AS n_grams,
         |  CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
         |  sum(CASE WHEN df = 1 THEN 1 ELSE 0 END)::DOUBLE / count(*)::DOUBLE
         |    AS novelty
         |FROM gh JOIN c USING (h)
         |GROUP BY doc_id""".stripMargin,

    "text_gopher_filter" ->
      s"""WITH t AS (SELECT doc_id, text, $toksSql AS toks FROM documents),
         |sig AS (
         |  SELECT doc_id,
         |    len(toks)::BIGINT AS n_words,
         |    CASE WHEN len(toks) = 0 THEN 0.0
         |         ELSE CAST(list_sum(list_transform(toks, x -> len(x))) AS DOUBLE)
         |              / len(toks)::DOUBLE END AS mean_word_len,
         |    (len(text) - len(replace(text, '#', ''))
         |     + (len(text) - len(replace(text, '...', ''))) // 3)::DOUBLE
         |      / len(toks)::DOUBLE AS symbol_ratio,
         |    len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]')))::DOUBLE
         |      / len(toks)::DOUBLE AS alpha_frac,
         |    len(list_intersect(list_distinct(toks),
         |      ['the','a','an','of','to','in','and','is','it','that','for','on','with','as']))::BIGINT
         |      AS stopword_kinds
         |  FROM t)
         |SELECT doc_id, n_words, mean_word_len, symbol_ratio, alpha_frac, stopword_kinds,
         |  n_words >= 50 AND n_words <= 100000 AS pass_word_count,
         |  mean_word_len >= 3.0 AND mean_word_len <= 10.0 AS pass_mean_len,
         |  symbol_ratio <= 0.1 AS pass_symbols,
         |  alpha_frac >= 0.8 AS pass_alpha,
         |  stopword_kinds >= 2 AS pass_stopwords,
         |  (n_words >= 50 AND n_words <= 100000)
         |    AND (mean_word_len >= 3.0 AND mean_word_len <= 10.0)
         |    AND symbol_ratio <= 0.1 AND alpha_frac >= 0.8
         |    AND stopword_kinds >= 2 AS pass
         |FROM sig""".stripMargin,

    "text_oov_rate" ->
      s"""WITH tok AS (SELECT doc_id, unnest($toksSql) AS tk FROM documents),
         |vocab AS (SELECT tk, true AS iv FROM (
         |  SELECT tk, count(*) AS n FROM tok GROUP BY tk
         |  ORDER BY n DESC, tk LIMIT 20)),
         |f AS (SELECT doc_id, iv FROM tok LEFT JOIN vocab USING (tk))
         |SELECT doc_id, count(*)::BIGINT AS n_tokens,
         |  sum(CASE WHEN iv IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_oov,
         |  sum(CASE WHEN iv IS NULL THEN 1 ELSE 0 END)::DOUBLE / count(*)::DOUBLE AS oov_rate
         |FROM f GROUP BY doc_id""".stripMargin,

    "text_domain_temperature" ->
      s"""WITH s AS (
         |  SELECT source, CAST(sum(len($toksSql)) AS BIGINT) AS n_tokens
         |  FROM documents GROUP BY source),
         |tot AS (
         |  SELECT list_reduce(list_prepend(0.0,
         |    list(sqrt(n_tokens::DOUBLE) ORDER BY source)), (a, x) -> a + x) AS t
         |  FROM s)
         |SELECT source, n_tokens, sqrt(n_tokens::DOUBLE) / t AS weight,
         |  CAST(floor(sqrt(n_tokens::DOUBLE) / t * 8192) AS BIGINT) AS token_budget
         |FROM s CROSS JOIN tot""".stripMargin,

    "text_curation_v2" ->
      s"""WITH t0 AS (SELECT doc_id, text, source, $toksSql AS toks FROM documents),
         |gsig AS (
         |  SELECT doc_id,
         |    len(toks)::BIGINT AS n_words,
         |    CASE WHEN len(toks) = 0 THEN 0.0
         |         ELSE CAST(list_sum(list_transform(toks, x -> len(x))) AS DOUBLE)
         |              / len(toks)::DOUBLE END AS mean_word_len,
         |    (len(text) - len(replace(text, '#', ''))
         |     + (len(text) - len(replace(text, '...', ''))) // 3)::DOUBLE
         |      / len(toks)::DOUBLE AS symbol_ratio,
         |    len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]')))::DOUBLE
         |      / len(toks)::DOUBLE AS alpha_frac,
         |    len(list_intersect(list_distinct(toks),
         |      ['the','a','an','of','to','in','and','is','it','that','for','on','with','as']))::BIGINT
         |      AS stopword_kinds
         |  FROM t0),
         |gpass AS (
         |  SELECT doc_id FROM gsig
         |  WHERE n_words >= 30 AND n_words <= 100000
         |    AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
         |    AND symbol_ratio <= 0.1 AND alpha_frac >= 0.8 AND stopword_kinds >= 2),
         |g AS (
         |  SELECT doc_id, unnest(CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
         |    ELSE list_transform(range(1, len(toks)-1),
         |           i -> array_to_string(list_slice(toks, i::INT, i::INT+2), ' ')) END) AS gram
         |  FROM t0),
         |gh AS (SELECT doc_id, ${h60("gram")} AS h FROM g),
         |cgl AS (SELECT h, count(*) AS n FROM gh GROUP BY h),
         |spass AS (
         |  SELECT doc_id FROM (
         |    SELECT doc_id,
         |      sum(CASE WHEN n > 1 THEN 1 ELSE 0 END)::DOUBLE / count(*)::DOUBLE AS dup_rate
         |    FROM gh JOIN cgl USING (h) GROUP BY doc_id)
         |  WHERE dup_rate <= 0.9),
         |surv AS (
         |  SELECT d.* FROM documents d
         |  JOIN gpass USING (doc_id) JOIN spass USING (doc_id)),
         |s AS (
         |  SELECT source, CAST(sum(len($toksSql)) AS BIGINT) AS n_tokens
         |  FROM surv GROUP BY source),
         |tot AS (
         |  SELECT list_reduce(list_prepend(0.0,
         |    list(sqrt(n_tokens::DOUBLE) ORDER BY source)), (a, x) -> a + x) AS t
         |  FROM s),
         |bud AS (
         |  SELECT source, CAST(floor(sqrt(n_tokens::DOUBLE) / t * 4096) AS BIGINT) AS budget
         |  FROM s CROSS JOIN tot),
         |mt AS (
         |  SELECT source, doc_id, len($toksSql)::BIGINT AS n_tokens,
         |         ${h60("'mix:' || doc_id::VARCHAR")} AS key
         |  FROM surv),
         |c AS (
         |  SELECT mt.*, bud.budget,
         |    sum(n_tokens) OVER (PARTITION BY source ORDER BY key, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM mt JOIN bud USING (source))
         |SELECT source, doc_id, n_tokens, cum::BIGINT AS cum_tokens
         |FROM c WHERE cum - n_tokens < budget""".stripMargin,

    "text_rolling_fingerprint" ->
      s"""WITH norm AS (
         |  SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS t
         |  FROM documents),
         |codes AS (
         |  SELECT doc_id, len(t) AS n, least(16, len(t)) AS w,
         |         list_transform(range(1, len(t)+1), i -> unicode(t[i::INT])::BIGINT) AS cs
         |  FROM norm)
         |SELECT doc_id,
         |  CASE WHEN n = 0 THEN 0
         |       ELSE list_min(list_transform(range(1, n - w + 2), i ->
         |         list_reduce(list_slice(cs, i::INT, (i + w - 1)::INT),
         |           (a, c) -> (a * 257 + c) % 2147483647))) END AS rolling_fp
         |FROM codes""".stripMargin,

    "text_pack_sequences" ->
      s"""WITH t AS (
         |  SELECT doc_id, lang, len($toksSql)::BIGINT AS n_tokens FROM documents),
         |c AS (
         |  SELECT doc_id, lang, n_tokens,
         |         sum(n_tokens) OVER (PARTITION BY lang ORDER BY n_tokens, doc_id
         |                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM t)
         |SELECT doc_id, lang, n_tokens,
         |       ((cum - n_tokens) // 2048)::BIGINT AS pack_id FROM c""".stripMargin,

    // Coverage mirror: same (count desc, term) order, cumulative
    // occurrence sums, clamped checkpoints, one division.
    "text_vocab_coverage" ->
      s"""WITH t AS (
         |  SELECT unnest($toksSql) AS term FROM documents),
         |c AS (SELECT term, count(*) AS c FROM t GROUP BY 1),
         |r AS (
         |  SELECT c,
         |    row_number() OVER (ORDER BY c DESC, term) AS rank,
         |    sum(c) OVER (ORDER BY c DESC, term ROWS UNBOUNDED PRECEDING) AS cum,
         |    count(*) OVER () AS nv, sum(c) OVER () AS tot
         |  FROM c),
         |k AS (SELECT unnest([10, 100, 1000, 10000]) AS k)
         |SELECT k.k::BIGINT AS k, CAST(r.rank AS BIGINT) AS vocab_rank,
         |       CAST(r.cum AS BIGINT) AS covered_tokens,
         |       CAST(r.tot AS BIGINT) AS total_tokens,
         |       r.cum::DOUBLE / r.tot::DOUBLE AS share
         |FROM k JOIN r ON r.rank = least(k.k, r.nv)""".stripMargin,

    "text_top_ngrams" ->
      s"""WITH toks AS (SELECT $toksSql AS t FROM documents),
         |bg AS (
         |  SELECT unnest(CASE WHEN len(t) < 2 THEN [array_to_string(t, ' ')]
         |    ELSE list_transform(range(1, len(t)),
         |           i -> array_to_string(list_slice(t, i::INT, i::INT+1), ' ')) END) AS bigram
         |  FROM toks)
         |SELECT bigram, count(*) AS n FROM bg
         |GROUP BY bigram ORDER BY n DESC, bigram LIMIT 20""".stripMargin,

    "text_topk_quality" ->
      s"""WITH t AS (SELECT doc_id, lang, text, $toksSql AS toks FROM documents),
         |sig AS (
         |  SELECT doc_id, lang,
         |    least(len(toks)::DOUBLE / 100.0, 1.0) AS len_score,
         |    CASE WHEN len(toks) = 0 THEN 0.0
         |         ELSE len(list_distinct(toks))::DOUBLE / len(toks)::DOUBLE END AS diversity,
         |    CASE WHEN len(toks) = 0 THEN 0.0
         |         ELSE len(list_filter(toks, x -> list_contains(
         |              ['the','a','an','of','to','in','and','is','it','that','for','on','with','as'], x)))::DOUBLE
         |              / len(toks)::DOUBLE END AS stopword_ratio,
         |    CASE WHEN len(text) = 0 THEN 0.0
         |         ELSE len(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))::DOUBLE
         |              / len(text)::DOUBLE END AS punct_ratio
         |  FROM t),
         |q AS (
         |  SELECT doc_id, lang,
         |    (len_score + diversity + least(stopword_ratio * 5.0, 1.0)
         |     + (1.0 - least(punct_ratio * 4.0, 1.0))) / 4.0 AS quality
         |  FROM sig),
         |r AS (
         |  SELECT lang, doc_id, quality,
         |         row_number() OVER (PARTITION BY lang ORDER BY quality DESC, doc_id) AS rn
         |  FROM q)
         |SELECT lang, doc_id, quality, rn FROM r WHERE rn <= 5""".stripMargin,

    "text_quality_floor" ->
      s"""WITH t AS (SELECT doc_id, source, text, $toksSql AS toks FROM documents),
         |sig AS (
         |  SELECT doc_id, source,
         |    least(len(toks)::DOUBLE / 100.0, 1.0) AS len_score,
         |    CASE WHEN len(toks) = 0 THEN 0.0
         |         ELSE len(list_distinct(toks))::DOUBLE / len(toks)::DOUBLE END AS diversity,
         |    CASE WHEN len(toks) = 0 THEN 0.0
         |         ELSE len(list_filter(toks, x -> list_contains(
         |              ['the','a','an','of','to','in','and','is','it','that','for','on','with','as'], x)))::DOUBLE
         |              / len(toks)::DOUBLE END AS stopword_ratio,
         |    CASE WHEN len(text) = 0 THEN 0.0
         |         ELSE len(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))::DOUBLE
         |              / len(text)::DOUBLE END AS punct_ratio
         |  FROM t),
         |q AS (
         |  SELECT doc_id, source,
         |    (len_score + diversity + least(stopword_ratio * 5.0, 1.0)
         |     + (1.0 - least(punct_ratio * 4.0, 1.0))) / 4.0 AS quality
         |  FROM sig),
         |r AS (
         |  SELECT source, doc_id, quality,
         |         percent_rank() OVER (PARTITION BY source ORDER BY quality, doc_id) AS q_rank
         |  FROM q)
         |SELECT source, doc_id, quality, q_rank FROM r WHERE q_rank >= 0.2""".stripMargin,

    // quantile_disc mirrors percentile_approx's exact regime bit-for-bit:
    // both return the smallest element whose cumulative frequency reaches
    // the fraction (no interpolation — the cutoff is a data value).
    "text_quality_cutoff" ->
      s"""WITH t AS (SELECT doc_id, source, text, $toksSql AS toks FROM documents),
         |sig AS (
         |  SELECT doc_id, source,
         |    least(len(toks)::DOUBLE / 100.0, 1.0) AS len_score,
         |    CASE WHEN len(toks) = 0 THEN 0.0
         |         ELSE len(list_distinct(toks))::DOUBLE / len(toks)::DOUBLE END AS diversity,
         |    CASE WHEN len(toks) = 0 THEN 0.0
         |         ELSE len(list_filter(toks, x -> list_contains(
         |              ['the','a','an','of','to','in','and','is','it','that','for','on','with','as'], x)))::DOUBLE
         |              / len(toks)::DOUBLE END AS stopword_ratio,
         |    CASE WHEN len(text) = 0 THEN 0.0
         |         ELSE len(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))::DOUBLE
         |              / len(text)::DOUBLE END AS punct_ratio
         |  FROM t),
         |q AS (
         |  SELECT doc_id, source,
         |    (len_score + diversity + least(stopword_ratio * 5.0, 1.0)
         |     + (1.0 - least(punct_ratio * 4.0, 1.0))) / 4.0 AS quality
         |  FROM sig),
         |cut AS (
         |  SELECT source, quantile_disc(quality, 0.2) AS q_cutoff FROM q GROUP BY 1)
         |SELECT q.source, q.doc_id, q.quality, cut.q_cutoff
         |FROM q JOIN cut USING (source) WHERE q.quality >= cut.q_cutoff""".stripMargin,

    "text_bpe_tokens" ->
      s"""WITH w AS (
         |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+|[0-9]+', 0) AS words
         |  FROM documents)
         |SELECT doc_id, len(words)::BIGINT AS n_words,
         |  CAST(list_sum(list_transform(words, x -> (len(x)+3)//4)) AS BIGINT) AS n_subword_tokens
         |FROM w""".stripMargin,

    "text_bpe_encode" ->
      s"""WITH ${bpeCtes(BpeMerges, withFinal = true)},
         |vocabp AS (
         |  SELECT w, list_filter(string_split(s, '  '), x -> x <> '') AS pieces
         |  FROM w$BpeMerges),
         |dtk AS (SELECT doc_id, $toksSql AS t FROM documents WHERE text IS NOT NULL),
         |dw AS (
         |  SELECT doc_id, i AS widx, t[i] AS w
         |  FROM dtk, unnest(range(1, len(t)+1)) AS u(i)
         |  WHERE t[i] <> ''),
         |dp AS (
         |  SELECT doc_id, widx, j AS sidx, pieces[j] AS piece
         |  FROM dw JOIN vocabp USING (w), unnest(range(1, len(pieces)+1)) AS v(j)),
         |enc AS (
         |  SELECT doc_id, piece,
         |         row_number() OVER (PARTITION BY doc_id ORDER BY widx, sidx) AS pos
         |  FROM dp)
         |SELECT doc_id, CAST(pos AS BIGINT) AS pos, piece
         |FROM enc WHERE pos <= 32""".stripMargin,

    // Round-trip mirror: same no-cap encode CTEs, ordered string_agg
    // reconstruction vs the token-character concat, same fertility
    // division.
    "text_bpe_roundtrip" ->
      s"""WITH ${bpeCtes(BpeMerges, withFinal = true)},
         |vocabp AS (
         |  SELECT w, list_filter(string_split(s, '  '), x -> x <> '') AS pieces
         |  FROM w$BpeMerges),
         |dtk AS (SELECT doc_id, $toksSql AS t FROM documents WHERE text IS NOT NULL),
         |dw AS (
         |  SELECT doc_id, i AS widx, t[i] AS w
         |  FROM dtk, unnest(range(1, len(t)+1)) AS u(i)
         |  WHERE t[i] <> ''),
         |dp AS (
         |  SELECT doc_id, widx, j AS sidx, pieces[j] AS piece
         |  FROM dw JOIN vocabp USING (w), unnest(range(1, len(pieces)+1)) AS v(j)),
         |enc AS (
         |  SELECT doc_id, piece,
         |         row_number() OVER (PARTITION BY doc_id ORDER BY widx, sidx) AS pos
         |  FROM dp),
         |rec AS (
         |  SELECT doc_id, count(*)::BIGINT AS n_pieces,
         |         string_agg(piece, '' ORDER BY pos) AS r
         |  FROM enc GROUP BY 1),
         |orig AS (
         |  SELECT doc_id,
         |         len(list_filter(t, x -> x <> ''))::BIGINT AS n_words,
         |         array_to_string(list_filter(t, x -> x <> ''), '') AS o
         |  FROM dtk)
         |SELECT orig.doc_id, orig.n_words, rec.n_pieces,
         |       CAST(rec.n_pieces AS DOUBLE) / CAST(orig.n_words AS DOUBLE) AS fertility,
         |       (rec.r = orig.o) AS roundtrip_ok
         |FROM orig JOIN rec USING (doc_id)
         |WHERE orig.n_words > 0""".stripMargin,

    "text_curriculum" ->
      s"""WITH t AS (SELECT doc_id, text, $toksSql AS toks FROM documents),
         |sig AS (
         |  SELECT doc_id,
         |    least(len(toks)::DOUBLE / 100.0, 1.0) AS len_score,
         |    CASE WHEN len(toks) = 0 THEN 0.0
         |         ELSE len(list_distinct(toks))::DOUBLE / len(toks)::DOUBLE END AS diversity,
         |    CASE WHEN len(toks) = 0 THEN 0.0
         |         ELSE len(list_filter(toks, x -> list_contains(
         |              ['the','a','an','of','to','in','and','is','it','that','for','on','with','as'], x)))::DOUBLE
         |              / len(toks)::DOUBLE END AS stopword_ratio,
         |    CASE WHEN len(text) = 0 THEN 0.0
         |         ELSE len(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))::DOUBLE
         |              / len(text)::DOUBLE END AS punct_ratio
         |  FROM t),
         |q AS (
         |  SELECT doc_id,
         |    (len_score + diversity + least(stopword_ratio * 5.0, 1.0)
         |     + (1.0 - least(punct_ratio * 4.0, 1.0))) / 4.0 AS quality
         |  FROM sig),
         |cuts AS (SELECT quantile_disc(quality, [0.25, 0.5, 0.75]) AS cs FROM q)
         |SELECT doc_id, quality,
         |  (1 + len(list_filter(cs, c -> quality < c)))::BIGINT AS phase,
         |  ${h60("'curriculum:' || doc_id::VARCHAR")} AS pos_key
         |FROM q, cuts""".stripMargin,

    "text_epoch_plan" ->
      s"""WITH b(source, budget) AS (VALUES $epochBudgetsSql),
         |t AS (
         |  SELECT source, CAST(sum(len($toksSql)) AS BIGINT) AS n_tokens
         |  FROM documents GROUP BY 1)
         |SELECT t.source, n_tokens, budget,
         |  (budget // n_tokens)::BIGINT AS full_epochs,
         |  (budget % n_tokens)::BIGINT AS remainder_tokens
         |FROM t JOIN b USING (source) WHERE n_tokens > 0""".stripMargin,

    "text_pps_sample" ->
      s"""WITH k AS (
         |  SELECT doc_id, n_chars AS w, ${h60("'pps:' || doc_id::VARCHAR")} AS key
         |  FROM documents WHERE n_chars > 0),
         |c AS (
         |  SELECT doc_id, w,
         |    sum(w) OVER (ORDER BY key, doc_id ROWS UNBOUNDED PRECEDING) AS cum
         |  FROM k),
         |p AS (
         |  SELECT sum(w)::BIGINT AS tot,
         |    (${h60("'start:pps'")})::DOUBLE / 1152921504606846976.0 AS f
         |  FROM k)
         |SELECT * FROM (
         |  SELECT doc_id, w AS weight,
         |    (ceil((cum::DOUBLE - f * (tot::DOUBLE / CAST(500 AS DOUBLE)))
         |          / (tot::DOUBLE / CAST(500 AS DOUBLE)))
         |     - ceil(((cum - w)::DOUBLE - f * (tot::DOUBLE / CAST(500 AS DOUBLE)))
         |          / (tot::DOUBLE / CAST(500 AS DOUBLE))))::BIGINT AS n_copies
         |  FROM c, p) t
         |WHERE n_copies >= 1""".stripMargin,

    "text_bpe_train" ->
      s"""WITH ${bpeCtes(BpeMerges, withFinal = false)}
         |${(1 to BpeMerges).map(i =>
             s"SELECT CAST($i AS BIGINT) AS rank, l AS lhs, r AS rhs, n::BIGINT AS n FROM b$i")
             .mkString("\nUNION ALL\n")}""".stripMargin,

    "text_bpe_segment" ->
      s"""WITH ${bpeCtes(BpeMerges, withFinal = true)},
         |vocab AS (
         |  SELECT w, len(list_filter(string_split(s, '  '), x -> x <> ''))::BIGINT AS n_bpe
         |  FROM w$BpeMerges),
         |sw AS (
         |  SELECT source, w, count(*) AS f
         |  FROM (SELECT source, unnest($toksSql) AS w FROM documents WHERE text IS NOT NULL) t
         |  WHERE w <> '' GROUP BY 1, 2)
         |SELECT source, count(*) AS n_words, sum(f)::BIGINT AS n_tokens,
         |  sum(f * n_bpe)::BIGINT AS n_bpe_tokens,
         |  (sum(f * n_bpe)::DOUBLE / sum(f)::DOUBLE) AS avg_bpe_per_token
         |FROM sw JOIN vocab USING (w) GROUP BY 1""".stripMargin,

    "text_token_stats" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents)
         |SELECT doc_id,
         |  len(toks)::BIGINT AS n_tokens,
         |  len(list_distinct(toks))::BIGINT AS n_distinct,
         |  CASE WHEN len(toks) = 0 THEN 0.0
         |       ELSE CAST(list_sum(list_transform(toks, x -> len(x))) AS DOUBLE)
         |            / len(toks)::DOUBLE END AS mean_token_len,
         |  CASE WHEN len(toks) = 0 THEN 0.0
         |       ELSE len(list_distinct(toks))::DOUBLE / len(toks)::DOUBLE END AS type_token_ratio
         |FROM t""".stripMargin,

    // Simpson mirror: same explode → (doc, token) counts → per-doc fold,
    // exact integers to the one final division.
    "text_simpson_diversity" ->
      s"""WITH t AS (SELECT doc_id, unnest($toksSql) AS tok FROM documents),
         |c AS (SELECT doc_id, tok, count(*) AS c FROM t GROUP BY 1, 2),
         |a AS (
         |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
         |         count(*) AS n_distinct,
         |         CAST(sum(c * (c - 1)) AS BIGINT) AS collisions
         |  FROM c GROUP BY 1)
         |SELECT doc_id, n_tokens, n_distinct, collisions,
         |       CASE WHEN n_tokens > 1 THEN
         |         collisions::DOUBLE / (n_tokens * (n_tokens - 1))::DOUBLE
         |       END AS simpson
         |FROM a""".stripMargin,

    "text_quality" ->
      s"""WITH t AS (SELECT doc_id, text, $toksSql AS toks FROM documents),
         |sig AS (
         |  SELECT doc_id,
         |    len(text)::BIGINT AS n_chars,
         |    len(toks)::BIGINT AS n_tokens,
         |    CASE WHEN len(toks) = 0 THEN 0.0
         |         ELSE len(list_filter(toks, x -> list_contains(
         |              ['the','a','an','of','to','in','and','is','it','that','for','on','with','as'], x)))::DOUBLE
         |              / len(toks)::DOUBLE END AS stopword_ratio,
         |    CASE WHEN len(text) = 0 THEN 0.0
         |         ELSE len(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))::DOUBLE
         |              / len(text)::DOUBLE END AS punct_ratio,
         |    least(len(toks)::DOUBLE / 100.0, 1.0) AS len_score,
         |    CASE WHEN len(toks) = 0 THEN 0.0
         |         ELSE len(list_distinct(toks))::DOUBLE / len(toks)::DOUBLE END AS diversity
         |  FROM t)
         |SELECT doc_id, n_chars, n_tokens, stopword_ratio, punct_ratio,
         |  (len_score + diversity + least(stopword_ratio * 5.0, 1.0)
         |   + (1.0 - least(punct_ratio * 4.0, 1.0))) / 4.0 AS quality
         |FROM sig""".stripMargin,

    // Token-runs mirror: same lag → run-id → per-run counts, one share
    // division.
    "text_token_runs" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS tk FROM documents),
         |p AS (SELECT doc_id, unnest(tk) AS tok,
         |             generate_subscripts(tk, 1) AS pos FROM t),
         |l AS (SELECT doc_id, pos, tok,
         |        CASE WHEN lag(tok) OVER (PARTITION BY doc_id ORDER BY pos)
         |                  IS NOT DISTINCT FROM tok THEN 0 ELSE 1 END AS nw
         |      FROM p),
         |r AS (SELECT doc_id,
         |        sum(nw) OVER (PARTITION BY doc_id ORDER BY pos) AS rid
         |      FROM l),
         |runs AS (SELECT doc_id, rid, count(*) AS len FROM r GROUP BY 1, 2),
         |g AS (
         |  SELECT doc_id, CAST(sum(len) AS BIGINT) AS n_tokens,
         |         CAST(max(len) AS BIGINT) AS max_run,
         |         CAST(sum(CASE WHEN len >= 3 THEN len ELSE 0 END) AS BIGINT) AS run3_tokens
         |  FROM runs GROUP BY 1)
         |SELECT doc_id, n_tokens, max_run, run3_tokens,
         |       run3_tokens::DOUBLE / n_tokens::DOUBLE AS run3_share
         |FROM g""".stripMargin,

    "text_langid" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |hits AS (
         |  SELECT doc_id, l.lang,
         |         len(list_filter(toks, x -> list_contains(l.words, x)))::BIGINT AS hits
         |  FROM t, (VALUES $langValues) l(lang, words)),
         |best AS (
         |  SELECT doc_id, lang, hits,
         |         row_number() OVER (PARTITION BY doc_id ORDER BY hits DESC, lang) AS rn
         |  FROM hits)
         |SELECT doc_id,
         |       CASE WHEN hits = 0 THEN 'und' ELSE lang END AS predicted_lang,
         |       hits AS stopword_hits
         |FROM best WHERE rn = 1""".stripMargin,

    // Proximity mirror: same capped position lists, same top-2 pick,
    // same min-distance / close-pair aggregation.
    "text_proximity" ->
      s"""WITH tk AS (SELECT doc_id, $toksSql AS t FROM documents),
         |pos0 AS (
         |  SELECT doc_id, t[i] AS term, i - 1 AS pos
         |  FROM tk, unnest(range(1, len(t)+1)) AS u(i)
         |  WHERE t[i] <> ''),
         |pos AS (
         |  SELECT doc_id, term, pos FROM (
         |    SELECT *, row_number() OVER (PARTITION BY doc_id, term ORDER BY pos) AS rn
         |    FROM pos0) WHERE rn <= 100),
         |top AS (
         |  SELECT term, rk FROM (
         |    SELECT term,
         |           row_number() OVER (ORDER BY count(*) DESC, term) AS rk
         |    FROM pos GROUP BY term) WHERE rk <= 2),
         |p1 AS (SELECT doc_id, pos AS a FROM pos JOIN top ON pos.term = top.term AND top.rk = 1),
         |p2 AS (SELECT doc_id, pos AS b FROM pos JOIN top ON pos.term = top.term AND top.rk = 2)
         |SELECT p1.doc_id, min(abs(a - b))::BIGINT AS min_dist,
         |       sum(CASE WHEN abs(a - b) <= 3 THEN 1 ELSE 0 END)::BIGINT AS n_close_pairs
         |FROM p1 JOIN p2 ON p1.doc_id = p2.doc_id
         |GROUP BY p1.doc_id
         |HAVING sum(CASE WHEN abs(a - b) <= 3 THEN 1 ELSE 0 END) >= 1""".stripMargin,

    // Burstiness mirror: same (doc, term) counts, same ratio, same
    // (cf DESC, term) top-20.
    "text_burstiness" ->
      s"""WITH dt AS (
         |  SELECT doc_id, w AS term, count(*)::BIGINT AS c
         |  FROM (SELECT doc_id, unnest($toksSql) AS w FROM documents)
         |  WHERE w <> '' GROUP BY 1, 2),
         |t AS (
         |  SELECT term, count(*)::BIGINT AS df,
         |         sum(CASE WHEN c >= 2 THEN 1 ELSE 0 END)::BIGINT AS df2,
         |         sum(c)::BIGINT AS cf
         |  FROM dt GROUP BY 1)
         |SELECT term, df, df2, cf,
         |       CAST(df2 AS DOUBLE) / CAST(df AS DOUBLE) AS burstiness
         |FROM t ORDER BY cf DESC, term LIMIT 20""".stripMargin,

    // Gini mirror: same frequency-ranked integer moments, one division.
    "text_vocab_gini" ->
      s"""WITH tf AS (
         |  SELECT source, w AS term, count(*)::BIGINT AS f
         |  FROM (SELECT source, unnest($toksSql) AS w FROM documents)
         |  WHERE w <> '' GROUP BY 1, 2),
         |r AS (
         |  SELECT source, f,
         |         row_number() OVER (PARTITION BY source ORDER BY f, term) AS i
         |  FROM tf),
         |g AS (
         |  SELECT source, count(*)::BIGINT AS n_terms,
         |         sum(f)::BIGINT AS total_tokens,
         |         sum(i * f)::BIGINT AS s
         |  FROM r GROUP BY 1)
         |SELECT source, n_terms, total_tokens,
         |       CAST(2 * s - (n_terms + 1) * total_tokens AS DOUBLE)
         |         / CAST(n_terms * total_tokens AS DOUBLE) AS gini
         |FROM g""".stripMargin,

    // Confusion mirror: the langid CTEs + declared-label join, counts,
    // per-label share window.
    "text_langid_confusion" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |hits AS (
         |  SELECT doc_id, l.lang,
         |         len(list_filter(toks, x -> list_contains(l.words, x)))::BIGINT AS hits
         |  FROM t, (VALUES $langValues) l(lang, words)),
         |best AS (
         |  SELECT doc_id, lang, hits,
         |         row_number() OVER (PARTITION BY doc_id ORDER BY hits DESC, lang) AS rn
         |  FROM hits),
         |pred AS (
         |  SELECT doc_id,
         |         CASE WHEN hits = 0 THEN 'und' ELSE lang END AS predicted_lang
         |  FROM best WHERE rn = 1),
         |m AS (
         |  SELECT d.lang, p.predicted_lang, count(*)::BIGINT AS n_docs
         |  FROM documents d JOIN pred p USING (doc_id)
         |  GROUP BY 1, 2)
         |SELECT lang, predicted_lang, n_docs,
         |       CAST(n_docs AS DOUBLE) /
         |         CAST(sum(n_docs) OVER (PARTITION BY lang) AS DOUBLE) AS share
         |FROM m""".stripMargin,

    "text_unigram_segment" ->
      s"""WITH ${viterbiCtes(12)}
         |SELECT t.word, t.cnt, f.n_pieces, f.sum_freq, f.seq
         |FROM (${(1 to 12).map(i => s"SELECT * FROM dp$i WHERE len = $i")
            .mkString(" UNION ALL ")}) f
         |JOIN toks t USING (word)""".stripMargin,

    // EM-round mirror: the shared Viterbi CTEs, segmentations exploded
    // with corpus-count weights, exact LONG piece sums, one division
    // against the scalar total.
    "text_unigram_em" ->
      s"""WITH ${viterbiCtes(12)},
         |seg AS (
         |  SELECT t.cnt, f.seq
         |  FROM (${(1 to 12).map(i => s"SELECT * FROM dp$i WHERE len = $i")
            .mkString(" UNION ALL ")}) f
         |  JOIN toks t USING (word)),
         |pieces AS (
         |  SELECT cnt, unnest(string_split(seq, ' ')) AS piece FROM seg),
         |pc AS (SELECT piece, sum(cnt)::BIGINT AS n_uses FROM pieces GROUP BY 1),
         |tot AS (SELECT sum(n_uses)::BIGINT AS total FROM pc)
         |SELECT piece, n_uses,
         |       CAST(n_uses AS DOUBLE) / CAST(total AS DOUBLE) AS prob
         |FROM pc CROSS JOIN tot""".stripMargin,

    "text_heaps_curve" ->
      s"""WITH d AS (
         |  SELECT doc_id, ${h60("'heaps:'||doc_id::VARCHAR")} AS h,
         |         $toksSql AS toks
         |  FROM documents),
         |r AS (
         |  SELECT doc_id, toks,
         |         row_number() OVER (ORDER BY h, doc_id) AS rank,
         |         sum(len(toks)::BIGINT) OVER (ORDER BY h, doc_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |           AS cum_tokens
         |  FROM d),
         |fr AS (
         |  SELECT term, min(rank) AS first_rank FROM (
         |    SELECT rank, unnest(list_distinct(toks)) AS term FROM r)
         |  GROUP BY 1),
         |cka AS (
         |  SELECT k FROM (SELECT unnest([16, 64, 256, 1024, 4096]) AS k)
         |  WHERE k <= (SELECT max(rank) FROM r)),
         |v AS (SELECT k, count(*) AS vocab_size
         |      FROM cka JOIN fr ON fr.first_rank <= cka.k GROUP BY 1),
         |t AS (SELECT k, cum_tokens FROM cka JOIN r ON r.rank = cka.k)
         |SELECT v.k::BIGINT AS n_docs, t.cum_tokens::BIGINT AS cum_tokens,
         |       v.vocab_size
         |FROM v JOIN t USING (k)""".stripMargin,

    "text_grep_pruned" ->
      s"""SELECT doc_id, lang, source FROM documents
         |WHERE list_contains($toksSql, 'dup')""".stripMargin,

    "text_corpus_report" ->
      s"""WITH t AS (
         |  SELECT lang, len($toksSql)::BIGINT AS n_tokens,
         |         md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS f
         |  FROM documents)
         |SELECT count(*) AS n_docs, sum(n_tokens)::BIGINT AS total_tokens,
         |       count(DISTINCT f) AS n_unique,
         |       count(DISTINCT lang) AS n_langs,
         |       count(*) FILTER (lang = 'en') AS n_en,
         |       sum(n_tokens)::DOUBLE / count(*)::DOUBLE AS mean_tokens,
         |       (count(*) - count(DISTINCT f))::DOUBLE / count(*)::DOUBLE
         |         AS dup_rate
         |FROM t""".stripMargin,

    "text_fingerprint" ->
      s"""WITH t AS (SELECT doc_id, text, $toksSql AS toks FROM documents),
         |sh AS (
         |  SELECT doc_id, text,
         |    CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
         |         ELSE list_transform(range(1, len(toks)-1),
         |                i -> array_to_string(list_slice(toks, i::INT, i::INT+2), ' ')) END AS shingles
         |  FROM t)
         |SELECT doc_id,
         |  md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint,
         |  list_min(list_transform(shingles, s -> ${h60("s")})) AS content_hash
         |FROM sh""".stripMargin,

    "text_pii_scan" ->
      s"""WITH c AS (
         |  SELECT doc_id,
         |    len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))::BIGINT AS n_emails,
         |    len(regexp_extract_all(text, 'https?://[^\\s]+'))::BIGINT AS n_urls,
         |    len(regexp_extract_all(text, '\\+?[0-9][0-9()\\- ]{7,}[0-9]'))::BIGINT AS n_phones
         |  FROM documents)
         |SELECT doc_id, n_emails, n_urls, n_phones,
         |       (n_emails + n_urls + n_phones) > 0 AS has_pii
         |FROM c""".stripMargin,

    // Same patterns + order as the Spark side: emails, then URLs, then
    // phones; 'g' = global (Spark regexp_replace is global by default).
    "text_pii_redact" ->
      s"""WITH r AS (
         |  SELECT doc_id, text,
         |    ${piiRedactSql("text")} AS redacted
         |  FROM documents)
         |SELECT doc_id, redacted, redacted <> text AS was_redacted FROM r""".stripMargin,

    "text_chunk" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |${chunkCtes(chunkSize = 128, stride = 64)}
         |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
         |       len(chunk)::BIGINT AS n_chunk_tokens,
         |       array_to_string(chunk, ' ') AS chunk_text
         |FROM ch""".stripMargin,

    // Chunk→pack mirror: the text_chunk CTEs at 128/128 (disjoint), then
    // the same exclusive running sum // 512 as text_pack_sequences.
    "text_chunk_pack" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |${chunkCtes(chunkSize = 128, stride = 128)},
         |${packTailSql(budget = 512)}""".stripMargin,

    // HTML-strip mirror: rebuild the SAME fixture page, then re-derive
    // the strip verbatim — anchor-sentinel marking (chr(1)/chr(2)),
    // script/style/comment drop, block tags → chr(10), tag strip,
    // entity decode (&amp; last), per-line integer metrics, the
    // long/short-run keep rule, and the newline re-join.
    "text_html_strip" ->
      s"""WITH raw AS (
         |  SELECT doc_id,
         |    '<html><head><title>Doc ' || doc_id::VARCHAR
         |    || '</title><style>body { color: #fff; }</style></head><body>'
         |    || '<div class="nav"><a href="/">Home</a> | <a href="/a">About</a> | <a href="/c">Contact us</a></div>'
         |    || '<h1>Doc ' || doc_id::VARCHAR || '</h1>'
         |    || '<!-- rendered by engine v2 -->'
         |    || '<p>' || text || '</p>'
         |    || '<p>Fish &amp; chips &lt;tasty&gt; &quot;double&quot; &#39;single&#39;&nbsp;done for doc ' || doc_id::VARCHAR || '</p>'
         |    || '<ul><li><a href="/x">first link</a></li><li><a href="/y">second link</a></li></ul>'
         |    || '<div class="footer"><a href="/tos">Terms of Service</a> | <a href="/privacy">Privacy Policy</a> &copy; 2024</div>'
         |    || '<script>if (1 < 2) { alert("x"); }</script></body></html>' AS html
         |  FROM documents),
         |marked AS (SELECT doc_id, regexp_replace(html,
         |    '(?is)<a\\b[^>]*>(.*?)</a>', chr(1)||'\\1'||chr(2), 'g') AS s FROM raw),
         |nos AS (SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(s,
         |    '(?is)<script\\b[^>]*>.*?</script>', ' ', 'g'),
         |    '(?is)<style\\b[^>]*>.*?</style>', ' ', 'g'),
         |    '(?s)<!--.*?-->', ' ', 'g') AS s FROM marked),
         |txt AS (SELECT doc_id, regexp_replace(regexp_replace(s,
         |    '(?i)</?(p|div|br|li|ul|ol|h[1-6]|tr|table|section|article|header|footer|nav|blockquote|title)\\b[^>]*>', chr(10), 'g'),
         |    '<[^>]*>', '', 'g') AS s FROM nos),
         |ent AS (SELECT doc_id,
         |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(s,
         |    '&nbsp;', ' ', 'g'), '&lt;', '<', 'g'), '&gt;', '>', 'g'),
         |    '&quot;', '"', 'g'), '&#39;', '''', 'g'), '&amp;', '&', 'g') AS s FROM txt),
         |lin AS (SELECT doc_id, list_filter(string_split(s, chr(10)),
         |    l -> trim(regexp_replace(l, '[\\x01\\x02]', '', 'g')) <> '') AS ls FROM ent),
         |met AS (SELECT doc_id, list_transform(ls, l -> struct_pack(
         |    t := trim(regexp_replace(l, '[\\x01\\x02]', '', 'g')),
         |    n := length(regexp_replace(regexp_replace(l, '[\\x01\\x02]', '', 'g'), '[^A-Za-z0-9]', '', 'g')),
         |    a := length(regexp_replace(regexp_replace(l, '[\\x01\\x02]', '', 'g'), '[^A-Za-z0-9]', '', 'g'))
         |       - length(regexp_replace(regexp_replace(l, '\\x01[^\\x02]*\\x02', '', 'g'), '[^A-Za-z0-9]', '', 'g'))
         |  )) AS ms FROM lin),
         |lng AS (SELECT doc_id, ms,
         |    list_transform(ms, m -> m.n >= 25 AND m.a * 2 <= m.n) AS lg FROM met),
         |kp AS (SELECT doc_id, list_filter(list_transform(range(1, len(ms)+1), i ->
         |    CASE WHEN lg[i::INT] OR (ms[i::INT].n >= 10 AND ms[i::INT].a * 2 <= ms[i::INT].n
         |          AND ((i > 1 AND lg[(i-1)::INT]) OR (i < len(ms) AND lg[(i+1)::INT])))
         |      THEN ms[i::INT].t ELSE NULL END), x -> x IS NOT NULL AND x <> '') AS ks
         |  FROM lng)
         |SELECT doc_id, array_to_string(ks, chr(10)) AS main_text FROM kp""".stripMargin,

    // Prep-pipeline mirror: MAD screen CTEs → regexp_replace chain on
    // survivors → chunk CTEs over the MASKED text → exclusive running
    // sum // 512 (same chain as the Spark side, stage for stage).
    // (Stage 0 on the Spark side — stripHtml of the tag-wrapped corpus
    // — is content-preserving and recovers the clean text EXACTLY on
    // this fixture, pinned by HtmlStripSpec, so the mirror keeps
    // reading the clean text.)
    "text_prep_pipeline" ->
      s"""WITH ${madCtes("documents")},
         |kept AS (
         |  SELECT d.doc_id FROM d JOIN mad ON d.source IS NOT DISTINCT FROM mad.source
         |  WHERE NOT (d.absdev > 4.0 * mad.mad)),
         |masked AS (
         |  SELECT doc_id,
         |    ${piiRedactSql("text")} AS text
         |  FROM documents WHERE doc_id IN (SELECT doc_id FROM kept)),
         |t AS (SELECT doc_id, $toksSql AS toks FROM masked),
         |${chunkCtes(chunkSize = 128, stride = 128)},
         |${packTailSql(budget = 512)}""".stripMargin,

    // Median/MAD mirror: quantile_cont at 0.5 over integer counts and
    // half-integer deviations — exact halving both times, so the compare
    // against k·MAD is on bit-identical values.
    "text_length_outliers" ->
      s"""WITH ${madCtes("documents")}
         |SELECT d.doc_id, d.source, d.n_tokens, d.med, mad.mad,
         |       d.absdev > 4.0 * mad.mad AS is_outlier
         |FROM d JOIN mad ON d.source IS NOT DISTINCT FROM mad.source""".stripMargin,

    "text_tfidf" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest($toksSql) AS term FROM documents),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
         |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         |n AS (SELECT count(*) AS n_docs FROM documents),
         |scored AS (
         |  SELECT doc_id, term, tf, df,
         |         tf::DOUBLE * (n_docs::DOUBLE / df::DOUBLE) AS score
         |  FROM tf JOIN dfq USING (term), n),
         |r AS (
         |  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rnk
         |  FROM scored)
         |SELECT doc_id, term, tf, df, score, CAST(rnk AS BIGINT) AS rnk
         |FROM r WHERE rnk <= 3""".stripMargin,

    // Mirrors Retrieval.bm25TopK exactly (see bm25Ctes) over the fixed
    // literal query set.
    "text_bm25" ->
      s"""WITH ${bm25Ctes(s"q(qid, qtext) AS (VALUES $bm25ValuesSql)")}
         |SELECT qid, doc_id, score, CAST(rank AS BIGINT) AS rank
         |FROM r WHERE rank <= 5""".stripMargin,

    // Conjunctive containment recomputed from the corpus: a doc matches
    // iff its distinct tokens cover every distinct query term.
    "text_boolean_and" ->
      s"""WITH q(qid, qtext) AS (VALUES $bm25ValuesSql),
         |qt AS (SELECT qid::BIGINT AS qid,
         |         unnest(list_distinct(regexp_split_to_array(trim(qtext), '\\s+'))) AS term
         |       FROM q),
         |need AS (SELECT qid, count(DISTINCT term) AS need FROM qt GROUP BY qid),
         |dt AS (SELECT doc_id, unnest(list_distinct($toksSql)) AS term FROM documents),
         |m AS (SELECT qt.qid, dt.doc_id, count(DISTINCT qt.term) AS n_terms
         |      FROM qt JOIN dt ON qt.term = dt.term GROUP BY 1, 2)
         |SELECT m.qid, m.doc_id, m.n_terms::BIGINT AS n_terms
         |FROM m JOIN need ON m.qid = need.qid AND m.n_terms = need.need""".stripMargin,

    // CDC-maintained index mirror: BM25 from scratch over the MERGED
    // corpus (updates applied, deletes removed) — what the tombstone-
    // maintained index must reproduce bit-for-bit.
    "text_bm25_after_update" ->
      s"""WITH corpus AS (
         |  SELECT doc_id,
         |         CASE WHEN doc_id % 7 = 1 THEN text || ' refreshed merge batch'
         |              ELSE text END AS text
         |  FROM documents WHERE doc_id % 7 <> 3),
         |${bm25Ctes(s"q(qid, qtext) AS (VALUES $bm25ValuesSql)", "corpus")}
         |SELECT qid, doc_id, score, CAST(rank AS BIGINT) AS rank
         |FROM r WHERE rank <= 5""".stripMargin,

    // Query-by-example hybrid retrieval mirror: the shared BM25 chain
    // (exemplar texts as queries, self excluded after ranking — matching
    // the Spark-side post-rank filter), brute-force cosine kNN over the
    // exemplar embeddings, reciprocal-rank fusion (same formula as the
    // sim_rrf mirror).
    "text_hybrid_retrieval" ->
      s"""WITH ${bm25Ctes(
        "q AS (SELECT doc_id AS qid, text AS qtext FROM documents WHERE doc_id IN (0, 100, 200, 300))")},
         |lex AS (SELECT qid, doc_id, rank FROM r WHERE rank <= 10 AND doc_id <> qid),
         |eq AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
         |       WHERE vec_id IN (0, 100, 200, 300)),
         |s_scored AS (
         |  SELECT eq.qid, e.vec_id AS doc_id,
         |         ${SimilarityQueries.cosSql("qv", "e.embedding")} AS cos
         |  FROM embeddings e CROSS JOIN eq WHERE e.vec_id <> eq.qid),
         |sem AS (
         |  SELECT qid, doc_id,
         |         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, doc_id) AS rank
         |  FROM s_scored QUALIFY rank <= 10),
         |fused AS (
         |  SELECT coalesce(lex.qid, sem.qid) AS qid,
         |         coalesce(lex.doc_id, sem.doc_id) AS doc_id,
         |         coalesce(1.0::DOUBLE / (60 + lex.rank), 0.0::DOUBLE)
         |           + coalesce(1.0::DOUBLE / (60 + sem.rank), 0.0::DOUBLE) AS rrf_score
         |  FROM lex FULL OUTER JOIN sem
         |    ON lex.qid = sem.qid AND lex.doc_id = sem.doc_id)
         |SELECT qid, doc_id, rrf_score,
         |       row_number() OVER (PARTITION BY qid ORDER BY rrf_score DESC, doc_id)::BIGINT AS rank
         |FROM fused QUALIFY rank <= 5""".stripMargin,

    // Phrase-retrieval mirror: the shared BM25 chain + distinct
    // adjacent-bigram hit counts, fused with the same RRF formula.
    "text_phrase_retrieval" -> phraseRetrievalOracle,

    // The maintained-frontend probe is spec- and design-identical to
    // recompute over the union, so it shares the recompute oracle.
    "text_retrieval_after_ingest" -> phraseRetrievalOracle,

    // Drift mirror: same hashed-bucket distributions, the per-group L1
    // folded in bucket order over the corpus' bucket grid (absent
    // buckets contribute the corpus mass).
    "text_source_drift" ->
      s"""WITH toks AS (SELECT source, unnest($toksSql) AS term FROM documents),
         |gb AS (
         |  SELECT source, ${h60("term")} % 256 AS bucket, count(*)::BIGINT AS c
         |  FROM toks GROUP BY 1, 2),
         |gt AS (SELECT source, sum(c)::BIGINT AS n_tokens FROM gb GROUP BY 1),
         |cb AS (SELECT bucket, sum(c)::BIGINT AS ct FROM gb GROUP BY 1),
         |tot AS (SELECT sum(ct)::BIGINT AS N FROM cb),
         |grid AS (
         |  SELECT gt.source, gt.n_tokens, cb.bucket,
         |    abs(coalesce(gb.c, 0)::DOUBLE / gt.n_tokens::DOUBLE
         |        - cb.ct::DOUBLE / tot.N::DOUBLE) AS d
         |  FROM gt CROSS JOIN cb
         |  LEFT JOIN gb ON gb.source = gt.source AND gb.bucket = cb.bucket
         |  CROSS JOIN tot)
         |SELECT source, any_value(n_tokens) AS n_tokens,
         |  list_reduce(list_prepend(0.0::DOUBLE, list(d ORDER BY bucket)),
         |    (a, x) -> a + x) AS l1_drift
         |FROM grid GROUP BY source""".stripMargin,

    // Maintained-phrase-index mirror: distinct-bigram hit ranking over
    // the MERGED corpus.
    "text_phrase_after_update" ->
      s"""WITH merged AS (
         |  SELECT doc_id,
         |         CASE WHEN doc_id % 7 = 1 THEN text || ' refreshed merge batch'
         |              ELSE text END AS text
         |  FROM documents WHERE doc_id % 7 <> 3),
         |q(qid, qtext) AS (VALUES $bm25ValuesSql),
         |dtk AS (SELECT doc_id, $toksSql AS t FROM merged),
         |dbi AS (
         |  SELECT DISTINCT doc_id,
         |    unnest(list_transform(range(1, len(t)),
         |      i -> t[i::INT] || ' ' || t[(i+1)::INT])) AS bigram
         |  FROM dtk),
         |qtk AS (SELECT qid::BIGINT AS qid,
         |          regexp_split_to_array(trim(qtext), '\\s+') AS t FROM q),
         |qbi AS (
         |  SELECT qid, unnest(list_distinct(list_transform(range(1, len(t)),
         |    i -> t[i::INT] || ' ' || t[(i+1)::INT]))) AS bigram
         |  FROM qtk),
         |ph AS (
         |  SELECT qid, doc_id, count(*)::BIGINT AS phrase_hits
         |  FROM dbi JOIN qbi USING (bigram) GROUP BY 1, 2)
         |SELECT qid, doc_id, phrase_hits,
         |       row_number() OVER (PARTITION BY qid ORDER BY phrase_hits DESC, doc_id)::BIGINT AS rank
         |FROM ph QUALIFY rank <= 5""".stripMargin,

    "text_token_quantiles" ->
      s"""WITH t AS (SELECT lang, len($toksSql)::BIGINT AS n_tokens FROM documents)
         |SELECT lang,
         |  quantile_cont(n_tokens, 0.25) AS p25,
         |  quantile_cont(n_tokens, 0.5) AS p50,
         |  quantile_cont(n_tokens, 0.75) AS p75,
         |  count(*) AS n
         |FROM t GROUP BY lang""".stripMargin,

    "text_length_hist" ->
      """SELECT CAST(n_chars // 100 AS BIGINT) AS bucket, count(*) AS n,
        |  CAST(min(n_chars) AS BIGINT) AS min_chars,
        |  CAST(max(n_chars) AS BIGINT) AS max_chars
        |FROM documents GROUP BY 1""".stripMargin,

    "text_repetition" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |bg AS (
         |  SELECT doc_id,
         |    CASE WHEN len(toks) < 2 THEN [array_to_string(toks, ' ')]
         |         ELSE list_transform(range(1, len(toks)),
         |                i -> toks[i::INT] || ' ' || toks[(i+1)::INT]) END AS bigrams
         |  FROM t)
         |SELECT doc_id,
         |  len(bigrams)::BIGINT AS n_bigrams,
         |  len(list_distinct(bigrams))::BIGINT AS n_distinct_bigrams,
         |  CASE WHEN len(bigrams) = 0 THEN 0.0
         |       ELSE 1.0 - len(list_distinct(bigrams))::DOUBLE / len(bigrams)::DOUBLE END
         |    AS repetition_ratio
         |FROM bg""".stripMargin,

    // budgets: 0.0625*8192 = 512 (src0-9), 0.03125*8192 = 256 (src10+);
    // unknown sources → 0 (dropped) — mirrors Curation.domainMix exactly.
    "text_domain_mix" ->
      s"""WITH t AS (
         |  SELECT source, doc_id, len($toksSql)::BIGINT AS n_tokens,
         |         ${h60("'mix:' || doc_id::VARCHAR")} AS key,
         |         CASE WHEN source IN (${(0 until 10).map(i => s"'src$i'").mkString(",")}) THEN 512
         |              WHEN source IN (${(10 until 20).map(i => s"'src$i'").mkString(",")}) THEN 256
         |              ELSE 0 END AS budget
         |  FROM documents),
         |c AS (
         |  SELECT *, sum(n_tokens) OVER (PARTITION BY source ORDER BY key, doc_id
         |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
         |  FROM t)
         |SELECT source, doc_id, n_tokens, cum_tokens::BIGINT AS cum_tokens
         |FROM c WHERE cum_tokens - n_tokens < budget""".stripMargin,

    "text_shuffle_shard" ->
      s"""WITH t AS (
         |  SELECT doc_id, ${h60("'shuffle:' || doc_id::VARCHAR")} AS key FROM documents)
         |SELECT doc_id, (key % 8)::BIGINT AS shard,
         |       row_number() OVER (PARTITION BY key % 8 ORDER BY key, doc_id)::BIGINT AS pos
         |FROM t""".stripMargin,

    "text_pipeline_e2e" ->
      s"""WITH keep AS (
         |  SELECT min(doc_id) AS doc_id FROM documents
         |  GROUP BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))),
         |qt AS (SELECT doc_id, text, $toksSql AS toks FROM documents),
         |qsig AS (
         |  SELECT doc_id,
         |    least(len(toks)::DOUBLE / 100.0, 1.0) AS len_score,
         |    CASE WHEN len(toks) = 0 THEN 0.0
         |         ELSE len(list_distinct(toks))::DOUBLE / len(toks)::DOUBLE END AS diversity,
         |    CASE WHEN len(toks) = 0 THEN 0.0
         |         ELSE len(list_filter(toks, x -> list_contains(
         |              ['the','a','an','of','to','in','and','is','it','that','for','on','with','as'], x)))::DOUBLE
         |              / len(toks)::DOUBLE END AS stopword_ratio,
         |    CASE WHEN len(text) = 0 THEN 0.0
         |         ELSE len(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))::DOUBLE
         |              / len(text)::DOUBLE END AS punct_ratio
         |  FROM qt),
         |qpass AS (
         |  SELECT doc_id FROM qsig
         |  WHERE (len_score + diversity + least(stopword_ratio * 5.0, 1.0)
         |         + (1.0 - least(punct_ratio * 4.0, 1.0))) / 4.0 >= 0.5),
         |surv AS (
         |  SELECT d.* FROM documents d
         |  JOIN keep USING (doc_id) JOIN qpass USING (doc_id)),
         |t AS (
         |  SELECT source, doc_id, len($toksSql)::BIGINT AS n_tokens,
         |         ${h60("'mix:' || doc_id::VARCHAR")} AS key,
         |         CASE WHEN source IN (${(0 until 10).map(i => s"'src$i'").mkString(",")}) THEN 512
         |              WHEN source IN (${(10 until 20).map(i => s"'src$i'").mkString(",")}) THEN 256
         |              ELSE 0 END AS budget
         |  FROM surv),
         |c AS (
         |  SELECT *, sum(n_tokens) OVER (PARTITION BY source ORDER BY key, doc_id
         |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM t)
         |SELECT source, doc_id, n_tokens,
         |  ((cum - n_tokens) // 2048)::BIGINT AS pack_id,
         |  ((cum - n_tokens) % 2048)::BIGINT AS pack_offset,
         |  (${h60("'shard:' || doc_id::VARCHAR")} % 8)::BIGINT AS shard
         |FROM c WHERE cum - n_tokens < budget""".stripMargin,

    // Cross-IMPLEMENTATION oracle (was the one ∅ row through r9: DuckDB
    // exposes no deflate): a committed fixture of Python-zlib raw-deflate
    // lengths keyed by md5(text) — content-addressed, so it verifies at
    // ANY scale factor whose texts it covers. Spark computes deflate_len
    // LIVE via the native thread-local-zlib DeflateSizeExpr (java.util
    // .zip.Deflater, level 6 nowrap); the oracle looks the same bytes up
    // from CPython's independently-driven zlib (same madler stream
    // format, level 6 raw) — an implementation-independent byte-length
    // cross-check, strictly stronger than the old rows-only record.
    // Fixture: tools/fixtures/deflate_oracle.parquet, generation script
    // in tools/gen_deflate_oracle.py (all three sf dirs, empty text → 0
    // matching the expression's convention).
    "text_compression_ratio" ->
      """SELECT d.doc_id, strlen(d.text)::INT AS raw_len, f.deflate_len,
        |  CASE WHEN strlen(d.text) = 0 THEN 0.0
        |       ELSE f.deflate_len::DOUBLE / strlen(d.text) END AS ratio
        |FROM documents d
        |JOIN read_parquet('/root/repo/tools/fixtures/deflate_oracle.parquet') f
        |  ON md5(d.text) = f.h""".stripMargin,

    "text_split_assign" -> {
      val max = 1L << 60
      val t1 = (0.875 * max).toLong
      val t2 = ((0.875 + 0.0625) * max).toLong
      s"""SELECT doc_id,
         |  CASE WHEN ${h60("'split:' || doc_id::VARCHAR")} < ${t1}
         |       THEN 'train'
         |       WHEN ${h60("'split:' || doc_id::VARCHAR")} < ${t2}
         |       THEN 'val' ELSE 'test' END AS split
         |FROM documents""".stripMargin
    },

    "text_dsir_scores" -> dsirSql,

    "text_dsir_select" ->
      s"""WITH scored AS ($dsirSql)
         |SELECT * FROM scored ORDER BY dsir_score DESC, doc_id LIMIT 100""".stripMargin,

    // Stupid-backoff mirror: counts from the even-id half, the backoff
    // CASE chain verbatim (0.4 factors multiply in the same order), the
    // mean folded in position order. Relative trigram-position order is
    // what matters for the fold — both sides enumerate left to right.
    "text_stupid_backoff" ->
      s"""WITH norm AS (
         |  SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS t
         |  FROM documents),
         |toks AS (SELECT doc_id, regexp_split_to_array(trim(t), '\\s+') AS tk FROM norm),
         |ttoks AS (SELECT tk FROM toks WHERE doc_id % 2 = 0),
         |uni AS (SELECT w, count(*) AS cu
         |        FROM (SELECT unnest(tk) AS w FROM ttoks) GROUP BY 1),
         |bi AS (SELECT bg, count(*) AS cb FROM (
         |        SELECT unnest(list_transform(range(1, len(tk)), i ->
         |          tk[i::INT] || ' ' || tk[(i+1)::INT])) AS bg
         |        FROM ttoks WHERE len(tk) >= 2) GROUP BY 1),
         |tri AS (SELECT tg, count(*) AS ct FROM (
         |        SELECT unnest(list_transform(range(1, len(tk)-1), i ->
         |          tk[i::INT] || ' ' || tk[(i+1)::INT] || ' ' || tk[(i+2)::INT])) AS tg
         |        FROM ttoks WHERE len(tk) >= 3) GROUP BY 1),
         |tot AS (SELECT count(*)::BIGINT AS n_total
         |        FROM (SELECT unnest(tk) FROM ttoks)),
         |p AS (SELECT doc_id, unnest(list_transform(range(1, len(tk)-1), i ->
         |        {'pos': i,
         |         'tg': tk[i::INT]||' '||tk[(i+1)::INT]||' '||tk[(i+2)::INT],
         |         'b12': tk[i::INT]||' '||tk[(i+1)::INT],
         |         'b23': tk[(i+1)::INT]||' '||tk[(i+2)::INT],
         |         'w2': tk[(i+1)::INT], 'w3': tk[(i+2)::INT]})) AS s
         |      FROM toks WHERE len(tk) >= 3),
         |q AS (SELECT doc_id, s.pos AS pos, s.tg AS tg, s.b12 AS b12,
         |             s.b23 AS b23, s.w2 AS w2, s.w3 AS w3 FROM p),
         |sc AS (SELECT doc_id, pos,
         |        CASE WHEN coalesce(ct, 0) > 0 THEN ct::DOUBLE / c12::DOUBLE
         |             WHEN coalesce(c23, 0) > 0 THEN 0.4 * (c23::DOUBLE / c2u::DOUBLE)
         |             ELSE 0.4 * 0.4 * (coalesce(c3u, 0)::DOUBLE / n_total::DOUBLE)
         |        END AS sp
         |       FROM q LEFT JOIN tri USING (tg)
         |            LEFT JOIN (SELECT bg AS b12, cb AS c12 FROM bi) USING (b12)
         |            LEFT JOIN (SELECT bg AS b23, cb AS c23 FROM bi) USING (b23)
         |            LEFT JOIN (SELECT w AS w2, cu AS c2u FROM uni) USING (w2)
         |            LEFT JOIN (SELECT w AS w3, cu AS c3u FROM uni) USING (w3)
         |            CROSS JOIN tot),
         |agg AS (SELECT doc_id,
         |         list_reduce(list_prepend(0.0, list(sp ORDER BY pos)), (a, x) -> a + x) AS psum,
         |         count(*)::BIGINT AS n_trigrams
         |        FROM sc GROUP BY doc_id)
         |SELECT doc_id, n_trigrams, psum / n_trigrams AS sbo_score FROM agg
         |UNION ALL
         |SELECT doc_id, 0::BIGINT, 0.0 FROM toks WHERE len(tk) < 3""".stripMargin,

    "text_bigram_lm" ->
      s"""WITH norm AS (
         |  SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS t
         |  FROM documents),
         |toks AS (SELECT doc_id, regexp_split_to_array(trim(t), '\\s+') AS tk FROM norm),
         |bg AS (
         |  SELECT doc_id, unnest(list_transform(range(1, len(tk)), i ->
         |    {'pos': i, 'bigram': tk[i::INT] || ' ' || tk[(i+1)::INT], 'ctx': tk[i::INT]})) AS s
         |  FROM toks WHERE len(tk) >= 2),
         |b AS (SELECT doc_id, s.pos AS pos, s.bigram AS bigram, s.ctx AS ctx FROM bg),
         |c2 AS (SELECT bigram, count(*) AS c2 FROM b GROUP BY 1),
         |c1 AS (SELECT ctx, count(*) AS c1 FROM b GROUP BY 1),
         |v AS (SELECT count(DISTINCT tok)::BIGINT AS v
         |      FROM (SELECT unnest(tk) AS tok FROM toks)),
         |sc AS (
         |  SELECT doc_id, pos, (c2 + 1)::DOUBLE / (c1 + v)::DOUBLE AS p
         |  FROM b JOIN c2 USING (bigram) JOIN c1 USING (ctx) CROSS JOIN v),
         |agg AS (
         |  SELECT doc_id,
         |         list_reduce(list_prepend(0.0, list(p ORDER BY pos)), (a, x) -> a + x) AS psum,
         |         count(*)::BIGINT AS n_bigrams
         |  FROM sc GROUP BY doc_id)
         |SELECT doc_id, n_bigrams, psum / n_bigrams AS lm_score FROM agg
         |UNION ALL
         |SELECT doc_id, 0::BIGINT, 0.0 FROM toks WHERE len(tk) < 2""".stripMargin
  )
}
