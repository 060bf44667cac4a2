package graft.ops

import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding merge training — the tokenizer-training
  * step of an LLM data pipeline (learn the merge table on the corpus the
  * model will train on), expressed in the shape that survives 100 TB:
  *
  *   - ONE corpus-sized pass builds the (word, freq) table (map-side
  *     combine collapses duplicate words per task, so the shuffle moves
  *     vocabulary-sized data — the classic BPE reduction: training
  *     operates on word STATISTICS, never the corpus);
  *   - each merge round is one vocabulary-sized aggregation (adjacent
  *     symbol pairs, frequency-weighted) whose single argmax row comes to
  *     the driver — bounded driver state, the [[Similarity.kMeans]]
  *     centroid-loop contract;
  *   - merge application is a per-row string rewrite on the vocabulary
  *     table (no shuffle), and the learned table is `numMerges` rows.
  *
  * Symbol sequences travel as DOUBLE-SPACE-joined strings
  * (`"  l  o  w  "`): tokens are whitespace-split so symbols can never
  * contain a space, and a literal replace of `" a  b "` with `" ab "` is
  * exactly the classic left-to-right non-overlapping pair merge (the
  * shared delimiter cannot be consumed twice — property-checked against
  * the list fold in BpeSpec). Counts are exact LONGs and the argmax
  * tie-break is (count desc, left asc, right asc), so training is
  * deterministic and engine-portable: the DuckDB oracle re-derives the
  * same merges from the same statistics (`text_bpe_train`).
  */
object Bpe {

  /** One learned merge: 1-based rank, the pair, its weighted count. */
  final case class Merge(rank: Long, lhs: String, rhs: String, n: Long)

  private val Sep = "  "

  /** `"  l  o  w  "` — every symbol wrapped by double-space delimiters. */
  private def srep(w: Column): Column =
    concat(lit(Sep), regexp_replace(w, "(.)", "$1" + Sep))

  /** Back from the string representation to the symbol array. */
  private def syms(s: Column): Column =
    filter(split(s, Sep), x => x =!= "")

  /** The merge-pair rewrite: `" a  b "` → `" ab "` over the shared
    * single-space borders — equivalent to the left-to-right list fold. */
  private def applyMerge(s: Column, lhs: String, rhs: String): Column =
    replace(s, lit(" " + lhs + Sep + rhs + " "), lit(" " + lhs + rhs + " "))

  /** The vocabulary-sized (w, freq, s) training table. */
  private def wordTable(docs: DataFrame, textCol: String): DataFrame =
    docs.where(col(textCol).isNotNull)
      .select(explode(tokens(col(textCol))).as("w"))
      .where(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .withColumn("s", srep(col("w")))

  /** Signed (l, r, freq) structs of a symbol array — empty when the
    * word is a single symbol. (`sequence(1, 0)` would DESCEND, so the
    * short-word case must guard, not filter, to stay composable in
    * array concat.) */
  private def pairStructs(t: Column, freq: Column): Column =
    when(size(t) < 2, array().cast("array<struct<l:string,r:string,freq:bigint>>"))
      .otherwise(transform(sequence(lit(1), size(t) - 1),
        i => struct(element_at(t, i).as("l"), element_at(t, i + 1).as("r"),
          freq.cast("long").as("freq"))))

  /** Train `numMerges` merges on the corpus. Returns fewer if the
    * vocabulary runs out of adjacent pairs first (every word fused to a
    * single symbol).
    *
    * Pair counts are maintained INCREMENTALLY across rounds (the
    * standard trick of in-memory BPE trainers, kept distributed): the
    * (l, r, n) pair table materializes once from the initial vocabulary,
    * and each round only the words CONTAINING the merged pair contribute
    * a delta — their pre-rewrite pairs subtract, their post-rewrite
    * pairs add, and the table folds `old + delta` (exact signed longs).
    * Per-round work is therefore (affected words + pair-table size),
    * not the full vocabulary re-derivation the previous version paid —
    * at a production 32k-merge run the late rounds touch a handful of
    * words each, instead of re-exploding millions. Equivalence to the
    * from-scratch derivation per round is exact (pair counts are
    * additive over words; untouched words contribute identical rows) —
    * property-checked against the reference list fold in BpeSpec. */
  def trainMerges(docs: DataFrame, textCol: String,
                  numMerges: Int): Seq[Merge] = {
    require(numMerges >= 1, s"numMerges must be >= 1: $numMerges")
    var words = wordTable(docs, textCol).localCheckpoint(true)
    var pairs = words
      .select(explode(pairStructs(syms(col("s")), col("freq"))).as("p"))
      .select(col("p.l").as("l"), col("p.r").as("r"), col("p.freq").as("freq"))
      .groupBy("l", "r").agg(sum("freq").as("n"))
      .localCheckpoint(true)
    val out = Seq.newBuilder[Merge]
    var rank = 1L
    var sinceCk = 0
    while (rank <= numMerges) {
      // Argmax over the materialized pair table: a TakeOrdered on
      // pair-table-sized in-memory blocks — no vocabulary re-derivation.
      val top = pairs.orderBy(col("n").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty) rank = numMerges + 1L
      else {
        val m = Merge(rank, top(0).getString(0), top(0).getString(1),
          top(0).getLong(2))
        out += m
        rank += 1
        if (rank <= numMerges) {
          // Delta in ONE pass over the affected words (those CONTAINING
          // the merged pair): pre-rewrite pairs subtract, post-rewrite
          // pairs add (exact signed longs), concatenated per row so the
          // words blocks scan once. The fold with the previous table is
          // a pair-table-sized aggregation.
          val pat = " " + m.lhs + Sep + m.rhs + " "
          val delta = words.where(col("s").contains(pat))
            .select(col("freq"), syms(col("s")).as("told"),
              syms(applyMerge(col("s"), m.lhs, m.rhs)).as("tnew"))
            .select(explode(concat(
              pairStructs(col("told"), -col("freq")),
              pairStructs(col("tnew"), col("freq")))).as("p"))
            .select(col("p.l").as("l"), col("p.r").as("r"), col("p.freq").as("freq"))
          pairs = pairs.select(col("l"), col("r"), col("n").as("freq"))
            .unionByName(delta)
            .groupBy("l", "r").agg(sum("freq").as("n"))
            .where(col("n") > 0)
            .localCheckpoint(true)
          // The vocabulary rewrite stays a LAZY narrow chain (string
          // replaces over the last checkpoint's blocks), re-materialized
          // every 8 rounds — per-round cost is the delta job + the tiny
          // argmax, not a full vocabulary rewrite-and-write.
          words = words.withColumn("s", applyMerge(col("s"), m.lhs, m.rhs))
          sinceCk += 1
          if (sinceCk == 8) { words = words.localCheckpoint(true); sinceCk = 0 }
        }
      }
    }
    out.result()
  }

  /** The learned merge table as a DataFrame (rank, lhs, rhs, n). */
  def mergeTable(spark: SparkSession, merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.toDF()
  }

  /** The vocabulary segmented by a learned merge list: (w, freq,
    * n_bpe) — merges applied in rank order as one chained per-row
    * rewrite (no iteration jobs, no shuffle beyond the word count). */
  def segmentVocab(docs: DataFrame, textCol: String,
                   merges: Seq[Merge]): DataFrame = {
    val sFinal = merges.sortBy(_.rank).foldLeft(col("s")) { (c, m) =>
      applyMerge(c, m.lhs, m.rhs)
    }
    wordTable(docs, textCol)
      .select(col("w"), col("freq"), size(syms(sFinal)).cast("long").as("n_bpe"))
  }

  /** ENCODE the corpus with a learned merge list: one ordered
    * (idCol, pos, piece) row per BPE token — the production tokenize
    * step. The segmentation runs ONCE on the vocabulary (pieces arrays,
    * same chained rewrite as [[segmentVocab]]); documents then join
    * their words to it (vocabulary-sized equi-join — broadcast when the
    * vocab fits, shuffle on the word key otherwise) and the (word
    * index, piece index) pair flattens to the global position. Piece
    * STRINGS are emitted rather than ids — an id table is one dense-rank
    * over the distinct pieces if needed, and strings keep the output
    * self-describing. */
  def encode(docs: DataFrame, idCol: String, textCol: String,
             merges: Seq[Merge]): DataFrame = {
    val sFinal = merges.sortBy(_.rank).foldLeft(col("s")) { (c, m) =>
      applyMerge(c, m.lhs, m.rhs)
    }
    val vocab = wordTable(docs, textCol)
      .select(col("w"), syms(sFinal).as("__pieces"))
    val words = docs.where(col(textCol).isNotNull)
      .select(col(idCol), posexplode(tokens(col(textCol))).as(Seq("__widx", "w")))
      .where(col("w") =!= "")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(idCol).orderBy("__widx", "__sidx")
    words.join(vocab, "w")
      .select(col(idCol), col("__widx"),
        posexplode(col("__pieces")).as(Seq("__sidx", "piece")))
      .withColumn("pos", row_number().over(w).cast("long"))
      .select(col(idCol), col("pos"), col("piece"))
  }

  /** Exact Viterbi word segmentation against a weighted piece
    * vocabulary — the WordPiece/unigram-LM-flavored tokenizer DP beside
    * [[trainMerges]]' BPE: each word of length ≤ `maxLen` splits into
    * vocabulary pieces (≤ `maxPiece` chars) minimizing the DETERMINISTIC
    * integer objective (fewest pieces, then greatest summed piece
    * frequency, then lexicographically smallest piece sequence) — no
    * log-probabilities anywhere, so the optimum is engine-exact and the
    * DuckDB oracle re-derives the SAME segmentation through a generated
    * chained-CTE DP (the BPE-oracle technique).
    *
    * `words` carries (word, len); `vocab` carries (piece, freq) and MUST
    * contain every single character of every word (coverage — the
    * caller's vocabulary construction guarantees it by unioning
    * single-char pieces in). Each DP stage i ≤ `maxLen` is a ≤
    * `maxPiece`-branch union over the accumulated prefix bests, one
    * vocabulary hash join + one word-partitioned argmax window — work is
    * (distinct words)·maxPiece per stage, never corpus-sized, and
    * `maxLen` bounds the rounds. Long words are the caller's filter. */
  def viterbiSegment(words: DataFrame, vocab: DataFrame,
                     maxLen: Int, maxPiece: Int = 4): DataFrame = {
    require(maxLen >= 1 && maxPiece >= 1, s"bad bounds: $maxLen/$maxPiece")
    val w = words.select(col("word"), col("len").cast("int").as("len"))
      .where(col("len").between(1, maxLen)).localCheckpoint(true)
    val v = vocab.select(col("piece"), col("freq").cast("long").as("freq"))
      .localCheckpoint(true)
    val wdw = org.apache.spark.sql.expressions.Window.partitionBy("word")
      .orderBy(col("n_pieces"), col("sum_freq").desc, col("seq"))
    var acc: Map[Int, DataFrame] = Map(0 -> w.select(col("word"), col("len"),
      lit(0L).as("n_pieces"), lit(0L).as("sum_freq"), lit("").as("seq")))
    for (i <- 1 to maxLen) {
      val cand = (math.max(0, i - maxPiece) until i).map { j =>
        acc(j).where(col("len") >= i)
          .withColumn("piece", expr(s"substring(word, ${j + 1}, ${i - j})"))
          .join(v, "piece")
          .select(col("word"), col("len"),
            (col("n_pieces") + 1L).as("n_pieces"),
            (col("sum_freq") + col("freq")).as("sum_freq"),
            when(col("seq") === "", col("piece"))
              .otherwise(concat(col("seq"), lit(" "), col("piece"))).as("seq"))
      }.reduce(_ unionByName _)
      acc += i -> cand.withColumn("__rn", row_number().over(wdw))
        .where(col("__rn") === 1).drop("__rn").localCheckpoint(true)
    }
    (1 to maxLen).map(i => acc(i).where(col("len") === i))
      .reduce(_ unionByName _)
      .select(col("word"), col("n_pieces"), col("sum_freq"), col("seq"))
  }
}
