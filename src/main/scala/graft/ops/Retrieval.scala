package graft.ops

import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lexical retrieval over a document corpus — the BM25 ranking path that
  * pairs with the ANN operators ([[Similarity]]) under reciprocal-rank
  * fusion ([[Similarity.rrfFuse]]) for hybrid retrieval: the embedding
  * side recalls semantic neighbors, this side recalls exact-term matches,
  * and the fused list is the standard training-data / RAG retrieval
  * frontend.
  */
object Retrieval {

  /** BM25 top-k (Robertson-Spärck Jones): per (query, doc) the score is
    * `Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))` over the
    * query's distinct terms, ranked per query.
    *
    * idf here is the RATIONAL variant `(N − df + 0.5)/(df + 0.5)` — the
    * argument of the canonical `log(...)` idf, without the log. The log
    * is monotone, so single-term rankings are identical; multi-term sums
    * weight rare terms more steeply than log-BM25 (documented trade). The
    * payoff is exact cross-engine reproducibility: every operation is
    * IEEE double arithmetic on exactly-representable inputs (counts, 0.5,
    * and the parsed k1/b literals), with the per-(query, doc) sum folded
    * in term order — no transcendental-library variance, so the oracle
    * hash-matches bitwise. Callers needing classic log idf can post-map
    * df → ln(...) and accept engine-level ulp drift.
    *
    * Plan shape at scale: ONE tokenize+explode pass builds the (doc,
    * term, tf) posting table (map-side combine eats duplicate terms);
    * df and dl both derive from it (no corpus rescan — the posting table
    * is materialized once, eager, cleaner-reclaimed); the query terms are
    * a tiny broadcast, so candidate generation is a broadcast join that
    * touches only postings of query terms; dl/df attach to CANDIDATE rows
    * only. The per-(query, doc) fold group is bounded by the query's
    * distinct term count, and the final top-k window ranks candidate-sized
    * data. The corpus-sized work is exactly the posting-table build — the
    * inverted-index construction any lexical engine pays once and, at
    * 100 TB, persists bucketed by term for reuse across query batches.
    *
    * `queries` carries (qidCol, qtextCol) and must be small (broadcast).
    * Output: (qidCol, idCol, score, rank ≤ k), score descending. */
  def bm25TopK(docs: DataFrame, queries: DataFrame, idCol: String,
               textCol: String, qidCol: String, qtextCol: String, k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    // Posting table (doc, term, tf) — three consumers (df, dl, scoring
    // join) read it, so materialize once instead of re-tokenizing the
    // corpus per consumer.
    val tf = docs
      .select(col(idCol), explode(tokens(col(textCol))).as("term"))
      .groupBy(idCol, "term").agg(count(lit(1)).as("tf"))
      .localCheckpoint(true)
    val dfq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val dl = tf.groupBy(idCol).agg(sum("tf").as("dl"))
    // Both scalars in ONE agg → one broadcast crossJoin, not two jobs.
    // Exact integer sums/counts, so avgdl is one IEEE division on exact
    // inputs — identical in the mirror.
    val stats = dl.agg(count(lit(1)).as("__nd"), sum("dl").as("__tt"))
    val cand = tf
      .join(queryTerms(queries, qidCol, qtextCol), "term") // broadcast: only query-term postings survive
      .join(dfq, "term")            // candidate-sized probe of the vocab table
      .join(dl, idCol)
      .crossJoin(broadcast(stats))
      .select(col(qidCol), col(idCol), col("term"),
        bm25Contrib(k1, b).as("__v"))
    rankCandidates(cand, qidCol, idCol, k)
  }

  /** Persist a BM25 index: the (doc, term, tf, dl) posting table bucketed
    * by `term` (dl denormalized onto each posting so the read path never
    * re-joins the corpus) plus a one-row `<table>_stats` sidecar
    * (n_docs, total_tokens). The 100 TB shape: the inverted index builds
    * ONCE (the corpus-sized tokenize + partial-agg this pays), and every
    * query batch afterwards touches only its terms' buckets
    * ([[bm25AgainstIndex]]) — the same index-then-probe contract as
    * [[Dedup.writeLshIndex]] / [[Similarity.writeIvfIndex]]. df is NOT
    * stored: it is exactly the posting count of a term, which the probe
    * recounts over the (complete) surviving postings of each probed term
    * — so appends to the index never leave a stale df behind. */
  def writeBm25Index(docs: DataFrame, idCol: String, textCol: String,
                     table: String, buckets: Int): Unit = {
    val tf = docs
      .select(col(idCol), explode(tokens(col(textCol))).as("term"))
      .groupBy(idCol, "term").agg(count(lit(1)).as("tf"))
      .localCheckpoint(true)
    val dl = tf.groupBy(idCol).agg(sum("tf").as("dl"))
    graft.io.Bucketing.writeBucketed(tf.join(dl, idCol), table, "term", buckets)
    dl.agg(count(lit(1)).as("n_docs"), sum("dl").as("total_tokens"))
      .write.mode("overwrite").format("parquet").saveAsTable(table + "_stats")
  }

  /** Append a new batch's postings to a persisted BM25 index, preserving
    * the term-bucket layout, and roll the one-row stats sidecar forward
    * (n_docs += batch docs, total_tokens += batch tokens — exact integer
    * adds, so an indexed-then-appended corpus scores bit-identically to a
    * from-scratch index over the union; df needs no maintenance at all
    * because the probe recounts it from postings). Batch ids must be NEW
    * (an id already indexed would double its postings — same contract as
    * [[Dedup.appendToLshIndex]]). Appends add one file per non-empty
    * bucket; compact a high-churn index by re-running [[writeBm25Index]]
    * over the full corpus. */
  def appendToBm25Index(spark: org.apache.spark.sql.SparkSession,
                        docs: DataFrame, idCol: String, textCol: String,
                        table: String, buckets: Int): Unit = {
    val tf = docs
      .select(col(idCol), explode(tokens(col(textCol))).as("term"))
      .groupBy(idCol, "term").agg(count(lit(1)).as("tf"))
      .localCheckpoint(true)
    val dl = tf.groupBy(idCol).agg(sum("tf").as("dl"))
    graft.io.Bucketing.appendBucketed(tf.join(dl, idCol), table, "term", buckets)
    val rolled = spark.table(table + "_stats")
      .unionByName(dl.agg(count(lit(1)).as("n_docs"), sum("dl").as("total_tokens")))
      .agg(sum("n_docs").as("n_docs"), sum("total_tokens").as("total_tokens"))
      // The sidecar is being overwritten in place — detach the new row
      // from the table it reads, or the write truncates its own input.
      .localCheckpoint(true)
    rolled.write.mode("overwrite").format("parquet")
      .saveAsTable(table + "_stats")
  }

  /** BM25 top-k against a persisted [[writeBm25Index]] index — the read
    * path that never re-scans the corpus: the query's distinct terms
    * broadcast-semi-join the term-bucketed posting table (only probed
    * buckets contribute; the index side needs NO exchange — its bucket
    * layout already satisfies both the df window's and the join's
    * partitioning), df is recounted per probed term over its complete
    * surviving postings (exact — see [[writeBm25Index]]), and scoring +
    * top-k run over candidate-sized data. Scores are bit-identical to
    * [[bm25TopK]] on the same corpus (spec-asserted): same contribution
    * expression, same term-order fold. */
  def bm25AgainstIndex(spark: org.apache.spark.sql.SparkSession,
                       table: String, queries: DataFrame, qidCol: String,
                       qtextCol: String, k: Int, k1: Double = 1.2,
                       b: Double = 0.75): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val qt = queryTerms(queries, qidCol, qtextCol)
    val postings = graft.io.Bucketing.readBucketed(spark, table)
    val idCol = postings.columns.head // (idCol, term, tf, dl) write order
    val stats = spark.table(table + "_stats")
      .select(col("n_docs").as("__nd"), col("total_tokens").as("__tt"))
    val probed = postings
      .join(broadcast(qt.select("term")), Seq("term"), "left_semi")
      .withColumn("df", count(lit(1)).over(Window.partitionBy("term")))
    val cand = probed
      .join(qt, "term")
      .crossJoin(broadcast(stats))
      .select(col(qidCol), col(idCol), col("term"),
        bm25Contrib(k1, b).as("__v"))
    rankCandidates(cand, qidCol, idCol, k)
  }

  /** The broadcast (qid, distinct term) expansion both paths probe with. */
  private def queryTerms(queries: DataFrame, qidCol: String,
                         qtextCol: String): DataFrame =
    broadcast(queries.select(col(qidCol),
      explode(array_distinct(tokens(col(qtextCol)))).as("term")))

  /** The per-(query, doc, term) BM25 contribution over bound columns
    * (tf, df, dl, __nd, __tt) — ONE expression shared by the recompute
    * and against-index paths (and mirrored verbatim in the oracle SQL). */
  private def bm25Contrib(k1: Double, b: Double): Column = {
    val avgdl = col("__tt").cast("double") / col("__nd").cast("double")
    val idf = (col("__nd").cast("double") - col("df").cast("double") + lit(0.5)) /
      (col("df").cast("double") + lit(0.5))
    idf * (col("tf").cast("double") * lit(k1 + 1.0)) /
      (col("tf").cast("double") +
        lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / avgdl))
  }

  /** Fold the ≤|query terms| contributions per (query, doc) in term order
    * (deterministic, bounded — same contract as Similarity's sliced
    * folds), then rank per query. */
  private def rankCandidates(cand: DataFrame, qidCol: String, idCol: String,
                             k: Int): DataFrame = {
    val scored = cand.groupBy(qidCol, idCol)
      .agg(aggregate(
        array_sort(collect_list(struct(col("term"), col("__v").as("v")))),
        lit(0.0), (acc, s) => acc + s.getField("v")).as("score"))
    val w = Window.partitionBy(qidCol).orderBy(col("score").desc, col(idCol))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
  }
}
