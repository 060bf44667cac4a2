package graft.ops

import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
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
    val qt = broadcast(queries.select(col(qidCol),
      explode(array_distinct(tokens(col(qtextCol)))).as("term")))
    val avgdl = col("__tt").cast("double") / col("__nd").cast("double")
    val idf = (col("__nd").cast("double") - col("df").cast("double") + lit(0.5)) /
      (col("df").cast("double") + lit(0.5))
    val contrib = idf * (col("tf").cast("double") * lit(k1 + 1.0)) /
      (col("tf").cast("double") +
        lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / avgdl))
    val cand = tf
      .join(qt, "term")             // broadcast: only query-term postings survive
      .join(dfq, "term")            // candidate-sized probe of the vocab table
      .join(dl, idCol)
      .crossJoin(broadcast(stats))
      .select(col(qidCol), col(idCol), col("term"), contrib.as("__v"))
    // Fold the ≤|query terms| contributions in term order — deterministic
    // and bounded (same contract as Similarity's sliced folds).
    val scored = cand.groupBy(qidCol, idCol)
      .agg(aggregate(
        array_sort(collect_list(struct(col("term"), col("__v").as("v")))),
        lit(0.0), (acc, s) => acc + s.getField("v")).as("score"))
    val w = Window.partitionBy(qidCol).orderBy(col("score").desc, col(idCol))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
  }
}
