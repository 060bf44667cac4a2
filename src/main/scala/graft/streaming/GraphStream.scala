package graft.streaming

import graft.ops.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Corpus-kNN-graph maintenance on ingest — the graph-curation twin of
  * [[EmbedDedupStream]]: each delivery of new embedding rows folds into
  * the persisted [[graft.ops.Similarity.buildKnnGraphIndex]] graph via
  * [[graft.ops.Similarity.appendToKnnGraphIndex]] (new rows LSH-probe
  * the bucketed vector store for cross-corpus candidates; only affected
  * nodes re-rank), so downstream graph curation — mutual-kNN backbone,
  * graph dedup, density pruning, label propagation — always reads a
  * current graph ([[graft.ops.Similarity.readKnnGraph]]) instead of
  * waiting on a corpus-wide rebuild.
  *
  * Per-delivery cost is O(batch + probed buckets + affected nodes'
  * top-k) — independent of total corpus size (the index-once/
  * probe-per-batch contract). Exactly-once under the file stream's
  * at-least-once replay: every micro-batch is ledger-gated on its
  * checkpoint batch id. Build the graph first (an empty corpus frame is
  * a valid bootstrap); graph parameters are fixed at build time and
  * must match here (changing them is a rebuild).
  */
object GraphStream {

  def start(spark: SparkSession, inputDir: String, table: String,
            idCol: String, vecCol: String, buckets: Int, k: Int, bits: Int,
            checkpoint: String, maxBucketSize: Int = 1000,
            trigger: Trigger = Trigger.AvailableNow(),
            maxFilesPerTrigger: Int = 100): StreamingQuery =
    IngestStream.start(spark, inputDir,
      s"knn-graph-ingest-${math.abs(table.hashCode.toLong)}",
      checkpoint, trigger, maxFilesPerTrigger) { (batch, batchId) =>
      // the batch's OWN session (the foreachBatch clone), never the
      // outer one: maintenance mixes reads of the index tables with the
      // batch's frames, and splitting them across two sessions leaves
      // one session's relation cache stale for the tables the other
      // session wrote (the EmbedDedupStream convention)
      Similarity.appendToKnnGraphIndex(batch.sparkSession, batch, idCol,
        vecCol, table, buckets, k, bits, maxBucketSize, s"b$batchId")
    }

  /** The current graph (latest top-k per node). */
  def readGraph(spark: SparkSession, table: String): DataFrame =
    Similarity.readKnnGraph(spark, table)

  /** The current mutual-kNN backbone — computed on read over the
    * (candidate-sized, ≤ N·k row) maintained edge list; there is nothing
    * to maintain incrementally beyond the graph itself. */
  def readBackbone(spark: SparkSession, table: String): DataFrame =
    Similarity.mutualKnn(readGraph(spark, table))
}
