package graft.streaming

import graft.ops.Retrieval
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Search-index maintenance on ingest: the persisted BM25 index
  * ([[graft.ops.Retrieval.writeBm25Index]]) kept in lockstep with the
  * arriving corpus, so the retrieval frontend never rebuilds — the same
  * index-once/fold-each-delivery contract as [[DedupStream]] (LSH),
  * [[EmbedDedupStream]] (IVF) and [[GraphStream]] (kNN graph), completing
  * the set: every persisted content-index family has a streaming twin.
  *
  * Two entry points, matching the two batch maintenance paths:
  *   - [[start]] — NEW documents only (a crawl append stream): each
  *     micro-batch appends its postings via
  *     [[graft.ops.Retrieval.appendToBm25Index]];
  *   - [[startCdc]] — merged change batches carrying an op column (the
  *     [[graft.cdc.Merge.applySequenced]] shape): upserts re-index,
  *     deletes tombstone, via [[graft.ops.Retrieval.updateBm25Index]].
  *
  * Exactly-once under replay: both maintenance calls are ledger-gated on
  * `"b<micro-batch id>"` (a replayed batch no-ops; a crash between data
  * commit and ledger commit resumes via the segment probes — see
  * [[graft.io.SegmentedIndex]]). Bootstrap writes an EMPTY index and
  * routes batch 0 through the same gated call, so even the first batch
  * is replay-safe (a `writeBm25Index(batch0)` bootstrap would double
  * batch 0 on replay: the base segment is not batch-gated).
  */
object RetrievalStream {

  /** Append-only ingest: every arriving document is NEW (enforce
    * upstream, or use [[startCdc]] for at-least-once id streams). */
  def start(spark: SparkSession, inputDir: String, indexTable: String,
            idCol: String, textCol: String, checkpoint: String,
            buckets: Int = 64,
            trigger: Trigger = Trigger.AvailableNow(),
            maxFilesPerTrigger: Int = 100): StreamingQuery =
    IngestStream.start(spark, inputDir, s"bm25-ingest-$indexTable",
      checkpoint, trigger, maxFilesPerTrigger) { (batch, batchId) =>
      ingestBatch(batch, batchId, indexTable, idCol, textCol, buckets)
    }

  /** CDC ingest: batches are merged change sets (≤ 1 row per id) with
    * `opCol` = "D" for deletes; anything else upserts `textCol`.
    * `maintainEvery` is the [[CdcStream]] cadence contract applied to
    * the index family: the O(ledger) threshold check runs every N
    * micro-batches (0 = never — maintenance is then out-of-band). */
  def startCdc(spark: SparkSession, inputDir: String, indexTable: String,
               idCol: String, textCol: String, opCol: String,
               checkpoint: String, buckets: Int = 64,
               trigger: Trigger = Trigger.AvailableNow(),
               maxFilesPerTrigger: Int = 100, maintainEvery: Int = 1,
               maxSegments: Long = 16L,
               maxTombstoneFraction: Double = 0.3): StreamingQuery =
    IngestStream.start(spark, inputDir, s"bm25-cdc-$indexTable",
      checkpoint, trigger, maxFilesPerTrigger) { (batch, batchId) =>
      cdcBatch(batch, batchId, indexTable, idCol, textCol, opCol, buckets,
        maintainEvery, maxSegments, maxTombstoneFraction)
    }

  /** One append batch — also the batch-mode entry point (tests,
    * delivery-sized backfills). */
  def ingestBatch(batch: DataFrame, batchId: Long, indexTable: String,
                  idCol: String, textCol: String, buckets: Int): Unit = {
    val spark = batch.sparkSession
    bootstrap(spark, batch, idCol, textCol, indexTable, buckets)
    Retrieval.appendToBm25Index(spark, batch, idCol, textCol, indexTable,
      buckets, batchId = s"b$batchId")
  }

  /** One CDC batch — upserts + deletes folded into the live index,
    * then (on the `maintainEvery` cadence, like [[CdcStream]]'s
    * maintainTick) the threshold-driven maintenance check: O(ledger)
    * when healthy, crash-atomic compact when a budget trips. A
    * high-churn stream with `maintainEvery = 0` accumulates segments
    * and tombstones until an operator compacts out-of-band. */
  def cdcBatch(batch: DataFrame, batchId: Long, indexTable: String,
               idCol: String, textCol: String, opCol: String,
               buckets: Int, maintainEvery: Int = 1,
               maxSegments: Long = 16L,
               maxTombstoneFraction: Double = 0.3): Unit = {
    val spark = batch.sparkSession
    bootstrap(spark, batch, idCol, textCol, indexTable, buckets)
    Retrieval.updateBm25Index(spark, batch, idCol, textCol, opCol,
      indexTable, buckets, batchId = s"b$batchId")
    if (maintainEvery > 0 && (batchId + 1) % maintainEvery == 0)
      Retrieval.maintainBm25IndexIfNeeded(spark, indexTable, buckets,
        maxSegments, maxTombstoneFraction): Unit
  }

  /** First contact: create the EMPTY index (base segment has no rows,
    * so every document enters through a batch-gated segment). */
  private def bootstrap(spark: SparkSession, batch: DataFrame, idCol: String,
                        textCol: String, table: String, buckets: Int): Unit =
    // existence resolved through the generation pointer: a compaction
    // drops the plain-named gen-0 tables, and a bare tableExists would
    // make this bootstrap WIPE the live index with an empty rebuild
    if (!graft.io.SegmentedIndex.exists(spark, table))
      Retrieval.writeBm25Index(batch.limit(0), idCol, textCol, table, buckets)

  /** The phrase (adjacent-bigram) index's streaming twin — same
    * contracts as the BM25 methods above; pair both on one input stream
    * for a fully-maintained lexical frontend (BM25 ⊕ phrase by RRF). */
  def startPhrase(spark: SparkSession, inputDir: String, indexTable: String,
                  idCol: String, textCol: String, checkpoint: String,
                  buckets: Int = 64,
                  trigger: Trigger = Trigger.AvailableNow(),
                  maxFilesPerTrigger: Int = 100): StreamingQuery =
    IngestStream.start(spark, inputDir, s"phrase-ingest-$indexTable",
      checkpoint, trigger, maxFilesPerTrigger) { (batch, batchId) =>
      phraseBatch(batch, batchId, indexTable, idCol, textCol, buckets)
    }

  /** One phrase append batch — batch-mode entry point. */
  def phraseBatch(batch: DataFrame, batchId: Long, indexTable: String,
                  idCol: String, textCol: String, buckets: Int): Unit = {
    val spark = batch.sparkSession
    if (!graft.io.SegmentedIndex.exists(spark, indexTable))
      Retrieval.writePhraseIndex(batch.limit(0), idCol, textCol,
        indexTable, buckets)
    Retrieval.appendToPhraseIndex(spark, batch, idCol, textCol, indexTable,
      buckets, batchId = s"b$batchId")
  }

  /** One phrase CDC batch — upserts re-derive bigrams, deletes
    * tombstone ([[graft.ops.Retrieval.updatePhraseIndex]]). */
  def phraseCdcBatch(batch: DataFrame, batchId: Long, indexTable: String,
                     idCol: String, textCol: String, opCol: String,
                     buckets: Int): Unit = {
    val spark = batch.sparkSession
    if (!graft.io.SegmentedIndex.exists(spark, indexTable))
      Retrieval.writePhraseIndex(batch.limit(0), idCol, textCol,
        indexTable, buckets)
    Retrieval.updatePhraseIndex(spark, batch, idCol, textCol, opCol,
      indexTable, buckets, batchId = s"b$batchId")
  }
}
