package graft.streaming

import graft.ops.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Dedup-on-ingest as a stream: new document files are checked against
  * the persisted bucketed LSH index ([[graft.ops.Dedup.writeLshIndex]]),
  * near-duplicates are dropped, and the surviving documents both land in
  * the clean output AND become part of the index — the closed loop that
  * keeps a 100 TB corpus duplicate-free incrementally instead of
  * re-running corpus-wide dedup per delivery.
  *
  * Per micro-batch (foreachBatch — the decision needs a join against the
  * index, not a pure streaming operator):
  *   1. intra-batch LSH pairs ([[graft.ops.Dedup.lshCandidatePairs]]);
  *      a doc with a LOWER-id near-duplicate in the same batch drops;
  *   2. cross-index candidates
  *      ([[graft.ops.Dedup.lshCandidatesAgainstIndex]]): batch docs with
  *      an above-threshold index neighbor drop. The index side never
  *      shuffles (bucket layout, plan-asserted in ScaleOpsSpec);
  *   3. survivors append to the clean output under their
  *      `__batch_id=<id>` partition (dynamic-partition overwrite → a
  *      replayed batch REWRITES its partition instead of duplicating it,
  *      the [[CdcStream.startWithChangeFeed]] idempotence pattern) and
  *      their band rows append to the index.
  *
  * Replay semantics: a crash between the index append and the checkpoint
  * commit re-runs the batch against an index that already contains the
  * batch's own rows. Those self-matches are filtered (`id_new <>
  * id_corpus`), and re-appended band rows only duplicate postings for
  * the same (id, band) — candidate pairs come out of a `distinct`, so
  * decisions are unchanged. Periodic [[graft.ops.Dedup.writeLshIndex]]
  * over the clean corpus compacts the duplicated postings away.
  *
  * First batch: if the index table does not exist yet it is created from
  * the batch's survivors (`writeLshIndex`), so the stream bootstraps an
  * empty corpus.
  */
object DedupStream {

  val BatchCol = IngestStream.BatchCol

  def start(spark: SparkSession, inputDir: String, cleanDir: String,
            indexTable: String, idCol: String, textCol: String,
            checkpoint: String, threshold: Double = 0.8, buckets: Int = 8,
            shingleWords: Int = 3, k: Int = 16, bands: Int = 4,
            maxBucketSize: Int = 1000,
            trigger: Trigger = Trigger.AvailableNow(),
            maxFilesPerTrigger: Int = 100,
            maintainEvery: Int = 1): StreamingQuery =
    IngestStream.start(spark, inputDir, s"dedup-ingest-$indexTable",
      checkpoint, trigger, maxFilesPerTrigger) { (batch, batchId) =>
      ingestBatch(batch, batchId, cleanDir, indexTable, idCol, textCol,
        threshold, buckets, shingleWords, k, bands, maxBucketSize,
        maintainEvery)
    }

  /** One batch of the loop — also the batch-mode entry point (callable
    * without a stream for tests and delivery-sized backfills; the band
    * probe set broadcasts by hint in [[graft.ops.Dedup.lshCandidatesAgainstIndex]],
    * so corpus-scale batches belong in a full [[graft.ops.Dedup.writeLshIndex]]
    * rebuild instead). */
  def ingestBatch(batch: DataFrame, batchId: Long, cleanDir: String,
                  indexTable: String, idCol: String, textCol: String,
                  threshold: Double, buckets: Int, shingleWords: Int,
                  k: Int, bands: Int, maxBucketSize: Int,
                  maintainEvery: Int = 1): Unit = {
    val spark = batch.sparkSession
    // The batch feeds intra-pair generation, the index join, and the
    // final writes — materialize once (eager, cleaner-reclaimed).
    val docs = batch.localCheckpoint(true)

    // 1. intra-batch: drop docs with a lower-id near-dup in this batch
    val intraLosers = Dedup.lshCandidatePairs(docs, idCol, textCol,
      shingleWords, k, bands, maxBucketSize)
      .where(col("est_jaccard") >= threshold)
      .select(col("id_b").as(idCol)).distinct()
    val intraSurvivors = docs.join(intraLosers, Seq(idCol), "left_anti")

    // 2. cross-index: drop docs with an above-threshold corpus neighbor
    val survivors = (if (graft.io.SegmentedIndex.exists(spark, indexTable)) {
      val crossLosers = Dedup.lshCandidatesAgainstIndex(spark, indexTable,
        intraSurvivors, idCol, textCol, shingleWords, k, bands, maxBucketSize)
        .where(col("est_jaccard") >= threshold && col("id_new") =!= col("id_corpus"))
        .select(col("id_new").as(idCol)).distinct()
      intraSurvivors.join(crossLosers, Seq(idCol), "left_anti")
    } else intraSurvivors).localCheckpoint(true)

    // 3a. clean output, idempotent per batch.
    IngestStream.writeClean(survivors, batchId, cleanDir)
    // 3b. survivors join the index — ledger-gated on the micro-batch id,
    // so a replayed batch's append is a no-op (exactly-once; the
    // id-based self-match filter above remains for the pre-ledger
    // window between data commit and ledger commit).
    if (graft.io.SegmentedIndex.exists(spark, indexTable))
      Dedup.appendToLshIndex(survivors, idCol, textCol, indexTable,
        buckets, shingleWords, k, bands, batchId = s"b$batchId")
    else
      Dedup.writeLshIndex(survivors, idCol, textCol, indexTable,
        buckets, shingleWords, k, bands)
    // Threshold maintenance on the CdcStream maintainEvery cadence —
    // safe inside the checkpointed loop even for this APPEND-shaped
    // stream: compaction keeps batch-id memory (seg -1 memo rows), so
    // a replayed pre-compaction delivery still no-ops.
    if (maintainEvery > 0 && (batchId + 1) % maintainEvery == 0)
      Dedup.maintainLshIndexIfNeeded(spark, indexTable, buckets): Unit
  }

  /** The clean corpus the stream maintains (partition column dropped). */
  def readClean(spark: SparkSession, cleanDir: String): DataFrame =
    IngestStream.readClean(spark, cleanDir)
}
