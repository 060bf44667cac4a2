package graft.streaming

import graft.ops.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** The near-dup community HIERARCHY maintained as a stream — the
  * incremental layer on top of the CDC-maintained LSH index: each
  * micro-batch of document changes (a) maintains the banded index
  * ([[Dedup.updateLshIndex]] — tombstones + re-sketches, O(batch)),
  * then (b) refreshes the persisted `(doc_id, comp, comm1, comm2)`
  * hierarchy for ONLY the components the delivery touched
  * ([[Dedup.refreshCommunityIndex]]), instead of re-running Louvain
  * over the corpus-wide candidate graph per delivery.
  *
  * Change files carry `(idCol, textCol, opCol)` with `op = 'D'` for
  * deletes; within one micro-batch the LAST row per id wins (file
  * order, then row order — the CDC latest-wins convention), because
  * [[Dedup.updateLshIndex]]'s contract is a merged change set.
  *
  * Replay semantics: the index update is ledger-gated per micro-batch
  * (a replayed batch no-ops), and the hierarchy refresh is IDEMPOTENT —
  * recomputing the same touched components against the same index
  * splices identical rows — so a crash between refresh and checkpoint
  * commit converges. Bootstrap: a missing hierarchy table is built
  * whole from the index on first touch. */
object CommunityStream {

  def start(spark: SparkSession, inputDir: String, lshTable: String,
            commPath: String, checkpoint: String,
            idCol: String = "doc_id", textCol: String = "text",
            opCol: String = "op", buckets: Int = 8,
            trigger: Trigger = Trigger.AvailableNow(),
            maxFilesPerTrigger: Int = 100,
            maintainEvery: Int = 1, maxSegments: Long = 16L,
            maxTombstoneFraction: Double = 0.3): StreamingQuery = {
    val schema = spark.read.parquet(inputDir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .option("latestFirst", "false")
      .parquet(inputDir)
      .select(col("*"), col("_metadata.file_path").as("__src"),
        col("_metadata.row_index").as("__idx"))
    stream.writeStream
      .queryName(s"community-$lshTable")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(batch, batchId, lshTable, commPath, idCol, textCol,
          opCol, buckets, maintainEvery, maxSegments, maxTombstoneFraction)
      }
      .start()
  }

  /** One delivery: fold to the last row per id, maintain the LSH index,
    * refresh the touched components of the hierarchy. Public so batch
    * callers (and the spec) drive the identical path. */
  def ingestBatch(batch: DataFrame, batchId: Long, lshTable: String,
                  commPath: String, idCol: String, textCol: String,
                  opCol: String, buckets: Int, maintainEvery: Int = 1,
                  maxSegments: Long = 16L,
                  maxTombstoneFraction: Double = 0.3): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(idCol).orderBy(col("__src").desc, col("__idx").desc)
    val merged = batch
      .withColumn("__rn", row_number().over(w)).where(col("__rn") === 1)
      .select(col(idCol), col(textCol), col(opCol))
      .localCheckpoint(true)
    Dedup.updateLshIndex(spark, merged, idCol, textCol, opCol, lshTable,
      buckets = buckets, batchId = s"comm-stream-$batchId")
    val fs = new org.apache.hadoop.fs.Path(commPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(commPath)))
      Dedup.buildCommunityIndex(spark, lshTable, commPath): Unit
    else
      Dedup.refreshCommunityIndex(spark, lshTable, commPath,
        merged.select(col(idCol))): Unit
    // index maintenance policy (the MOR auto-maintenance idea applied to
    // the segmented index), on the CdcStream maintainEvery cadence:
    // O(ledger) when healthy, crash-atomic compact when segment/
    // tombstone budgets trip — AFTER the refresh, which needs the
    // delivery's dead rows intact for cap-transition detection
    // (refreshCommunityIndex scaladoc); the NEXT delivery's probes read
    // the compacted layout.
    if (maintainEvery > 0 && (batchId + 1) % maintainEvery == 0)
      Dedup.maintainLshIndexIfNeeded(spark, lshTable, buckets,
        maxSegments, maxTombstoneFraction): Unit
  }
}
