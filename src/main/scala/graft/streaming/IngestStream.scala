package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Shared scaffold for the ingest-gate streams ([[DedupStream]],
  * [[CurationStream]]): a schema-inferred parquet file stream driving a
  * per-batch gate via foreachBatch, plus the idempotent clean-output
  * write and its reader. Extracted so the non-trivial parts — trigger
  * bounding, empty-batch skip, writer-scoped dynamic-partition overwrite
  * — evolve in one place instead of per-gate copies.
  */
private[streaming] object IngestStream {

  val BatchCol = "__batch_id"

  /** File stream → foreachBatch loop. `process` runs once per NON-EMPTY
    * micro-batch with the batch frame and its id; foreachBatch (not a
    * pure streaming operator) because every gate decision needs a join
    * against a persisted index. */
  def start(spark: SparkSession, inputDir: String, queryName: String,
            checkpoint: String, trigger: Trigger, maxFilesPerTrigger: Int)
           (process: (DataFrame, Long) => Unit): StreamingQuery = {
    val schema = spark.read.parquet(inputDir).schema
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .option("latestFirst", "false")
      .parquet(inputDir)
      .writeStream
      .queryName(queryName)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) process(batch, batchId)
      }
      .start()
  }

  /** Clean output, idempotent per batch: a replayed batch REWRITES its
    * `__batch_id=<id>` partition instead of duplicating it (the
    * [[CdcStream.startWithChangeFeed]] idempotence pattern). The
    * overwrite mode rides the WRITER, not the session conf:
    * [[StreamManager]] runs N foreachBatch loops concurrently in one
    * session, and a session-conf toggle here would race other threads'
    * writes into full-overwrite mode.
    *
    * Contract: batch ids are checkpoint-scoped. A stream restarted with
    * a FRESH checkpoint restarts ids at 0 and would overwrite the oldest
    * partitions — resume with the existing checkpoint, or point the
    * rebuilt stream at a fresh cleanDir (seeded from the old clean
    * corpus via the gate's index-rebuild entry point). */
  def writeClean(survivors: DataFrame, batchId: Long, cleanDir: String): Unit =
    survivors.withColumn(BatchCol, lit(batchId))
      .write.option("partitionOverwriteMode", "dynamic")
      .partitionBy(BatchCol).mode("overwrite").parquet(cleanDir)

  /** The clean corpus a gate stream maintains (partition column dropped). */
  def readClean(spark: SparkSession, cleanDir: String): DataFrame =
    spark.read.parquet(cleanDir).drop(BatchCol)
}
