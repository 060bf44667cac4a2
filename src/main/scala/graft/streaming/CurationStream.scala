package graft.streaming

import graft.io.Bucketing
import graft.ops.TextAnalysis
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Quality + span-dedup curation on ingest, as a stream: new document
  * files pass the Gopher rule gate ([[graft.ops.TextAnalysis.gopherRules]],
  * per-row), then a span-duplication gate against a persisted span-hash
  * index — a document whose word-n-gram spans are mostly already known to
  * the corpus (boilerplate, templated or re-crawled content) drops, and
  * the survivors' spans BECOME part of the index. The incremental twin of
  * the batch [[graft.ops.TextAnalysis.spanDupRate]] gate, the same closed
  * loop [[DedupStream]] runs for near-dup LSH: a 100 TB corpus stays
  * curated per delivery instead of re-running corpus-wide span stats.
  *
  * The span index is a bucketed table of (`__gh` 60-bit span hash,
  * `__batch_id`): bucketed on the hash, so the per-batch membership probe
  * (a distinct + join on `__gh`) never exchanges the index side — only
  * the batch's own span stream moves. Appends add one file per non-empty
  * bucket; compact a high-churn index periodically by rebuilding it from
  * the clean corpus ([[buildSpanIndex]]).
  *
  * Replay semantics: index rows carry the batch id that wrote them, and
  * a batch only probes rows with `__batch_id < batchId` — a crash between
  * the index append and the checkpoint commit re-runs the batch WITHOUT
  * seeing its own spans, so decisions are identical; the re-appended
  * rows only duplicate postings for the same span hash, and the gate
  * asks set membership (not counts), so later decisions are unchanged
  * too. The clean output is idempotent per batch via dynamic-partition
  * overwrite (the [[DedupStream.ingestBatch]] pattern).
  *
  * A document's spans count as duplicated if the span hash is in the
  * index (seen by ANY earlier batch) or occurs more than once within the
  * current batch; the document drops when the duplicated fraction
  * exceeds `maxDupRate`. On an empty index this reduces exactly to the
  * batch semantics: gopherRules(pass) ∧ spanDupRate.dup_rate ≤
  * maxDupRate (spec-asserted).
  */
object CurationStream {

  val BatchCol = "__batch_id"

  def start(spark: SparkSession, inputDir: String, cleanDir: String,
            spanIndexTable: String, idCol: String, textCol: String,
            checkpoint: String, maxDupRate: Double = 0.9, spanN: Int = 3,
            buckets: Int = 8, minWords: Int = 50,
            trigger: Trigger = Trigger.AvailableNow(),
            maxFilesPerTrigger: Int = 100): StreamingQuery = {
    val schema = spark.read.parquet(inputDir).schema
    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .option("latestFirst", "false")
      .parquet(inputDir)

    stream.writeStream
      .queryName(s"curation-ingest-$spanIndexTable")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          ingestBatch(batch, batchId, cleanDir, spanIndexTable, idCol,
            textCol, maxDupRate, spanN, buckets, minWords)
      }
      .start()
  }

  /** One batch of the loop — also the batch-mode entry point (callable
    * without a stream for backfills/tests). */
  def ingestBatch(batch: DataFrame, batchId: Long, cleanDir: String,
                  spanIndexTable: String, idCol: String, textCol: String,
                  maxDupRate: Double, spanN: Int, buckets: Int,
                  minWords: Int): Unit = {
    val spark = batch.sparkSession
    val docs = batch.localCheckpoint(true)

    // 1. Gopher rule gate — per-row, before any span work is paid.
    val gopherPass = TextAnalysis.gopherRules(docs, idCol, textCol,
      minWords = minWords).where(col("pass")).select(idCol)
    val gated = docs.join(gopherPass, Seq(idCol), "left_semi")
      .localCheckpoint(true)

    // 2. Span gate. The batch's span stream is materialized once (it
    // feeds the intra-batch counts, the index probe, and — for the
    // survivors — the index append).
    val spans = TextAnalysis.spanHashes(gated, idCol, textCol, spanN)
      .localCheckpoint(true)
    val intra = spans.groupBy("__gh").agg(count(lit(1)).as("__bn"))
    // Known spans: distinct hash probe over the bucketed index — the
    // distinct and the join both run in the bucket layout, no index-side
    // exchange. Rows this batch wrote on a replayed attempt are excluded.
    val known =
      if (spark.catalog.tableExists(spanIndexTable))
        Bucketing.readBucketed(spark, spanIndexTable)
          .where(col(BatchCol) < batchId)
          .select(col("__gh")).distinct()
          .withColumn("__known", lit(true))
      else null
    val flaggedSpans = {
      val withIntra = spans.join(intra, "__gh")
      if (known == null) withIntra.withColumn("__known", lit(false))
      else withIntra.join(known, Seq("__gh"), "left")
        .withColumn("__known", coalesce(col("__known"), lit(false)))
    }
    val losers = flaggedSpans
      .groupBy(idCol)
      .agg((sum(when(col("__known") || col("__bn") > 1L, 1L).otherwise(0L))
        .cast("double") / count(lit(1)).cast("double")).as("__dup_rate"))
      .where(col("__dup_rate") > maxDupRate)
      .select(idCol)
    val survivors = gated.join(losers, Seq(idCol), "left_anti")
      .localCheckpoint(true)

    // 3a. Clean output, idempotent per batch (writer-scoped dynamic
    // partition overwrite — never a session-conf toggle).
    survivors.withColumn(BatchCol, lit(batchId))
      .write.option("partitionOverwriteMode", "dynamic")
      .partitionBy(BatchCol).mode("overwrite").parquet(cleanDir)
    // 3b. Survivors' spans join the index.
    val survivorSpans = spans
      .join(survivors.select(idCol), Seq(idCol), "left_semi")
      .select(col("__gh")).withColumn(BatchCol, lit(batchId))
    if (spark.catalog.tableExists(spanIndexTable))
      Bucketing.appendBucketed(survivorSpans, spanIndexTable, "__gh", buckets)
    else
      Bucketing.writeBucketed(survivorSpans, spanIndexTable, "__gh", buckets)
  }

  /** Rebuild (compact) the span index from a document corpus — one file
    * per bucket again after append churn. The rebuilt rows carry batch id
    * −1 so every future batch probes them. */
  def buildSpanIndex(docs: DataFrame, spanIndexTable: String, idCol: String,
                     textCol: String, spanN: Int = 3, buckets: Int = 8): Unit =
    Bucketing.writeBucketed(
      TextAnalysis.spanHashes(docs, idCol, textCol, spanN)
        .select(col("__gh")).withColumn(BatchCol, lit(-1L)),
      spanIndexTable, "__gh", buckets)

  /** The curated corpus the stream maintains (partition column dropped). */
  def readClean(spark: SparkSession, cleanDir: String): DataFrame =
    spark.read.parquet(cleanDir).drop(BatchCol)
}
