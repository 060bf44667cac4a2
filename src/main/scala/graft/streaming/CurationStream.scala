package graft.streaming

import graft.io.Bucketing
import graft.ops.TextAnalysis
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Quality + decontamination + span-dedup curation on ingest, as a
  * stream: new document files pass the Gopher rule gate
  * ([[graft.ops.TextAnalysis.gopherRules]], per-row), optionally a
  * benchmark-decontamination gate (pooled overlap fraction against an
  * eval suite whose gram set is computed ONCE at stream start — the
  * leakage guard at delivery time), then a span-duplication gate against
  * a persisted span-hash index — a document whose word-n-gram spans are mostly already known to
  * the corpus (boilerplate, templated or re-crawled content) drops, and
  * the survivors' spans BECOME part of the index. The incremental twin of
  * the batch [[graft.ops.TextAnalysis.spanDupRate]] gate, the same closed
  * loop [[DedupStream]] runs for near-dup LSH: a 100 TB corpus stays
  * curated per delivery instead of re-running corpus-wide span stats.
  *
  * The span index is a bucketed table of (`__gh` 60-bit span hash,
  * `__src_id` contributing document id): bucketed on the hash, so the
  * per-batch membership probe (a distinct + join on `__gh`) never
  * exchanges the index side — only the batch's own span stream moves.
  * Appends add one file per non-empty bucket; compact a high-churn index
  * periodically by rebuilding it from the clean corpus
  * ([[buildSpanIndex]]).
  *
  * Replay semantics are id-based, like [[DedupStream]]'s self-match
  * filter: index rows carry the id of the document that contributed
  * them, and a batch's probe excludes postings from the batch's OWN
  * document ids (a broadcast anti-join — the batch side is tiny). A
  * crash between the index append and the checkpoint commit re-runs the
  * batch without seeing its own spans, so decisions are identical; the
  * re-appended rows only duplicate postings for the same span hash, and
  * the gate asks set membership (not counts), so later decisions are
  * unchanged too. Because the exclusion keys on document ids — not on
  * checkpoint-scoped batch ids — a stream restarted with a FRESH
  * checkpoint still probes the whole accumulated index. Document ids
  * must be unique across deliveries (the same contract DedupStream's
  * `id_new <> id_corpus` filter carries). The clean output is idempotent
  * per batch via dynamic-partition overwrite
  * ([[IngestStream.writeClean]]; see its fresh-checkpoint contract).
  *
  * A document's spans count as duplicated if the span hash is in the
  * index (seen by ANY earlier batch) or occurs more than once within the
  * current batch; the document drops when the duplicated fraction
  * exceeds `maxDupRate`. On an empty index this reduces exactly to the
  * batch semantics: gopherRules(pass) ∧ spanDupRate.dup_rate ≤
  * maxDupRate (spec-asserted).
  *
  * Migration: span indexes written by the earlier batch-id-scoped scheme
  * carry `__batch_id` instead of `__src_id` and must be rebuilt
  * ([[buildSpanIndex]] over the clean corpus) before a stream on this
  * version runs against them — the probe's anti-join fails loudly on the
  * missing column otherwise.
  */
object CurationStream {

  val BatchCol = IngestStream.BatchCol

  def start(spark: SparkSession, inputDir: String, cleanDir: String,
            spanIndexTable: String, idCol: String, textCol: String,
            checkpoint: String, maxDupRate: Double = 0.9, spanN: Int = 3,
            buckets: Int = 8, minWords: Int = 50,
            trigger: Trigger = Trigger.AvailableNow(),
            maxFilesPerTrigger: Int = 100,
            bench: Option[DataFrame] = None, benchTextCol: String = "text",
            benchShingleWords: Int = 3,
            maxOverlapFrac: Double = 0.5,
            redactPii: Boolean = false): StreamingQuery = {
    // The eval suite's gram set is computed ONCE at stream start (eager,
    // cleaner-reclaimed) — the suite is static across the stream's life,
    // so per-batch work is just the broadcast membership join.
    val benchGrams = bench.map(b =>
      graft.ops.Decontaminate.benchGramSet(b, benchTextCol, benchShingleWords)
        .localCheckpoint(true))
    IngestStream.start(spark, inputDir, s"curation-ingest-$spanIndexTable",
      checkpoint, trigger, maxFilesPerTrigger) { (batch, batchId) =>
      ingestBatch(batch, batchId, cleanDir, spanIndexTable, idCol,
        textCol, maxDupRate, spanN, buckets, minWords,
        benchGrams, benchShingleWords, maxOverlapFrac, redactPii)
    }
  }

  /** One batch of the loop — also the batch-mode entry point (callable
    * without a stream for tests and delivery-sized backfills; the probe
    * sets broadcast by hint, so corpus-scale batches belong in the batch
    * operators + [[buildSpanIndex]] instead). */
  def ingestBatch(batch: DataFrame, batchId: Long, cleanDir: String,
                  spanIndexTable: String, idCol: String, textCol: String,
                  maxDupRate: Double, spanN: Int, buckets: Int,
                  minWords: Int, benchGrams: Option[DataFrame] = None,
                  benchShingleWords: Int = 3,
                  maxOverlapFrac: Double = 0.5,
                  redactPii: Boolean = false): Unit = {
    val spark = batch.sparkSession
    val docs = batch.localCheckpoint(true)

    // 1. Gopher rule gate — per-row, before any span work is paid.
    val gopherPass = TextAnalysis.gopherRules(docs, idCol, textCol,
      minWords = minWords).where(col("pass")).select(idCol)
    // Materialized when the decontamination gate will consume it twice
    // (scoring subtree + anti-join left side) — unmaterialized, the
    // per-row rule math would re-run per consumer.
    val rulePassed0 = docs.join(gopherPass, Seq(idCol), "left_semi")
    val rulePassed =
      if (benchGrams.isDefined) rulePassed0.localCheckpoint(true)
      else rulePassed0

    // 1b. Decontamination gate (optional): drop documents whose distinct
    // gram overlap with the (precomputed, stream-static) eval-suite gram
    // set is ≥ maxOverlapFrac — the leakage guard at delivery time, the
    // incremental twin of [[graft.ops.Decontaminate.contaminationScores]].
    // Stateless (the suite never changes mid-stream), so replays are
    // trivially idempotent. Runs AFTER the per-row rules (cheapest gate
    // first) and BEFORE any span/index work is paid.
    val gated = (benchGrams match {
      case None => rulePassed
      case Some(bg) =>
        val hits = graft.ops.Decontaminate.contaminationScoresAgainst(
          rulePassed, idCol, textCol, bg, benchShingleWords, maxOverlapFrac)
          .where(col("contaminated")).select(col("doc_id").as(idCol))
        rulePassed.join(hits, Seq(idCol), "left_anti")
    }).localCheckpoint(true)

    // 2. Span gate. The batch's span stream is materialized once (it
    // feeds the intra-batch counts, the index probe, and — for the
    // survivors — the index append).
    val spans = TextAnalysis.spanHashes(gated, idCol, textCol, spanN)
      .localCheckpoint(true)
    val intra = spans.groupBy("__gh").agg(count(lit(1)).as("__bn"))
    val known =
      if (spark.catalog.tableExists(spanIndexTable))
        knownSpans(spark, spanIndexTable, docs.select(col(idCol)), idCol, spans)
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

    // 3a. Clean output, idempotent per batch — optionally PII-masked
    // (scrub-on-ingest: emails → URLs → phones, the same ordered rewrite
    // as the batch [[TextAnalysis.piiRedact]]). Gates and the span index
    // always see the ORIGINAL text: redaction must not mask duplicate
    // evidence, and replays stay byte-identical either way (the rewrite
    // is a pure function of the row).
    val out =
      if (redactPii)
        survivors.withColumn(textCol, TextAnalysis.piiRedactCol(col(textCol)))
      else survivors
    IngestStream.writeClean(out, batchId, cleanDir)
    // 3b. Survivors' spans join the index, tagged with their source doc.
    val survivorSpans = spans
      .join(survivors.select(idCol), Seq(idCol), "left_semi")
      .select(col("__gh"), col(idCol).as("__src_id"))
    if (spark.catalog.tableExists(spanIndexTable))
      Bucketing.appendBucketed(survivorSpans, spanIndexTable, "__gh", buckets)
    else
      Bucketing.writeBucketed(survivorSpans, spanIndexTable, "__gh", buckets)
  }

  /** The distinct span hashes the index already knows AMONG the batch's
    * own spans, EXCLUDING postings contributed by the given document ids
    * (the current batch's — replay safety, see the object doc).
    *
    * Shape per batch: the replay exclusion is a broadcast anti-join (the
    * batch id set is micro-batch-sized) and the batch's span hashes
    * semi-join the index BEFORE the distinct — both preserve the index
    * scan's bucket layout, so nothing index-side exchanges (plan-asserted
    * in CurationStreamSpec). The semi-join-then-distinct order is what
    * bounds per-task state: a distinct over the RAW index would build
    * hash tables proportional to the whole corpus' posting list every
    * micro-batch, while this aggregates at most the batch's own distinct
    * span count. The full index scan per batch is inherent to a
    * membership gate (uniform hashes defeat file pruning) but touches
    * only the two 8-byte columns (`__gh`, plus `__src_id` for the replay
    * exclusion).
    *
    * Both probe-side joins are broadcast by HINT, not by size estimate:
    * a localCheckpoint'ed span stream carries no useful stats, and an
    * auto-demotion to sort-merge would re-sort the whole index posting
    * list per batch — the exact cost this shape exists to avoid. The
    * hint is safe because both sets are delivery-sized (bounded by
    * `maxFilesPerTrigger`); for corpus-scale BACKFILLS use the batch
    * operators ([[graft.ops.TextAnalysis.spanDupRate]] +
    * [[buildSpanIndex]]), not the ingest loop. */
  private[graft] def knownSpans(spark: SparkSession, spanIndexTable: String,
                                batchIds: DataFrame, idCol: String,
                                batchSpans: DataFrame): DataFrame =
    Bucketing.readBucketed(spark, spanIndexTable)
      .join(broadcast(batchIds.select(col(idCol).as("__src_id"))),
        Seq("__src_id"), "left_anti")
      .join(broadcast(batchSpans.select(col("__gh")).distinct()),
        Seq("__gh"), "left_semi")
      .select(col("__gh")).distinct()
      .withColumn("__known", lit(true))

  /** Rebuild (compact) the span index from a document corpus — one file
    * per bucket again after append churn, real contributor ids preserved
    * so replay exclusion keeps working against the rebuilt rows. */
  def buildSpanIndex(docs: DataFrame, spanIndexTable: String, idCol: String,
                     textCol: String, spanN: Int = 3, buckets: Int = 8): Unit =
    Bucketing.writeBucketed(
      TextAnalysis.spanHashes(docs, idCol, textCol, spanN)
        .select(col("__gh"), col(idCol).as("__src_id")),
      spanIndexTable, "__gh", buckets)

  /** The curated corpus the stream maintains (partition column dropped). */
  def readClean(spark: SparkSession, cleanDir: String): DataFrame =
    IngestStream.readClean(spark, cleanDir)
}
