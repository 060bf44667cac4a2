package graft.streaming

import graft.functions.VectorFunctions.cosine
import graft.ops.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Embedding (semantic) dedup-on-ingest — the [[DedupStream]] twin for
  * the `embeddings` side of the corpus, running SemDeDup semantics
  * incrementally: new embedding files are assigned to their IVF cluster
  * (broadcast centroids, per-row math), pruned within the delivery
  * ([[graft.ops.Similarity.semDedupAssigned]] — intra-cluster pairs
  * only, over-cap clusters via in-cluster LSH), checked against the
  * persisted cluster-partitioned index for an above-threshold corpus
  * neighbor, and the survivors both land in the clean output and join
  * the index.
  *
  * Index layout is [[graft.ops.Similarity.writeIvfIndex]]'s: parquet
  * hive-partitioned by `cluster`. Per batch the probe reads ONLY the
  * delivery's clusters (static partition pruning via
  * [[graft.ops.Similarity.readIvfIndex]] — a delivery touching c of K
  * clusters scans c/K of the index in bytes, not just rows) and the
  * batch side rides a broadcast HINT onto the cluster join, so the index
  * never shuffles OR sorts — per-delivery cost is O(probed partitions),
  * independent of total corpus size. Candidates are intra-cluster only
  * (the SemDeDup contract): a near-duplicate pair straddling a cluster
  * boundary is accepted recall loss, same as the batch operator.
  *
  * Replay semantics are id-based like [[CurationStream]]'s span probe: a
  * crash between the index append and the checkpoint commit re-runs the
  * batch against an index already holding the batch's own rows, so the
  * probe EXCLUDES index entries whose id is in the current batch (a
  * broadcast anti-join — the batch id set is micro-batch-sized). An `id`
  * inequality alone would not be enough: the intra-delivery prune is
  * LSH-bounded inside over-cap clusters, so two above-threshold batch
  * rows CAN both survive it, and on replay each would see the other's
  * indexed row and both would drop — different decisions than the first
  * run. With the exclusion, re-appended rows only duplicate index
  * entries and decisions are unchanged. Compact a churned index by
  * rebuilding from the clean corpus ([[buildIndex]]). Ids must be
  * unique across deliveries.
  *
  * Centroids are the stream-static coarse quantizer (train offline with
  * [[graft.ops.Similarity.kMeans]], like a FAISS IVF index); they are
  * materialized once at stream start, not per batch. Re-clustering the
  * corpus means rebuilding the index — the standard IVF lifecycle.
  */
object EmbedDedupStream {

  val BatchCol = IngestStream.BatchCol

  def start(spark: SparkSession, inputDir: String, cleanDir: String,
            indexDir: String, centroids: DataFrame, idCol: String,
            vecCol: String, cidCol: String, checkpoint: String,
            threshold: Double = 0.9, maxClusterSize: Int = 10000,
            heavyBits: Int = 6, heavyMaxBucketSize: Int = 1000,
            trigger: Trigger = Trigger.AvailableNow(),
            maxFilesPerTrigger: Int = 100, maintainEvery: Int = 0): StreamingQuery = {
    // The coarse quantizer is static across the stream's life —
    // materialize once (eager, cleaner-reclaimed), assign per batch.
    val cents = centroids.localCheckpoint(true)
    IngestStream.start(spark, inputDir,
      s"embed-dedup-ingest-${math.abs(indexDir.hashCode.toLong)}",
      checkpoint, trigger, maxFilesPerTrigger) { (batch, batchId) =>
      ingestBatch(batch, batchId, cleanDir, indexDir, cents, idCol,
        vecCol, cidCol, threshold, maxClusterSize, heavyBits,
        heavyMaxBucketSize, maintainEvery)
    }
  }

  /** One batch of the loop — also the batch-mode entry point (callable
    * without a stream for tests and delivery-sized backfills; the probe
    * side broadcasts by hint, so corpus-scale batches belong in
    * [[buildIndex]] + the batch [[graft.ops.Similarity.semDedup]]
    * instead). */
  def ingestBatch(batch: DataFrame, batchId: Long, cleanDir: String,
                  indexDir: String, centroids: DataFrame, idCol: String,
                  vecCol: String, cidCol: String, threshold: Double,
                  maxClusterSize: Int, heavyBits: Int,
                  heavyMaxBucketSize: Int, maintainEvery: Int = 0): Unit = {
    val spark = batch.sparkSession
    // One centroid pass per delivery; the assignment feeds the intra
    // prune, the index probe, and the survivors' index append.
    val assigned = Similarity.ivfAssign(batch, centroids, idCol, vecCol, cidCol)
      .localCheckpoint(true)

    // 1. intra-delivery: SemDeDup inside the batch (keeps lowest id of
    // every ≥-threshold intra-cluster pair).
    val intraKept = Similarity.semDedupAssigned(
      assigned.select(col(idCol), col(vecCol), col("cluster")),
      idCol, vecCol, threshold, maxClusterSize, heavyBits, heavyMaxBucketSize)
      .select(idCol)
    // Materialized: it feeds the broadcast probe, the anti-join's left
    // side, and the final writes — unmaterialized, the intra prune (the
    // heaviest per-batch computation) would re-run per consumer.
    val intraSurvivors = assigned.join(intraKept, Seq(idCol), "left_semi")
      .localCheckpoint(true)

    // 2. cross-index: drop batch rows with an above-threshold corpus
    // neighbor in their cluster. The probe reads only the delivery's
    // clusters (partition pruning), excludes the batch's OWN ids (replay
    // safety — see the object doc), and broadcasts the delivery side.
    val survivors = (if (Similarity.ivfIndexExists(spark, indexDir)) {
      val clusters = intraSurvivors.select(col("cluster").cast("long"))
        .distinct().collect().map(_.getLong(0)).toSeq.sorted
      val probe = broadcast(intraSurvivors
        .select(col("cluster"), col(idCol).as("__id_n"), col(vecCol).as("__vn")))
      val batchIds = broadcast(assigned.select(col(idCol).as("__id_c")))
      val crossLosers = Similarity.readIvfIndex(spark, indexDir, clusters)
        .select(col("cluster"), col(idCol).as("__id_c"), col(vecCol).as("__vc"))
        .join(batchIds, Seq("__id_c"), "left_anti")
        .join(probe, Seq("cluster"))
        .where(cosine(col("__vn"), col("__vc")) >= threshold)
        .select(col("__id_n").as(idCol)).distinct()
      intraSurvivors.join(crossLosers, Seq(idCol), "left_anti")
    } else intraSurvivors).localCheckpoint(true)

    // 3a. clean output (original batch columns), idempotent per batch.
    IngestStream.writeClean(survivors.drop("cluster"), batchId, cleanDir)
    // 3b. survivors join the cluster-partitioned index — ledger-gated on
    // the micro-batch id ([[graft.ops.Similarity.appendToIvfIndex]]), so
    // a replayed batch's append is a no-op instead of a duplicated
    // posting set; bootstrap is the same call (append creates the
    // directory). The id-based probe exclusion above remains for the
    // window between the data commit and the ledger commit.
    Similarity.appendToIvfIndex(spark,
      survivors.select(col(idCol), col(vecCol), col("cluster")),
      indexDir, s"b$batchId")
    // Sidecar geometry maintenance on the CdcStream maintainEvery
    // cadence: an append-only stream is exactly the growth path that
    // outruns the id-map's build-time bucket count — re-bucket when the
    // doubling threshold is crossed (no-op + one metadata-bounded count
    // otherwise).
    if (maintainEvery > 0 && (batchId + 1) % maintainEvery == 0)
      Similarity.maintainIvfIdMapIfNeeded(spark, indexDir, idCol): Unit
  }

  /** Rebuild (compact) the index from a clean corpus — one fresh file
    * set per cluster partition after append churn. */
  def buildIndex(corpus: DataFrame, centroids: DataFrame, idCol: String,
                 vecCol: String, cidCol: String, indexDir: String): Unit =
    Similarity.writeIvfIndex(
      Similarity.ivfAssign(corpus, centroids, idCol, vecCol, cidCol)
        .select(col(idCol), col(vecCol), col("cluster")),
      indexDir)

  /** The clean corpus the stream maintains (partition column dropped). */
  def readClean(spark: SparkSession, cleanDir: String): DataFrame =
    IngestStream.readClean(spark, cleanDir)

}
