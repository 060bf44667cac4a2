package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared segment machinery for the persisted content indexes (BM25
  * postings, LSH signatures, IVF vectors): every index row carries the
  * segment number that wrote it, and a small append-only ledger table
  * records one row per committed write.
  *
  * The ledger is what turns the indexes' at-least-once ingestion into
  * exactly-once maintenance (the engine's own delivery model, §2.9):
  *
  *  - **Idempotent appends.** Each write names a `batch_id`; a replayed
  *    batch finds its id in the ledger and no-ops — the same exclusion
  *    contract [[graft.streaming.EmbedDedupStream]] applies per batch,
  *    promoted to the batch index APIs (appending a batch twice ≡ once).
  *  - **Crash resume.** Index data and the ledger are separate parquet
  *    commits; the ledger row goes LAST, so it marks the batch complete.
  *    A crash in between leaves segment-tagged data without a ledger row;
  *    the retry recomputes the same segment number (max ledger seg + 1 —
  *    single writer per index, documented), probes each data table for
  *    that segment (a limit-1 scan: appended files carry a constant
  *    `__seg`, so parquet row-group stats prune to the candidate files),
  *    skips the parts that committed, and finishes the rest.
  *  - **Exact stats.** Ledger rows carry the segment's exact integer
  *    contributions (doc count, token count); current totals are the
  *    ledger sum minus the tombstoned versions — no read-modify-overwrite
  *    of a mutable sidecar (a crashed overwrite corrupted nothing, and
  *    two appends never race a shared row).
  *
  * CDC deletes/updates are TOMBSTONES, not rewrites: a change batch at
  * segment `s` records `(id, below_seg = s)` for every changed id, and
  * readers drop index rows whose `(id, __seg)` satisfies
  * `__seg < max(below_seg)` for their id. An updated document's fresh
  * rows (written at segment `s`) survive their own tombstone; all prior
  * versions die. Maintenance cost is O(change batch), not O(index) — the
  * 100 TB point of the design — and the probe pays one broadcast join
  * against the tombstone set, bounded by churn since the last compaction
  * (which folds tombstones into a fresh segment-0 index).
  */
object SegmentedIndex {

  /** Segment column on every index data row. */
  val SegCol = "__seg"
  /** Ledger batch id used by the initial (overwrite) index build. */
  val BaseBatch = "__base"

  def ledgerTable(table: String): String = table + "_segments"
  def tombstoneTable(table: String): String = table + "_tombstones"

  /** Full ledger: (seg, batch_id, n_docs, total_tokens, id_col). */
  def ledger(spark: SparkSession, table: String): DataFrame =
    spark.table(ledgerTable(table))

  /** Tombstones: (<id_col>, below_seg[, dl]) — schema owned per family. */
  def tombstones(spark: SparkSession, table: String): DataFrame =
    spark.table(tombstoneTable(table))

  /** True when `batchId` already committed (its ledger row exists). */
  def hasBatch(spark: SparkSession, table: String, batchId: String): Boolean =
    !ledger(spark, table).where(col("batch_id") === batchId).isEmpty

  /** The segment number the next write must use: max committed + 1.
    * Single writer per index — two concurrent writers could pick the
    * same segment. */
  def nextSeg(spark: SparkSession, table: String): Long =
    ledger(spark, table).agg(max("seg")).head().getLong(0) + 1L

  /** True when `dataTable` already holds rows of `seg` — the
    * crash-resume probe (limit-1; per-append files carry a constant
    * `__seg`, so row-group stats prune the scan). */
  def segPresent(spark: SparkSession, dataTable: String, seg: Long): Boolean =
    !spark.table(dataTable).where(col(SegCol) === seg).limit(1).isEmpty

  /** Overwrite the ledger with the single base row of a fresh build. */
  def initLedger(spark: SparkSession, table: String, idCol: String,
                 nDocs: Long, totalTokens: Long): Unit = {
    import spark.implicits._
    val t = ledgerTable(table)
    Bucketing.clearOrphanLocation(spark, t)
    Seq((0L, BaseBatch, nDocs, totalTokens, idCol))
      .toDF("seg", "batch_id", "n_docs", "total_tokens", "id_col")
      .coalesce(1).write.mode("overwrite").format("parquet").saveAsTable(t)
  }

  /** Append one committed-batch row — the LAST step of every write. */
  def appendLedger(spark: SparkSession, table: String, seg: Long,
                   batchId: String, nDocs: Long, totalTokens: Long,
                   idCol: String): Unit = {
    import spark.implicits._
    Seq((seg, batchId, nDocs, totalTokens, idCol))
      .toDF("seg", "batch_id", "n_docs", "total_tokens", "id_col")
      .coalesce(1).write.mode("append").format("parquet")
      .saveAsTable(ledgerTable(table))
  }

  /** The id column the index was written with (ledger-recorded — probes
    * must not infer it positionally from the data table's layout). */
  def idColOf(spark: SparkSession, table: String): String =
    ledger(spark, table).select("id_col").head().getString(0)

  /** Per-id strongest tombstone, broadcast: (<idCol>, __below). A row
    * (id, __seg) is DEAD iff `__seg < __below`. Bounded by churn since
    * the last compaction. */
  def tombstoneMax(spark: SparkSession, table: String, idCol: String): DataFrame =
    broadcast(tombstones(spark, table)
      .groupBy(idCol).agg(max("below_seg").as("__below")))

  /** Drop dead rows of a segment-tagged frame: broadcast left join on
    * the tombstone maxima (preserves the frame's partitioning — bucketed
    * scans stay exchange-free) + a null-safe survival filter. */
  def dropDead(rows: DataFrame, tombMax: DataFrame, idCol: String): DataFrame =
    rows.join(tombMax, Seq(idCol), "left")
      .where(col(SegCol) >= coalesce(col("__below"), lit(Long.MinValue)))
      .drop("__below")

  // ---- path-based variant (for indexes that are parquet DIRECTORIES,
  // not catalog tables — e.g. the hive-partitioned IVF index). The
  // ledger lives in a SIBLING directory `<dir>_segments` (same naming as
  // the table-backed indexes' `<table>_segments`): index readers never
  // see it by construction, partition overwrites never touch it, and —
  // unlike an underscore-prefixed subdirectory — Spark's source path
  // filter does not silently drop it on read-back.

  private def pathLedgerDir(dir: String): String =
    dir.stripSuffix("/") + "_segments"

  private def pathLedgerExists(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(pathLedgerDir(dir))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p)
  }

  /** Ledger of a directory index: (seg, batch_id, n_docs). Empty frame
    * when the index has no ledger yet. */
  def pathLedger(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    if (pathLedgerExists(spark, dir)) spark.read.parquet(pathLedgerDir(dir))
    else Seq.empty[(Long, String, Long)].toDF("seg", "batch_id", "n_docs")
  }

  def pathHasBatch(spark: SparkSession, dir: String, batchId: String): Boolean =
    !pathLedger(spark, dir).where(col("batch_id") === batchId).isEmpty

  def pathNextSeg(spark: SparkSession, dir: String): Long =
    pathLedger(spark, dir).agg(coalesce(max("seg"), lit(0L))).head().getLong(0) + 1L

  def pathAppendLedger(spark: SparkSession, dir: String, seg: Long,
                       batchId: String, nDocs: Long): Unit = {
    import spark.implicits._
    Seq((seg, batchId, nDocs)).toDF("seg", "batch_id", "n_docs")
      .coalesce(1).write.mode("append").parquet(pathLedgerDir(dir))
  }

  /** Reset the ledger to the single base row of a fresh build (an index
    * overwrite must not inherit a stale ledger's batch ids). */
  def pathInitLedger(spark: SparkSession, dir: String, nDocs: Long): Unit = {
    import spark.implicits._
    Seq((0L, BaseBatch, nDocs)).toDF("seg", "batch_id", "n_docs")
      .coalesce(1).write.mode("overwrite").parquet(pathLedgerDir(dir))
  }

  /** Swap `table + "__next"` into `table`'s name (compaction commit):
    * drop the old table, rename the fresh one. The fresh table is fully
    * written first, so a crash between the two steps loses the NAME, not
    * the data — re-running the compaction recovers (it rebuilds from
    * `__next`'s source and re-swaps). */
  def swapNext(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(s"ALTER TABLE ${table}__next RENAME TO $table")
  }
}
