package graft.streaming

import graft.ops.Sketches
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Corpus-profile maintenance on ingest — the streaming use of the
  * sketch merge laws ([[graft.ops.Sketches]]): each delivery appends its
  * OWN small HLL register set and CMS cell set (segment-tagged,
  * ledger-gated exactly-once), and readers fold the segments with the
  * lossless merges (per-bucket MAX, per-cell SUM). The profile a 100 TB
  * ingest pipeline actually keeps: per-delivery state is sketch-sized,
  * no corpus rescan ever, and the merged answer is IDENTICAL to a
  * single pass over everything ingested (the oracle-checked merge laws
  * `text_hll_merged` / `text_cms_merged`, applied per micro-batch).
  *
  * Tables: `<table>_hll` (groupCols..., bucket, register, __seg) and
  * `<table>_cms` (row, col, cnt, __seg), with `<table>`'s segment
  * ledger. Readers never see `__seg` — [[readDistinctProfile]] /
  * [[readTermCounts]] fold it away. Compaction is the read-side fold
  * written back (not implemented — segments are sketch-sized, ≤
  * groups·m + depth·width rows each; a year of hourly deliveries is
  * still tiny).
  */
object SketchStream {

  def start(spark: SparkSession, inputDir: String, table: String,
            groupCols: Seq[String], valueCol: String, checkpoint: String,
            m: Int = 64, depth: Int = 4, width: Int = 256,
            trigger: Trigger = Trigger.AvailableNow(),
            maxFilesPerTrigger: Int = 100): StreamingQuery =
    IngestStream.start(spark, inputDir,
      s"sketch-ingest-${math.abs(table.hashCode.toLong)}",
      checkpoint, trigger, maxFilesPerTrigger) { (batch, batchId) =>
      ingestBatch(batch, s"b$batchId", table, groupCols, valueCol, m, depth, width)
    }

  /** One delivery's sketches appended — also the batch-mode entry point.
    * Exactly-once: ledger-gated on `batchId`, crash-resumable via
    * segment probes (the [[graft.io.SegmentedIndex]] contract). */
  def ingestBatch(batch: DataFrame, batchId: String, table: String,
                  groupCols: Seq[String], valueCol: String,
                  m: Int, depth: Int, width: Int): Unit = {
    val spark = batch.sparkSession
    val SI = graft.io.SegmentedIndex
    val hllT = table + "_hll"
    val cmsT = table + "_cms"
    bootstrap(spark, table, batch, groupCols, m)
    Seq(hllT, cmsT, SI.ledgerTable(table)).foreach(spark.catalog.refreshTable)
    if (SI.hasBatch(spark, table, batchId)) return
    val seg = SI.nextSeg(spark, table)
    if (!SI.segPresent(spark, hllT, seg))
      Sketches.hllRegisters(batch, groupCols, valueCol, m)
        .withColumn(SI.SegCol, lit(seg))
        .write.mode("append").format("parquet").saveAsTable(hllT)
    if (!SI.segPresent(spark, cmsT, seg))
      Sketches.cmsBuild(batch, valueCol, depth, width)
        .withColumn(SI.SegCol, lit(seg))
        .write.mode("append").format("parquet").saveAsTable(cmsT)
    SI.appendLedger(spark, table, seg, batchId, batch.count(), 0L, valueCol)
  }

  /** Create the (empty) sketch tables + ledger on first contact. */
  private def bootstrap(spark: SparkSession, table: String, batch: DataFrame,
                        groupCols: Seq[String], m: Int): Unit = {
    val SI = graft.io.SegmentedIndex
    if (spark.catalog.tableExists(table + "_hll")) return
    graft.io.Bucketing.clearOrphanLocation(spark, table + "_hll")
    batch.select(groupCols.map(col) :+ lit(0L).as("bucket") :+
        lit(0L).as("register") :+ lit(0L).as(SI.SegCol): _*).limit(0)
      .write.mode("overwrite").format("parquet").saveAsTable(table + "_hll")
    graft.io.Bucketing.clearOrphanLocation(spark, table + "_cms")
    spark.range(0).select(lit(0L).as("row"), lit(0L).as("col"),
        lit(0L).as("cnt"), lit(0L).as(SI.SegCol)).limit(0)
      .write.mode("overwrite").format("parquet").saveAsTable(table + "_cms")
    SI.initLedger(spark, table, "__value", 0L, 0L)
  }

  /** Quantile-sketch twin of [[start]] (r9: the fourth mergeable sketch
    * family): each delivery appends its OWN bottom-k-by-hash row sample
    * (segment-tagged, ledger-gated), and [[readQuantiles]] re-takes the
    * bottom-k of the union — EXACTLY the single-pass sketch over
    * everything ingested (the `text_quantile_merged` merge law, applied
    * per micro-batch). `batch` rows carry (groupCols..., idCol,
    * valueCol); per-delivery state ≤ groups·k rows. */
  def startQuantiles(spark: SparkSession, inputDir: String, table: String,
                     groupCols: Seq[String], idCol: String, valueCol: String,
                     checkpoint: String, k: Int = 256,
                     trigger: Trigger = Trigger.AvailableNow(),
                     maxFilesPerTrigger: Int = 100): StreamingQuery =
    IngestStream.start(spark, inputDir,
      s"qsketch-ingest-${math.abs(table.hashCode.toLong)}",
      checkpoint, trigger, maxFilesPerTrigger) { (batch, batchId) =>
      ingestQuantileBatch(batch, s"b$batchId", table, groupCols, idCol,
        valueCol, k)
    }

  /** One delivery's quantile sample appended — also the batch-mode
    * entry point. Same exactly-once contract as [[ingestBatch]], but
    * ledgered under the `<table>_qsk` namespace: the hll/cms gate
    * ([[ingestBatch]]) owns `<table>`'s ledger, and sharing it would
    * let a quantile bootstrap WIPE the sketch ledger (initLedger
    * overwrites) and the two families' batch ids mask each other. */
  def ingestQuantileBatch(batch: DataFrame, batchId: String, table: String,
                          groupCols: Seq[String], idCol: String,
                          valueCol: String, k: Int): Unit = {
    val spark = batch.sparkSession
    val SI = graft.io.SegmentedIndex
    val qT = table + "_qsk"
    if (!spark.catalog.tableExists(qT)) {
      graft.io.Bucketing.clearOrphanLocation(spark, qT)
      batch.select(groupCols.map(col) :+ lit(0L).as("h") :+
          col(valueCol).as("v") :+ lit(0L).as(SI.SegCol): _*).limit(0)
        .write.mode("overwrite").format("parquet").saveAsTable(qT)
      SI.initLedger(spark, qT, idCol, 0L, 0L)
    }
    Seq(qT, SI.ledgerTable(qT)).foreach(spark.catalog.refreshTable)
    if (SI.hasBatch(spark, qT, batchId)) return
    val seg = SI.nextSeg(spark, qT)
    if (!SI.segPresent(spark, qT, seg))
      Sketches.quantileSketch(batch, groupCols, idCol, valueCol, k)
        .withColumn(SI.SegCol, lit(seg))
        .write.mode("append").format("parquet").saveAsTable(qT)
    SI.appendLedger(spark, qT, seg, batchId, batch.count(), 0L, idCol)
  }

  /** Top-k gate twin of [[startQuantiles]] (r9: the fifth mergeable
    * profile family — a bounded top-k under a total order is a monoid,
    * `topk(A ∪ B) = topk(topk(A) ∪ topk(B))`, so each delivery appends
    * only its OWN groups·k winners and the read-side fold over
    * segments·k rows is EXACTLY the single-pass answer). The "current
    * top offenders / biggest documents / highest scores so far"
    * leaderboard an ingest pipeline keeps without rescans. Append-only
    * by NATURE, not implementation: a bounded top-k cannot serve
    * deletes (an evicted row is unrecoverable) — route delete-bearing
    * feeds through the full index families instead. `keyCols` carry
    * (column, ascending); include a unique tie-break column. */
  def startTopK(spark: SparkSession, inputDir: String, table: String,
                groupCols: Seq[String], keyCols: Seq[(String, Boolean)],
                checkpoint: String, k: Int = 10,
                trigger: Trigger = Trigger.AvailableNow(),
                maxFilesPerTrigger: Int = 100): StreamingQuery =
    IngestStream.start(spark, inputDir,
      s"topk-ingest-${math.abs(table.hashCode.toLong)}",
      checkpoint, trigger, maxFilesPerTrigger) { (batch, batchId) =>
      ingestTopKBatch(batch, s"b$batchId", table, groupCols, keyCols, k)
    }

  /** One delivery's per-group winners appended — also the batch-mode
    * entry point. Same exactly-once contract as [[ingestBatch]], but
    * ledgered under the `<table>_tpk` namespace (each gate family owns
    * its OWN ledger — a shared one gets wiped by the other family's
    * bootstrap and batch ids mask across families). */
  def ingestTopKBatch(batch: DataFrame, batchId: String, table: String,
                      groupCols: Seq[String], keyCols: Seq[(String, Boolean)],
                      k: Int): Unit = {
    val spark = batch.sparkSession
    val SI = graft.io.SegmentedIndex
    val tT = table + "_tpk"
    if (!spark.catalog.tableExists(tT)) {
      graft.io.Bucketing.clearOrphanLocation(spark, tT)
      batch.select((groupCols ++ keyCols.map(_._1)).map(col) :+
          lit(0L).as(SI.SegCol): _*).limit(0)
        .write.mode("overwrite").format("parquet").saveAsTable(tT)
      SI.initLedger(spark, tT, keyCols.head._1, 0L, 0L)
    }
    Seq(tT, SI.ledgerTable(tT)).foreach(spark.catalog.refreshTable)
    if (SI.hasBatch(spark, tT, batchId)) return
    val seg = SI.nextSeg(spark, tT)
    if (!SI.segPresent(spark, tT, seg))
      topKRows(batch, groupCols, keyCols, k)
        .withColumn(SI.SegCol, lit(seg))
        .write.mode("append").format("parquet").saveAsTable(tT)
    SI.appendLedger(spark, tT, seg, batchId, batch.count(), 0L, keyCols.head._1)
  }

  /** The current per-group top-k over everything ingested ≡ a single
    * pass over the union (the monoid fold re-runs the SAME bounded
    * aggregate over segments·k state rows). Output: (groupCols...,
    * rank, keyCols...). */
  def readTopK(spark: SparkSession, table: String, groupCols: Seq[String],
               keyCols: Seq[(String, Boolean)], k: Int): DataFrame = {
    spark.catalog.refreshTable(table + "_tpk")
    rankedTopK(spark.table(table + "_tpk")
      .drop(graft.io.SegmentedIndex.SegCol), groupCols, keyCols, k)
  }

  /** Per-group winners of one frame as plain rows (no rank). */
  private def topKRows(df: DataFrame, groupCols: Seq[String],
                       keyCols: Seq[(String, Boolean)], k: Int): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(graft.expressions.TopKAgg.topK(
        struct(keyCols.map(c => col(c._1)): _*), k, keyCols.map(_._2))
        .as("__top"))
      .select(groupCols.map(col) :+ explode(col("__top")).as("__s"): _*)
      .select(groupCols.map(col) ++
        keyCols.map(c => col("__s." + c._1).as(c._1)): _*)

  /** [[topKRows]] with the rank surfaced (read-side presentation). */
  private def rankedTopK(df: DataFrame, groupCols: Seq[String],
                         keyCols: Seq[(String, Boolean)], k: Int): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(graft.expressions.TopKAgg.topK(
        struct(keyCols.map(c => col(c._1)): _*), k, keyCols.map(_._2))
        .as("__top"))
      .select(groupCols.map(col) :+
        posexplode(col("__top")).as(Seq("__i", "__s")): _*)
      .select(groupCols.map(col) ++
        Seq((col("__i") + 1).cast("long").as("rank")) ++
        keyCols.map(c => col("__s." + c._1).as(c._1)): _*)

  /** Discrete quantile estimates over everything ingested ≡ a single
    * [[Sketches.quantiles]] pass (bottom-k-of-union merge is exact).
    * The fold reads segments·k-bounded sketch rows only. */
  def readQuantiles(spark: SparkSession, table: String,
                    groupCols: Seq[String], probs: Seq[(Int, Int)],
                    k: Int = 256): DataFrame = {
    spark.catalog.refreshTable(table + "_qsk")
    Sketches.quantileEstimate(
      Sketches.quantileMerge(
        Seq(spark.table(table + "_qsk").drop(graft.io.SegmentedIndex.SegCol)),
        groupCols, k),
      groupCols, probs)
  }

  /** The merged distinct-count profile over everything ingested —
    * identical to a single [[Sketches.hllDistinct]] pass (MAX-merge is
    * lossless). Register fold is segment-count-bounded per (group,
    * bucket); the estimate reads sketch-sized data only. */
  def readDistinctProfile(spark: SparkSession, table: String,
                          groupCols: Seq[String], m: Int = 64): DataFrame = {
    spark.catalog.refreshTable(table + "_hll")
    Sketches.hllEstimate(
      spark.table(table + "_hll")
        .groupBy((groupCols :+ "bucket").map(col): _*)
        .agg(max("register").as("register")),
      groupCols, m)
  }

  /** Trailing-window distinct estimates over everything ingested: the
    * per-frame registers fold across segments (MAX, lossless), then the
    * sliding merge + raw estimate run sketch-sized — the streaming
    * surface of [[Sketches.hllSlidingEstimate]] (`events_hll_sliding`'s
    * batch shape). `frameCol` must be the ingest grouping column (an
    * integral frame index, e.g. epoch-hour); the window is closed on
    * both ends. A 100 TB event stream keeps hours·64 register rows and
    * answers ANY trailing window without rescanning deliveries. */
  def readSlidingDistinct(spark: SparkSession, table: String, frameCol: String,
                          trailing: Long, m: Int = 64): DataFrame = {
    spark.catalog.refreshTable(table + "_hll")
    Sketches.hllSlidingEstimate(
      spark.table(table + "_hll")
        .groupBy(col(frameCol), col("bucket"))
        .agg(max("register").as("register")),
      frameCol, trailing, m)
  }

  /** Merged watchlist frequency estimates over everything ingested —
    * identical to a single-pass CMS (SUM-merge is exact). */
  def readTermCounts(spark: SparkSession, table: String, items: DataFrame,
                     itemCol: String, depth: Int = 4,
                     width: Int = 256): DataFrame = {
    spark.catalog.refreshTable(table + "_cms")
    Sketches.cmsEstimate(
      spark.table(table + "_cms").groupBy("row", "col").agg(sum("cnt").as("cnt")),
      items, itemCol, depth, width)
  }
}
