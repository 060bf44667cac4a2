package graft.streaming

import graft.ops.Detectors
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming twins of the event-series detectors (`events_cusum`,
  * `events_mad_anomaly`, `events_burst_detect`) — the [[SketchStream]]
  * pattern applied to detector state: each delivery appends its OWN
  * small summary (segment-tagged, ledger-gated exactly-once), readers
  * fold the segments and run the SHARED finisher
  * ([[graft.ops.Detectors]]), so the streamed answer is IDENTICAL to
  * the batch pass over everything ingested:
  *
  *  - CUSUM: per-delivery (event_type, hour, n) counts. Counts are
  *    additive → SUM-merge of segments ≡ single-pass hourly table, for
  *    ANY delivery order or batching. State per delivery: hours × types.
  *  - MAD: per-delivery (event_type, cents, cnt) value histograms —
  *    also additive, bounded by the cents domain (value range × 100),
  *    never corpus size. Any delivery order.
  *  - Burst: per-event trailing-1h counts need the raw trailing events,
  *    so deliveries append segment-tagged events and each batch's
  *    counts join the batch against the events-so-far table (per-append
  *    files carry tight ts ranges, so parquet row-group stats prune the
  *    history scan to the trailing window). Equivalence needs
  *    EVENT-TIME-ORDERED deliveries that do not split a user's
  *    same-timestamp peers across batches (a later batch cannot
  *    retro-raise an already-emitted count); under that contract the
  *    emitted counts equal the batch RANGE-frame pass row for row.
  *
  * Tables: `<table>_hourly` (event_type, hour, n, __seg), `<table>_vhist`
  * (event_type, cents, cnt, __seg), `<table>_events` (event_id, user_id,
  * ts_us, __seg), `<table>_burst` (event_id, user_id, n_trailing_1h,
  * is_burst, __seg), plus `<table>`'s segment ledger. Crash-resume and
  * replay no-ops follow the [[graft.io.SegmentedIndex]] contract
  * (ledger row last; per-table segment probes skip committed parts). */
object DetectorStream {

  private val SI = graft.io.SegmentedIndex

  def start(spark: SparkSession, inputDir: String, table: String,
            checkpoint: String, trigger: Trigger = Trigger.AvailableNow(),
            maxFilesPerTrigger: Int = 100): StreamingQuery =
    IngestStream.start(spark, inputDir,
      s"detector-ingest-${math.abs(table.hashCode.toLong)}",
      checkpoint, trigger, maxFilesPerTrigger) { (batch, batchId) =>
      ingestBatch(batch, s"b$batchId", table)
    }

  /** One delivery's detector state appended — also the batch-mode entry
    * point. `batch` must carry (event_id, user_id, event_type, ts_us,
    * value). Exactly-once: ledger-gated on `batchId`, crash-resumable
    * via per-table segment probes. */
  def ingestBatch(batch: DataFrame, batchId: String, table: String): Unit = {
    val spark = batch.sparkSession
    val hourlyT = table + "_hourly"
    val vhistT = table + "_vhist"
    val eventsT = table + "_events"
    val burstT = table + "_burst"
    bootstrap(spark, table)
    Seq(hourlyT, vhistT, eventsT, burstT, table + "_abmom",
        SI.ledgerTable(table))
      .foreach(spark.catalog.refreshTable)
    if (SI.hasBatch(spark, table, batchId)) return
    val seg = SI.nextSeg(spark, table)
    // IngestStream skips empty micro-batches, but direct batch-mode
    // callers may not: ledger an empty batch as applied with ONE job
    // instead of paying four empty-segment writes (and the burst min
    // agg would NPE on the NULL min).
    if (batch.isEmpty) {
      SI.appendLedger(spark, table, seg, batchId, 0L, 0L, "event_id")
      return
    }
    // The four segment writes below are INDEPENDENT consumers of the
    // same batch (only burst depends on the events append): materialize
    // the batch ONCE (each write would otherwise re-run the source
    // scan), and submit the independent writes from a small thread pool
    // so each write's task tail back-fills executor slots instead of
    // serializing four sub-second jobs — the overlap-independent-jobs
    // shape Controller.runOnce already uses for table fan-out. Crash
    // semantics unchanged: every write stays individually seg-probed,
    // and the ledger row still lands strictly LAST (after all writes).
    val b = batch.localCheckpoint(true)
    try {
      val writes: Seq[() => Unit] = Seq(
        () => if (!SI.segPresent(spark, hourlyT, seg))
          b.groupBy(date_trunc("hour", timestamp_micros(col("ts_us"))).as("hour"),
              col("event_type"))
            .agg(count(lit(1)).as("n"))
            .withColumn(SI.SegCol, lit(seg))
            .write.mode("append").format("parquet").saveAsTable(hourlyT),
        () => if (!SI.segPresent(spark, vhistT, seg))
          b.groupBy(col("event_type"),
              floor(col("value") * lit(100.0) + lit(0.5)).cast("long").as("cents"))
            .agg(count(lit(1)).as("cnt"))
            .withColumn(SI.SegCol, lit(seg))
            .write.mode("append").format("parquet").saveAsTable(vhistT),
        // Welch moments per (type, parity cohort): exact DECIMAL sums are
        // additive, so segment folds ≡ one batch pass for any delivery
        // order — the streaming half of events_ab_test (the Mann-Whitney
        // half is rank-based and inherently needs the corpus; batch-only,
        // documented).
        () => if (!SI.segPresent(spark, table + "_abmom", seg)) {
          val vd = col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2))
          b.groupBy(col("event_type"), (col("user_id") % 2 === 0).as("cohort_a"))
            .agg(count(lit(1)).as("n"), sum(vd).as("sx"), sum(vd * vd).as("sxx"))
            .withColumn(SI.SegCol, lit(seg))
            .write.mode("append").format("parquet").saveAsTable(table + "_abmom")
        },
        // Events append BEFORE the burst counts so the count join reads the
        // batch's own rows from the table (same-ts peers and in-batch
        // predecessors count, matching the batch RANGE frame). A crash in
        // between resumes past the committed append (segment probe) and
        // recomputes identical counts.
        () => if (!SI.segPresent(spark, eventsT, seg))
          b.select(col("event_id"), col("user_id"), col("ts_us"))
            .withColumn(SI.SegCol, lit(seg))
            .write.mode("append").format("parquet").saveAsTable(eventsT))
      graft.io.Overlap.awaitAll(writes)
      spark.catalog.refreshTable(eventsT)
      if (!SI.segPresent(spark, burstT, seg)) {
        // The column-to-column BETWEEN residual cannot push to the scan —
        // without a LITERAL ts bound every delivery would re-read the
        // WHOLE history (O(index) per batch). One bounded driver agg on
        // the batch gives the bound; per-append files carry tight ts
        // ranges, so parquet row-group stats prune the history scan to
        // ~the trailing window and per-delivery cost stays O(batch +
        // window) (ProbeDetectorGate).
        val lo = b.agg(min("ts_us")).head().getLong(0) - 3600000000L
        val hist = spark.table(eventsT)
          .where(col("ts_us") >= lo)
          .select(col("user_id"), col("ts_us").as("__ts2"))
        b.select(col("event_id"), col("user_id"), col("ts_us"))
          .join(hist, Seq("user_id"))
          .where(col("__ts2").between(col("ts_us") - lit(3600000000L), col("ts_us")))
          .groupBy("event_id", "user_id")
          .agg(count(lit(1)).as("n_trailing_1h"))
          .withColumn("is_burst", col("n_trailing_1h") >= lit(5L))
          .withColumn(SI.SegCol, lit(seg))
          .write.mode("append").format("parquet").saveAsTable(burstT)
      }
      SI.appendLedger(spark, table, seg, batchId, b.count(), 0L, "event_id")
    } finally b.unpersist(blocking = false)
  }


  private def bootstrap(spark: SparkSession, table: String): Unit = {
    if (spark.catalog.tableExists(table + "_hourly")) return
    def init(name: String, empty: DataFrame): Unit = {
      graft.io.Bucketing.clearOrphanLocation(spark, name)
      empty.limit(0).write.mode("overwrite").format("parquet").saveAsTable(name)
    }
    init(table + "_hourly", spark.range(0).select(
      lit(java.sql.Timestamp.valueOf("1970-01-01 00:00:00")).as("hour"),
      lit("").as("event_type"), lit(0L).as("n"), lit(0L).as(SI.SegCol)))
    init(table + "_vhist", spark.range(0).select(lit("").as("event_type"),
      lit(0L).as("cents"), lit(0L).as("cnt"), lit(0L).as(SI.SegCol)))
    // moment sums keep the exact types the per-batch agg produces:
    // sum(decimal(18,2)) → (28,2), sum((18,2)·(18,2)) → (38,4)
    init(table + "_abmom", spark.range(0).select(lit("").as("event_type"),
      lit(false).as("cohort_a"), lit(0L).as("n"),
      lit(0).cast("decimal(28,2)").as("sx"),
      lit(0).cast("decimal(38,4)").as("sxx"), lit(0L).as(SI.SegCol)))
    init(table + "_events", spark.range(0).select(lit(0L).as("event_id"),
      lit(0L).as("user_id"), lit(0L).as("ts_us"), lit(0L).as(SI.SegCol)))
    init(table + "_burst", spark.range(0).select(lit(0L).as("event_id"),
      lit(0L).as("user_id"), lit(0L).as("n_trailing_1h"),
      lit(false).as("is_burst"), lit(0L).as(SI.SegCol)))
    SI.initLedger(spark, table, "event_id", 0L, 0L)
  }

  /** CUSUM over everything ingested ≡ the single-pass batch detector
    * (hourly counts SUM-merge exactly). */
  def readCusum(spark: SparkSession, table: String): DataFrame = {
    spark.catalog.refreshTable(table + "_hourly")
    Detectors.cusumOverHourly(
      spark.table(table + "_hourly")
        .groupBy("event_type", "hour").agg(sum("n").as("n")))
  }

  /** Median/MAD outlier profile over everything ingested ≡ the batch
    * detector (value histograms SUM-merge exactly). */
  def readMad(spark: SparkSession, table: String): DataFrame = {
    spark.catalog.refreshTable(table + "_vhist")
    Detectors.madOverHist(
      spark.table(table + "_vhist")
        .groupBy("event_type", "cents").agg(sum("cnt").as("cnt")))
  }

  /** Hourly z-score anomaly screen over everything ingested ≡ the batch
    * `events_anomaly` pass: hourly counts SUM-merge exactly for any
    * delivery order/batching, and [[graft.ops.Profile.zScores]] is a
    * deterministic function of the folded series (exact LONG sums into
    * one IEEE expression). The fourth detector read — unlike CUSUM/MAD
    * it needed no new sidecar, the `_hourly` table already carries the
    * sufficient statistic. */
  def readZScores(spark: SparkSession, table: String,
                  threshold: Double = 2.0): DataFrame = {
    spark.catalog.refreshTable(table + "_hourly")
    graft.ops.Profile.zScores(
      spark.table(table + "_hourly")
        .groupBy("event_type", "hour").agg(sum("n").as("n")),
      Seq("event_type"), "n", threshold)
      .select("hour", "event_type", "n", "z", "is_anomaly")
  }

  /** Per-event trailing-1h counts emitted so far (segment column folded
    * away). Under in-order delivery ≡ the batch RANGE-frame pass. */
  def readBurst(spark: SparkSession, table: String): DataFrame = {
    spark.catalog.refreshTable(table + "_burst")
    spark.table(table + "_burst")
      .select("event_id", "user_id", "n_trailing_1h", "is_burst")
  }

  /** Welch t over everything ingested ≡ the batch
    * [[graft.ops.Experiment.abTest]]'s parametric columns: the segment
    * moment sums are exact DECIMALs (additive — any delivery order),
    * and the finisher is the SAME shared expression tree
    * ([[graft.ops.Experiment.welchCol]]). Output: (event_type, n_a,
    * n_b, mean_a, mean_b, welch_t). */
  def readWelch(spark: SparkSession, table: String): DataFrame = {
    spark.catalog.refreshTable(table + "_abmom")
    def side(a: Boolean, c: org.apache.spark.sql.Column) =
      sum(when(col("cohort_a") === a, c))
    val folded = spark.table(table + "_abmom")
      .groupBy("event_type")
      .agg(
        coalesce(side(true, col("n")), lit(0L)).as("n_a"),
        coalesce(side(false, col("n")), lit(0L)).as("n_b"),
        side(true, col("sx")).as("__sxa"),
        side(false, col("sx")).as("__sxb"),
        side(true, col("sxx")).as("__sxxa"),
        side(false, col("sxx")).as("__sxxb"))
    folded.select(col("event_type"), col("n_a"), col("n_b"),
      graft.ops.Experiment.meanCol("__sxa", "n_a").as("mean_a"),
      graft.ops.Experiment.meanCol("__sxb", "n_b").as("mean_b"),
      graft.ops.Experiment.welchCol().as("welch_t"))
  }
}
