package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Streaming twins of the event detectors: per-delivery summaries
  * (hourly counts, value histograms, trailing events) must fold into
  * exactly the batch detectors over everything ingested — CUSUM and MAD
  * by additive merge for ANY batching, burst under the in-order
  * delivery contract; replays no-op. */
class DetectorStreamSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private lazy val events = graft.queries.Tables.events(spark, sf)
    .select(col("event_id"), col("user_id"), col("event_type"),
      expr("ts div 1000").as("ts_us"), col("value"))
    .localCheckpoint(true)

  private def cusumSet(df: org.apache.spark.sql.DataFrame) =
    df.select(col("event_type"), col("hour"), col("n"), col("cusum"), col("is_shift"))
      .as[(String, java.sql.Timestamp, Long, Long, Boolean)].collect().toSet
  private def madSet(df: org.apache.spark.sql.DataFrame) =
    df.select(col("event_type"), col("n"), col("med_cents"), col("mad_cents"), col("n_outliers"))
      .as[(String, Long, Long, Long, Long)].collect().toSet
  private def burstSet(df: org.apache.spark.sql.DataFrame) =
    df.select(col("event_id"), col("user_id"), col("n_trailing_1h"), col("is_burst"))
      .as[(Long, Long, Long, Boolean)].collect().toSet
  private def zSet(df: org.apache.spark.sql.DataFrame) =
    df.select(col("hour"), col("event_type"), col("n"), col("z"), col("is_anomaly"))
      .as[(java.sql.Timestamp, String, Long, Double, Boolean)].collect().toSet

  test("file stream: cusum / mad / burst over deliveries ≡ the batch detectors; replay no-ops") {
    val t = "detector_stream_spec"
    val in = Files.createTempDirectory("detIn").toString + "/t"
    val ckpt = Files.createTempDirectory("detCkpt").toString
    def run() = DetectorStream.start(spark, in, t, checkpoint = ckpt)
      .awaitTermination()
    // Event-time-ordered split at a strict ts boundary: in-order
    // deliveries that never straddle a user's same-timestamp peers —
    // the burst twin's equivalence contract (cusum/mad merge under any
    // split; this one exercises all three at once).
    val Seq(mn, mx) = events.agg(min("ts_us"), max("ts_us")).head()
      .toSeq.map(_.asInstanceOf[Long])
    val mid = mn + (mx - mn) / 2
    events.where(col("ts_us") <= mid).coalesce(1).write.mode("append").parquet(in)
    run()
    events.where(col("ts_us") > mid).coalesce(1).write.mode("append").parquet(in)
    run()

    assert(cusumSet(DetectorStream.readCusum(spark, t)) ==
      cusumSet(graft.SparkEntry.queries("events_cusum")(spark, sf)))
    assert(madSet(DetectorStream.readMad(spark, t)) ==
      madSet(graft.SparkEntry.queries("events_mad_anomaly")(spark, sf)))
    assert(burstSet(DetectorStream.readBurst(spark, t)) ==
      burstSet(graft.SparkEntry.queries("events_burst_detect")(spark, sf)))
    // the fourth read: z-scores from the SAME hourly sidecar must equal
    // the batch events_anomaly pass bit-for-bit (exact LONG sums into
    // one deterministic IEEE expression)
    assert(zSet(DetectorStream.readZScores(spark, t)) ==
      zSet(graft.SparkEntry.queries("events_anomaly")(spark, sf)))

    // the fifth read: Welch t from the additive DECIMAL moment sums
    // must equal the batch events_ab_test's parametric columns bit for
    // bit (the Mann-Whitney half is rank-based — batch-only by design)
    def welchSet(df: org.apache.spark.sql.DataFrame) =
      df.select(col("event_type"), col("n_a"), col("n_b"),
        col("mean_a"), col("mean_b"), col("welch_t"))
        .as[(String, Long, Long, Double, Double, Double)].collect().toSet
    assert(welchSet(DetectorStream.readWelch(spark, t)) ==
      welchSet(graft.SparkEntry.queries("events_ab_test")(spark, sf)))

    // replayed delivery (the stream's second micro-batch was b1): the
    // ledger gate must no-op — a double-count would shift every summary
    val before = madSet(DetectorStream.readMad(spark, t))
    val beforeW = welchSet(DetectorStream.readWelch(spark, t))
    DetectorStream.ingestBatch(events.where(col("ts_us") > mid), "b1", t)
    assert(madSet(DetectorStream.readMad(spark, t)) == before)
    assert(welchSet(DetectorStream.readWelch(spark, t)) == beforeW)
    assert(cusumSet(DetectorStream.readCusum(spark, t)) ==
      cusumSet(graft.SparkEntry.queries("events_cusum")(spark, sf)))

    (Seq(t + "_hourly", t + "_vhist", t + "_events", t + "_burst",
      t + "_abmom") :+
      graft.io.SegmentedIndex.ledgerTable(t))
      .foreach(x => spark.sql(s"DROP TABLE IF EXISTS $x"))
  }
}
