package graft.tools

import graft.streaming.DetectorStream
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale probe for the detector-stream ingest gate
  * ([[graft.streaming.DetectorStream.ingestBatch]]): a FIXED-size
  * delivery folded into a detector state seeded with a 1× vs 10× event
  * history. CUSUM/MAD summaries are delivery-sized appends by
  * construction; the at-risk path is the burst count's join against
  * the events-so-far table — without the literal trailing-window ts
  * bound it reads the whole history per delivery (O(index)); with it,
  * parquet row-group stats prune the old append files and per-delivery
  * cost stays ~flat. This probe measures that. Scratch tool; results
  * in SCALE.md.
  *
  * Usage: Test/runMain graft.tools.ProbeDetectorGate [thousandsOfEvents]
  */
object ProbeDetectorGate {
  def main(args: Array[String]): Unit = {
    val thousands = if (args.nonEmpty) args(0).toInt else 200
    val n = thousands * 1000L
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("detGateWh").toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Events spread over `rows` seconds (1/s), 1000 users, a value and
    // a type: the history a long-running detector table accumulates.
    def mk(rows: Long, idOffset: Long, tsOffsetUs: Long): DataFrame =
      spark.range(rows).select(
        (col("id") + idOffset).as("event_id"),
        pmod(col("id") * 2654435761L, lit(1000L)).as("user_id"),
        concat(lit("t"), pmod(col("id"), lit(5L))).as("event_type"),
        (col("id") * 1000000L + tsOffsetUs).as("ts_us"),
        (pmod(col("id") * 7L, lit(1000L)) / lit(10.0)).as("value"))

    def ingestSecs(histRows: Long, tag: String): Double = {
      val table = s"det_gate_$tag"
      // Seed the history in 8 chronological deliveries — the append
      // files then carry tight ts ranges, exactly like a stream that
      // has been running (one monolithic seed file would give the
      // pruning an unrealistically easy single file to skip).
      val chunk = histRows / 8
      (0L until 8L).foreach { i =>
        DetectorStream.ingestBatch(
          mk(chunk, i * chunk, i * chunk * 1000000L).localCheckpoint(true),
          s"seed$i", table)
      }
      // A fixed 5k-event delivery at the head of the timeline.
      val head = histRows * 1000000L
      def once(off: Long, bid: String): Double = {
        val b = mk(5000L, 900000000L + off, head + off * 1000000L)
          .localCheckpoint(true)
        val t0 = System.nanoTime()
        DetectorStream.ingestBatch(b, bid, table)
        (System.nanoTime() - t0) / 1e9
      }
      math.min(once(0L, s"p_${tag}_a"), once(5000L, s"p_${tag}_b"))
    }

    ingestSecs(20000L, "warm") // warm-up
    val t1 = ingestSecs(n, "x1")
    val t10 = ingestSecs(n * 10, "x10")
    println(f"detector-ingest 5k events vs ${n / 1000}%dk-event history: $t1%.1fs; " +
      f"vs ${n * 10 / 1000}%dk: $t10%.1fs (${t10 / t1}%.2fx — " +
      f"flat ⇒ the trailing-window ts bound prunes the history scan)")
    spark.stop()
  }
}
