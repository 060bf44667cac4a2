package graft.tools

import graft.streaming.CurationStream
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Scale probe for the curation-on-ingest span gate
  * ([[graft.streaming.CurationStream.ingestBatch]]): a FIXED-size
  * delivery gated against a span index built from a 1× vs 10× corpus.
  * The design claim is that per-delivery cost is bounded by the
  * delivery (the index-side semi-join + bucket-layout distinct keep
  * aggregate state batch-sized; only the narrow `__gh` column scan
  * grows with the corpus), so the 10×-index ingest should cost far
  * less than 10× the 1×-index ingest. Scratch tool; results in
  * SCALE.md.
  *
  * Usage: Test/runMain graft.tools.ProbeIngestGate [thousandsOfDocs]
  */
object ProbeIngestGate {
  def main(args: Array[String]): Unit = {
    val thousands = if (args.nonEmpty) args(0).toInt else 100
    val n = thousands * 1000L
    // The delivery's ids start at 10,000,000; a larger index would collide
    // with them and the replay exclusion would discard real postings.
    require(n * 10 < 10000000L, s"index of ${n * 10} rows would overlap the delivery id space")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.warehouse.dir",
        Files.createTempDirectory("ingestwh").toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ProbeSpanDup's corpus shape (30% boilerplate = corpus-wide hot span
    // keys, the rest pseudo-random 40-token texts), with two stopwords
    // prepended so every document PASSES the Gopher gate and the probe
    // actually measures the span gate (StopwordsEn is only 14 words; the
    // bare w-token texts contain none and would all drop before any span
    // work). Offset keeps the delivery's id space disjoint from the
    // index's.
    def mk(rows: Long, offset: Long): DataFrame =
      spark.range(rows).select((col("id") + offset).as("id"),
        when(pmod(col("id"), lit(10L)) < 3L,
          lit("all of the rights reserved click here to subscribe to our newsletter today"))
          .otherwise(concat_ws(" ", lit("in") +: lit("the") +:
            (0 until 40).map(i =>
              concat(lit("w"), pmod(col("id") * (2 * i + 1) + i, lit(500L)).cast("string"))): _*))
          .as("text"))

    def ingestSecs(idxRows: Long, tag: String): Double = {
      val idx = s"ingest_probe_$tag"
      val clean = Files.createTempDirectory(s"ingestclean$tag").toString + "/t"
      CurationStream.buildSpanIndex(mk(idxRows, 0L), idx, "id", "text",
        spanN = 3, buckets = 32)
      val batch = mk(10000L, 10000000L)
      def once(bid: Long): Double = {
        val t0 = System.nanoTime()
        // minWords=5 so the 11-word boilerplate rows reach the span gate
        CurationStream.ingestBatch(batch, bid, clean, idx, "id", "text",
          maxDupRate = 0.5, spanN = 3, buckets = 32, minWords = 5)
        (System.nanoTime() - t0) / 1e9
      }
      val t = math.min(once(0L), once(1L))
      spark.sql(s"DROP TABLE IF EXISTS $idx")
      t
    }

    ingestSecs(10000L, "warm") // warm-up
    val t1 = ingestSecs(n, "x1")
    val t10 = ingestSecs(n * 10, "x10")
    println(f"ingest 10k docs: vs ${n / 1000}%dk-doc index = $t1%.1fs, " +
      f"vs ${n * 10 / 1000}%dk-doc index = $t10%.1fs, ratio ${t10 / t1}%.1fx")
    spark.stop()
  }
}
