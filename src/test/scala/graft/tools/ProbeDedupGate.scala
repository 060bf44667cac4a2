package graft.tools

import graft.ops.Dedup
import graft.streaming.DedupStream
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Scale probe for dedup-on-ingest
  * ([[graft.streaming.DedupStream.ingestBatch]]): a FIXED-size delivery
  * deduplicated against an LSH index built from a 1× vs 10× corpus. The
  * design claim is that per-delivery cost is bounded by the delivery —
  * the batch's band keys semi-join the index before the heavy-bucket
  * window, so the per-batch window sorts only the probed buckets, not
  * the whole accumulated index. Scratch tool; results in SCALE.md.
  *
  * Usage: Test/runMain graft.tools.ProbeDedupGate [thousandsOfDocs]
  */
object ProbeDedupGate {
  def main(args: Array[String]): Unit = {
    val thousands = if (args.nonEmpty) args(0).toInt else 100
    val n = thousands * 1000L
    // The delivery's ids start at 10,000,000; a larger index would collide
    // with them and the self-match filter would discard real postings.
    require(n * 10 < 10000000L, s"index of ${n * 10} rows would overlap the delivery id space")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.warehouse.dir",
        Files.createTempDirectory("dedupwh").toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Pseudo-random 40-token texts over a vocabulary that GROWS with the
    // probe size (10n words), so documents are globally distinct at both
    // index sizes and LSH buckets stay far below maxBucketSize — a small
    // fixed vocabulary would repeat whole documents with its period,
    // pushing every 10x bucket over the cap and silently turning the
    // larger run into cap-eliminated no-op work. Offset keeps id spaces
    // disjoint (required above).
    val vocab = lit(n * 10)
    def mk(rows: Long, offset: Long): DataFrame =
      spark.range(rows).select((col("id") + offset).as("id"),
        concat_ws(" ", (0 until 40).map(i =>
          concat(lit("w"), pmod(col("id") * (2 * i + 1) + i, vocab).cast("string"))): _*)
          .as("text"))

    def ingestSecs(idxRows: Long, tag: String): Double = {
      val idx = s"dedup_probe_$tag"
      val clean = Files.createTempDirectory(s"dedupclean$tag").toString + "/t"
      Dedup.writeLshIndex(mk(idxRows, 0L), "id", "text", idx, buckets = 32)
      val batch = mk(10000L, 10000000L)
      def once(bid: Long): Double = {
        val t0 = System.nanoTime()
        DedupStream.ingestBatch(batch, bid, clean, idx, "id", "text",
          threshold = 0.8, buckets = 32, shingleWords = 3, k = 16,
          bands = 4, maxBucketSize = 1000)
        (System.nanoTime() - t0) / 1e9
      }
      val t = math.min(once(0L), once(1L))
      spark.sql(s"DROP TABLE IF EXISTS $idx")
      t
    }

    ingestSecs(10000L, "warm") // warm-up
    val t1 = ingestSecs(n, "x1")
    val t10 = ingestSecs(n * 10, "x10")
    println(f"dedup-ingest 10k docs: vs ${n / 1000}%dk-doc index = $t1%.1fs, " +
      f"vs ${n * 10 / 1000}%dk-doc index = $t10%.1fs, ratio ${t10 / t1}%.1fx")
    spark.stop()
  }
}
