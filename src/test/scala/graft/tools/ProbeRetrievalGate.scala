package graft.tools

import graft.ops.Retrieval
import graft.streaming.RetrievalStream
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Scale probe for BM25-index-maintenance-on-ingest
  * ([[graft.streaming.RetrievalStream.ingestBatch]]) and the probe that
  * follows it: a FIXED-size delivery appended to an index built from a
  * 1× vs 10× corpus, then a fixed query batch probed against it. The
  * design claims: (a) per-delivery maintenance cost is bounded by the
  * delivery (tokenize + bucket-append of the batch only — the index is
  * never read); (b) probe cost tracks the PROBED TERMS' posting lists,
  * not the index size: the probed terms become a literal InSet on the
  * bucket column, so the scan bucket-FILE-prunes to the probed terms'
  * files (SelectedBucketsCount ≤ probed terms) and df recounts over the
  * surviving postings of those files only. Scratch tool; results in
  * SCALE.md.
  *
  * Usage: Test/runMain graft.tools.ProbeRetrievalGate [thousandsOfDocs]
  */
object ProbeRetrievalGate {
  def main(args: Array[String]): Unit = {
    val thousands = if (args.nonEmpty) args(0).toInt else 100
    val n = thousands * 1000L
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.warehouse.dir",
        Files.createTempDirectory("bm25wh").toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // 40-token docs over a vocabulary growing with corpus size (10n), so
    // per-term posting lists stay short and roughly constant-length at
    // both sizes — the regime where the design claim is testable (with a
    // FIXED vocabulary the 10× index has 10× postings per term, and the
    // probe cost honestly grows with the probed lists — that is the
    // documented asymptote, not a plan defect).
    val vocab = n * 10
    def mk(rows: Long, offset: Long): DataFrame =
      spark.range(rows).select((col("id") + offset).as("id"),
        concat_ws(" ", (0 until 40).map(i =>
          concat(lit("w"), pmod(col("id") * (2 * i + 1) + i, lit(vocab)).cast("string"))): _*)
          .as("text"))
    val queries = spark.range(16).select(col("id").as("qid"),
      concat_ws(" ", (0 until 4).map(i =>
        concat(lit("w"), pmod(col("id") * (2 * i + 3) + i, lit(vocab)).cast("string"))): _*)
        .as("qtext"))

    def gateSecs(idxRows: Long, tag: String): (Double, Double) = {
      val idx = s"bm25_probe_$tag"
      // More buckets than probed terms (≤ 64 distinct across the 16
      // queries), so the probe's bucket pruning has files to skip — the
      // 100 TB configuration, where buckets outnumber any query batch.
      Retrieval.writeBm25Index(mk(idxRows, 0L), "id", "text", idx, buckets = 256)
      val batch = mk(10000L, idxRows).localCheckpoint(true)
      def ingestOnce(bid: Long): Double = {
        val t0 = System.nanoTime()
        RetrievalStream.ingestBatch(batch, bid, idx, "id", "text", buckets = 256)
        (System.nanoTime() - t0) / 1e9
      }
      def probeOnce(): Double = {
        val t0 = System.nanoTime()
        Retrieval.bm25AgainstIndex(spark, idx, queries, "qid", "qtext", k = 10)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val ti = math.min(ingestOnce(0L), ingestOnce(1L))
      val tp = math.min(probeOnce(), probeOnce())
      Seq(idx, idx + "_docs", idx + "_segments", idx + "_tombstones")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      (ti, tp)
    }

    gateSecs(10000L, "warm") // warm-up
    val (i1, p1) = gateSecs(n, "x1")
    val (i10, p10) = gateSecs(n * 10, "x10")
    println(f"bm25-ingest 10k docs: vs ${n / 1000}%dk-doc index = $i1%.1fs, " +
      f"vs ${n * 10 / 1000}%dk-doc index = $i10%.1fs, ratio ${i10 / i1}%.1fx")
    println(f"bm25-probe 16 queries: vs ${n / 1000}%dk-doc index = $p1%.1fs, " +
      f"vs ${n * 10 / 1000}%dk-doc index = $p10%.1fs, ratio ${p10 / p1}%.1fx")
    spark.stop()
  }
}
