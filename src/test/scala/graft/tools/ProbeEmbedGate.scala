package graft.tools

import graft.streaming.EmbedDedupStream
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Scale probe for embedding dedup-on-ingest
  * ([[graft.streaming.EmbedDedupStream.ingestBatch]]): a FIXED-size
  * delivery checked against a cluster-partitioned index built from a 1×
  * vs 10× corpus. The design claim is that per-delivery cost tracks the
  * PROBED partitions, not total index size: the delivery's clusters
  * prune the index scan statically, and the broadcast probe join never
  * shuffles the index — so a 10× corpus whose extra mass spreads over
  * all clusters costs ~cluster-fraction more, not 10×. Scratch tool;
  * results in SCALE.md.
  *
  * Usage: Test/runMain graft.tools.ProbeEmbedGate [thousandsOfVecs]
  */
object ProbeEmbedGate {
  def main(args: Array[String]): Unit = {
    val thousands = if (args.nonEmpty) args(0).toInt else 100
    val n = thousands * 1000L
    require(n * 10 < 10000000L, s"index of ${n * 10} rows would overlap the delivery id space")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // 32-dim pseudo-random vectors spread over 32 clusters: dim (id mod
    // 32) carries a dominant spike (every id maps to exactly one
    // cluster's direction, so the index populates ALL k partitions and
    // every delivery touches every cluster — zero pruning headroom, the
    // gate's worst case), the other dims deterministic noise so near-dup
    // hits stay rare (the probe times the gate, not drops).
    val k = 32
    def mk(rows: Long, offset: Long): DataFrame =
      spark.range(rows).select((col("id") + offset).as("vec_id"),
        array((0 until k).map { d =>
          (sin(col("id") * (d * 7 + 3) + d) +
            when(pmod(col("id"), lit(k)) === d, 4.0).otherwise(0.0))
            .cast("float")
        }: _*).as("embedding"))
    // centroids: one-hot on dim cid — k distinct directions
    val cents = spark.range(k).select(col("id").as("cid"),
      array((0 until k).map(d =>
        when(col("id") === d, 4.0).otherwise(0.0).cast("float")): _*)
        .as("embedding")).localCheckpoint(true)

    def ingestSecs(idxRows: Long, tag: String, batch: DataFrame): Double = {
      val idxDir = Files.createTempDirectory(s"embIdx$tag").toString + "/t"
      val clean = Files.createTempDirectory(s"embClean$tag").toString + "/t"
      EmbedDedupStream.buildIndex(mk(idxRows, 0L), cents, "vec_id",
        "embedding", "cid", idxDir)
      def once(bid: Long): Double = {
        val t0 = System.nanoTime()
        EmbedDedupStream.ingestBatch(batch, bid, clean, idxDir, cents,
          "vec_id", "embedding", "cid", threshold = 0.95,
          maxClusterSize = 1000000, heavyBits = 6, heavyMaxBucketSize = 1000)
        (System.nanoTime() - t0) / 1e9
      }
      math.min(once(0L), once(1L))
    }

    // Spread delivery: 10k vectors touching ALL k clusters (no pruning
    // headroom — the probe must scan the whole index).
    val spread = mk(10000L, 10000000L).localCheckpoint(true)
    // Confined delivery: ~10k vectors in 4 of k clusters — the pruning
    // case (the probe opens only 4 `cluster=` partitions).
    val confined = mk(80000L, 20000000L)
      .where(pmod(col("vec_id"), lit(k)) < 4).localCheckpoint(true)

    ingestSecs(10000L, "warm", spread) // warm-up
    val t1 = ingestSecs(n, "x1", spread)
    val t10 = ingestSecs(n * 10, "x10", spread)
    val c10 = ingestSecs(n * 10, "x10c", confined)
    println(f"embed-ingest 10k vecs (all-cluster spread): vs ${n / 1000}%dk-vec " +
      f"index = $t1%.1fs, vs ${n * 10 / 1000}%dk-vec index = $t10%.1fs, " +
      f"ratio ${t10 / t1}%.1fx")
    println(f"embed-ingest ~10k vecs confined to 4/$k clusters vs " +
      f"${n * 10 / 1000}%dk-vec index = $c10%.1fs (pruned scan)")
    spark.stop()
  }
}
