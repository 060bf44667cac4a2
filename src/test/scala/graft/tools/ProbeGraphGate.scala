package graft.tools

import graft.ops.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale probe for incremental kNN-graph maintenance
  * ([[graft.ops.Similarity.appendToKnnGraphIndex]]): a FIXED-size
  * delivery folded into a graph built from a 1× vs 10× corpus. The
  * design claim is per-delivery cost tracks the delivery (probed
  * buckets + affected nodes' ≤ k edges), not total graph size: the
  * vector-store probe is a broadcast semi-join into the `__bkt` bucket
  * layout, and only affected nodes are read or rewritten. Scratch tool;
  * results in SCALE.md.
  *
  * Usage: Test/runMain graft.tools.ProbeGraphGate [thousandsOfVecs]
  */
object ProbeGraphGate {
  def main(args: Array[String]): Unit = {
    val thousands = if (args.nonEmpty) args(0).toInt else 50
    val n = thousands * 1000L
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graphGateWh").toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // 16-dim pseudo-random unit-ish vectors: dim (id mod 8) carries a
    // moderate spike so sign-buckets spread but every bucket stays
    // populated; noise keeps near-dup pairs rare (the probe times the
    // maintenance, not a drop storm).
    def mk(rows: Long, offset: Long): DataFrame =
      spark.range(rows).select((col("id") + offset).as("vec_id"),
        array((0 until 16).map { d =>
          (sin(col("id") * (d * 7 + 3) + d) +
            when(pmod(col("id"), lit(8)) === d, 2.0).otherwise(0.0))
            .cast("float")
        }: _*).as("embedding"))

    val batch1 = mk(5000L, 50000000L).localCheckpoint(true)
    val batch2 = mk(5000L, 60000000L).localCheckpoint(true)

    def appendSecs(idxRows: Long, tag: String): Double = {
      val table = s"graph_gate_$tag"
      Similarity.buildKnnGraphIndex(mk(idxRows, 0L), "vec_id", "embedding",
        table, buckets = 32, k = 10, bits = 8, maxBucketSize = 5000)
      def once(b: DataFrame, bid: String): Double = {
        val t0 = System.nanoTime()
        Similarity.appendToKnnGraphIndex(spark, b, "vec_id", "embedding",
          table, buckets = 32, k = 10, bits = 8, maxBucketSize = 5000, bid)
        (System.nanoTime() - t0) / 1e9
      }
      // two deliveries of FRESH ids (the index contract); the second also
      // exercises the tombstone path on nodes the first touched
      math.min(once(batch1, s"p_${tag}_a"), once(batch2, s"p_${tag}_b"))
    }

    appendSecs(10000L, "warm") // warm-up
    val t1 = appendSecs(n, "x1")
    val t10 = appendSecs(n * 10, "x10")
    println(f"graph-ingest 5k vecs: vs ${n / 1000}%dk-node graph = $t1%.1fs, " +
      f"vs ${n * 10 / 1000}%dk-node graph = $t10%.1fs, ratio ${t10 / t1}%.1fx")
    spark.stop()
  }
}
