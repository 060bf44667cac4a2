package graft.tools

import graft.ops.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale probe for incremental kNN-graph maintenance
  * ([[graft.ops.Similarity.appendToKnnGraphIndex]]): a FIXED-size
  * delivery folded into graphs whose vector stores hold a 1× vs 10×
  * corpus. Per-delivery cost is probed-bucket mass — delivery ×
  * (bits+1) × avg bucket size — so with FIXED bits a 10× corpus costs
  * ~10× (every bucket is 10× denser: the honest asymptote), and the
  * 100 TB playbook is the same as IVF's k_clusters: scale `bits` with
  * log(corpus) to hold bucket density, after which the same delivery
  * costs ~flat (recall per probe is the documented LSH trade). The
  * probe reports BOTH numbers. Bootstrap seeds the vector store
  * directly (empty edge base) — the one-time corpus-wide build is not
  * what this measures. Scratch tool; results in SCALE.md.
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

    // 16-dim pseudo-random vectors: dim (id mod 8) carries a moderate
    // spike so sign-buckets spread but stay populated; noise keeps
    // near-dup pairs rare (the probe times maintenance, not drops).
    def mk(rows: Long, offset: Long): DataFrame =
      spark.range(rows).select((col("id") + offset).as("vec_id"),
        array((0 until 16).map { d =>
          (sin(col("id") * (d * 7 + 3) + d) +
            when(pmod(col("id"), lit(8)) === d, 2.0).otherwise(0.0))
            .cast("float")
        }: _*).as("embedding"))

    val batch1 = mk(5000L, 50000000L).localCheckpoint(true)
    val batch2 = mk(5000L, 60000000L).localCheckpoint(true)

    // Seed the vector store directly (empty edge base): append cost then
    // reflects exactly what a delivery probes and re-ranks.
    def bootstrap(corpus: DataFrame, table: String, bits: Int): Unit = {
      val SI = graft.io.SegmentedIndex
      Similarity.buildKnnGraphIndex(corpus.limit(0), "vec_id", "embedding",
        table, buckets = 32, k = 10, bits = bits, maxBucketSize = 5000)
      graft.io.Bucketing.appendBucketed(
        corpus.select(col("vec_id"), col("embedding"),
            graft.functions.VectorFunctions.signBucket(col("embedding"), bits).as("__bkt"))
          .withColumn(SI.SegCol, lit(1L)),
        table + "_vecs", "__bkt", 32)
      SI.appendLedger(spark, table, 1L, "seed", corpus.count(), 0L, "src")
    }

    def appendSecs(idxRows: Long, bits: Int, tag: String): Double = {
      val table = s"graph_gate_$tag"
      bootstrap(mk(idxRows, 0L), table, bits)
      def once(b: DataFrame, bid: String): Double = {
        val t0 = System.nanoTime()
        Similarity.appendToKnnGraphIndex(spark, b, "vec_id", "embedding",
          table, buckets = 32, k = 10, bits = bits, maxBucketSize = 5000, bid)
        (System.nanoTime() - t0) / 1e9
      }
      // two deliveries of FRESH ids (the index contract); the second also
      // exercises the tombstone path on nodes the first touched
      math.min(once(batch1, s"p_${tag}_a"), once(batch2, s"p_${tag}_b"))
    }

    appendSecs(10000L, 9, "warm") // warm-up
    val t1 = appendSecs(n, 9, "x1")
    val t10fixed = appendSecs(n * 10, 9, "x10f")
    val t10dense = appendSecs(n * 10, 12, "x10d")
    println(f"graph-ingest 5k vecs vs ${n / 1000}%dk-node store (bits=9): $t1%.1fs; " +
      f"vs ${n * 10 / 1000}%dk @ SAME bits: $t10fixed%.1fs (${t10fixed / t1}%.1fx — " +
      f"bucket density grew 10x, the honest fixed-bits asymptote); " +
      f"vs ${n * 10 / 1000}%dk @ bits=12 (density-matched): $t10dense%.1fs " +
      f"(${t10dense / t1}%.1fx — the rebucket-as-you-grow playbook)")
    spark.stop()
  }
}
