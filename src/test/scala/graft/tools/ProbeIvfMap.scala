package graft.tools

import graft.ops.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-12 probe: with the id->cluster map sidecar, IVF maintenance
  * for a FIXED change batch must be ~flat in index size (previously the
  * impacted-cluster lookup scanned the whole index id column per
  * delivery). Synthetic vectors, 64 clusters, 20-id delivery; compare
  * update wall time at 1x and 10x corpus. Results in SCALE.md. */
object ProbeIvfMap {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dim = 16
    def mk(n: Long): DataFrame =
      spark.range(n).select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(dim - 1)),
          i => (pmod(col("id") * (i * 131L + 7L) + i * 17L, lit(997L))
            .cast("double") / 997d).cast("float")).as("embedding"))
        .localCheckpoint(true)

    def probe(n: Long, tag: String): Double = {
      val corpus = mk(n)
      val cents = Similarity.kMeans(corpus.where(col("vec_id") % 37 === 0),
        "vec_id", "embedding", "cid", k = 64, iters = 2).localCheckpoint(true)
      val dir = java.nio.file.Files.createTempDirectory(s"ivfmap$tag").toString + "/idx"
      Similarity.writeIvfIndex(
        Similarity.ivfAssign(corpus, cents, "vec_id", "embedding", "cid")
          .select(col("vec_id"), col("embedding"), col("cluster")), dir)
      // warm delivery builds the map (the one-time backfill scan)
      val warm = corpus.where(col("vec_id") === 1L)
        .select(col("vec_id"), col("embedding"), lit("U").as("op"))
      Similarity.updateIvfIndex(spark, warm, cents, "vec_id", "embedding",
        "cid", "op", dir, "warm")
      // measured: a FIXED 20-id delivery (10 moves + 10 deletes)
      val delivery = corpus.where(col("vec_id") % (n / 20) === 3L).limit(10)
        .select(col("vec_id"),
          transform(col("embedding"), x => (lit(1d) - x.cast("double")).cast("float")).as("embedding"),
          lit("U").as("op"))
        .unionByName(corpus.where(col("vec_id") % (n / 20) === 5L).limit(10)
          .select(col("vec_id"), col("embedding"), lit("D").as("op")))
        .localCheckpoint(true)
      val t0 = System.nanoTime()
      Similarity.updateIvfIndex(spark, delivery, cents, "vec_id", "embedding",
        "cid", "op", dir, "p1")
      (System.nanoTime() - t0) / 1e9
    }

    val t1 = probe(100000L, "1x")
    val t10 = probe(1000000L, "10x")
    println(f"[ivf-map] fixed 20-id update: ${t1}%.2f s @100k vectors, " +
      f"${t10}%.2f s @1M (ratio ${t10 / t1}%.2f; flat = 1.0)")
    spark.stop()
  }
}
