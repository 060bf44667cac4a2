package graft.tools

import graft.ops.{Dedup, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-10 probe: the dedup_communities pipeline (LSH pairs → seed
  * components → two-level Louvain) at 1× vs 10× corpus. Replicas get a
  * per-replica text tag (the ScaleUp convention) so the candidate graph
  * grows as 10 disjoint corpora, not 10 exact copies of each doc — the
  * banded pair set stays Σ bucket², never n². Scratch tool; results in
  * SCALE.md.
  *
  * Usage: Test/runMain graft.tools.ProbeCommunities
  */
object ProbeCommunities {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select("doc_id", "text")

    def communities(d: DataFrame): Long = {
      val pairs = Dedup.lshCandidatePairs(d, "doc_id", "text",
        shingleWords = 3, k = 16, bands = 4, maxBucketSize = 1000)
        .localCheckpoint(true)
      val eg = pairs.where(col("est_jaccard") >= 0.25)
        .select(col("id_a").as("a"), col("id_b").as("b")).distinct()
      val hi = pairs.where(col("est_jaccard") >= 0.75)
        .select(col("id_a").as("a"), col("id_b").as("b")).distinct()
      val comp = Dedup.resolveClusters(hi, "a", "b")
        .select(col("id").as("n"), col("cluster").as("comm"))
      Similarity.louvainLevels(eg, comp).count()
    }

    def probe(reps: Int): Double = {
      val d =
        if (reps == 1) base
        else (0 until reps).map(i => base
          .withColumn("doc_id", col("doc_id") + lit(i.toLong * 1000000000L))
          .withColumn("text", concat(col("text"), lit(s" replica$i"))))
          .reduce(_ unionByName _)
      val t0 = System.nanoTime()
      val n = communities(d)
      val t = (System.nanoTime() - t0) / 1e9
      println(f"[communities] reps=$reps members=$n t=$t%.2f s")
      t
    }

    probe(1) // warm-up
    val t1 = probe(1)
    val t10 = probe(10)
    println(f"[communities] 10x ratio=${t10 / t1}%.2f vs-linear=${t10 / (10 * t1)}%.2f")
    spark.stop()
  }
}
