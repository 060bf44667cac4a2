package graft.tools

import graft.ops.{Dedup, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-10 probe: multi-level Louvain cost at 1× vs 10× corpus. All
  * rounds are edge-sized and the coarsened level shrinks with the
  * community count, so wall-time should grow sub-linearly in nodes
  * (the kNN-graph build dominates). Scratch tool; results in SCALE.md.
  *
  * Usage: Test/runMain graft.tools.ProbeLouvain
  */
object ProbeLouvain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")

    def levels(embIn: DataFrame): Long = {
      val mut = Similarity.mutualKnn(
        Similarity.knnGraph(embIn, "vec_id", "embedding",
          k = 3, bits = 6, maxBucketSize = 1000))
      val eg = mut.select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b")).distinct()
        .localCheckpoint(true)
      val hi = mut.where(col("cos") >= 0.5)
        .select(least(col("src"), col("dst")).as("a"),
          greatest(col("src"), col("dst")).as("b")).distinct()
      val comp = Dedup.resolveClusters(hi, "a", "b")
        .select(col("id").as("n"), col("cluster").as("comm"))
      Similarity.louvainLevels(eg, comp).count()
    }

    def probe(reps: Int): Double = {
      val embIn =
        if (reps == 1) base
        else (0 until reps).map(i => base.withColumn("vec_id",
          col("vec_id") + lit(i.toLong * 1000000000L))).reduce(_ unionByName _)
      val t0 = System.nanoTime()
      val n = levels(embIn)
      val t = (System.nanoTime() - t0) / 1e9
      println(f"[louvain] reps=$reps rows=$n t=$t%.2f s")
      t
    }

    probe(1) // warm-up
    val t1 = probe(1)
    val t10 = probe(10)
    println(f"[louvain] 10x ratio=${t10 / t1}%.2f vs-linear=${t10 / (10 * t1)}%.2f")
    spark.stop()
  }
}
