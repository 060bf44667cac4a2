package graft.tools

import graft.ops.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Round-11 probe: the IVF-pruned binary rung's QUERY cost must be flat
  * in corpus size for fixed nprobe and fixed per-cluster size (clusters
  * scale with the corpus — the 100 TB layout). Build the mask sidecar
  * AND the float-vector index in the cluster-partitioned layout at 1×
  * and 10× rows (10× clusters), then time the same 20-query batch at
  * nprobe=4: the Hamming shortlist reads 4 probed mask partitions and
  * the rerank fetches floats from the same 4 probed vector partitions —
  * both bounded by nprobe·clusterSize, independent of corpus size.
  * Index BUILD cost (one-time) is excluded. Scratch tool; results in
  * SCALE.md.
  *
  * Usage: Test/runMain graft.tools.ProbeBinaryIvf
  */
object ProbeBinaryIvf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      // above 32 partition dirs Spark fires a DISTRIBUTED listing job per
      // path-based read — a fixed ~1 s/job overhead that scales with
      // cluster COUNT and would swamp the data-side signal this probe
      // measures. Local listStatus is cheap; at deployment scale the
      // index is catalog-registered (registerIvfIndex) and metastore
      // partition pruning lists only probed partitions anyway.
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "10000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // 64-dim vectors clustered around k pseudo-random centroid
    // directions: row id sits near centroid (id mod k) plus small noise,
    // so cluster sizes stay ≈ n/k at BOTH scales (clusters scale with
    // the corpus — per-cluster size fixed, the premise of the probe)
    def centDir(c: org.apache.spark.sql.Column, d: Int) =
      sin(c * (d * 7 + 3) + d)
    def mkNear(rows: Long, k: Int, offset: Long): DataFrame =
      spark.range(rows).select((col("id") + offset).as("vec_id"),
        array((0 until 64).map { d =>
          (centDir(pmod(col("id"), lit(k)), d) +
            sin(col("id") * 13 + d) * 0.3).cast("float")
        }: _*).as("embedding"))

    def probe(n: Long, k: Int): Double = {
      val cents = spark.range(k).select(col("id").as("cid"),
        array((0 until 64).map(d => centDir(col("id"), d).cast("float")): _*)
          .as("embedding")).localCheckpoint(true)
      val maskDir = Files.createTempDirectory(s"bivfM$n").toString + "/masks"
      val vecDir = Files.createTempDirectory(s"bivfV$n").toString + "/vecs"
      val assigned = Similarity.ivfAssign(mkNear(n, k, 0L), cents,
        "vec_id", "embedding", "cid").localCheckpoint(true)
      // one file per cluster dir (hash-clustered writers), so the
      // listing footprint scales with clusters, not clusters × tasks
      Similarity.writeIvfIndex(Similarity.binaryMasks(assigned, "embedding")
        .select(col("vec_id"), col("mask_lo"), col("mask_hi"), col("cluster"))
        .repartition(col("cluster")), maskDir)
      Similarity.writeIvfIndex(
        assigned.select(col("vec_id"), col("embedding"), col("cluster"))
          .repartition(col("cluster")), vecDir)
      val q = mkNear(20, k, 50000000L)
        .select(col("vec_id").as("qid"), col("embedding")).localCheckpoint(true)
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val clusters = Similarity.probedClusters(q, cents,
          "qid", "embedding", "cid", nprobe = 4)
        val corpusPruned = Similarity.readIvfIndex(spark, vecDir, clusters)
          .select(col("vec_id"), col("embedding"))
        Similarity.binaryIvfKnn(spark, maskDir, corpusPruned, q, cents,
          "vec_id", "embedding", "qid", "cid", k = 5, shortlist = 20,
          nprobe = 4).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[binary-ivf] corpus=$n%,d rows, $k clusters: query batch " +
        f"times=${times.map(t => f"$t%.2f").mkString(",")} min=${times.min}%.2f s")
      times.min
    }

    val t1 = probe(30000L, 30)
    val t10 = probe(300000L, 300)
    println(f"[binary-ivf] 10x-corpus query cost ratio = ${t10 / t1}%.2f (flat = 1.0)")
    spark.stop()
  }
}
