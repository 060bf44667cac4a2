package graft.streaming

import graft.SparkSpec
import graft.ops.Similarity
import org.apache.spark.sql.functions._

import java.nio.file.Files

class EmbedDedupStreamSpec extends SparkSpec {
  import spark.implicits._

  // Two well-separated clusters on the first two axes; vectors are
  // 4-dim floats. cos(a, aDup) ≈ 0.995 (> 0.9); cos(a, aFar) ≈ 0.71 (< 0.9).
  private def v(xs: Double*) = xs.map(_.toFloat)
  private val c0 = v(1, 0, 0, 0)
  private val c1 = v(0, 1, 0, 0)
  private val a = v(1, 0.05, 0, 0) // cluster 0
  private val aDup = v(1, 0.08, 0, 0) // near-dup of a, cluster 0
  private val aFar = v(1, 1, 0, 0) // cluster boundary, cos(a,·) ≈ 0.72
  private val b = v(0.05, 1, 0, 0) // cluster 1
  private val bDup = v(0.02, 1, 0, 0) // near-dup of b, cluster 1

  private def cents = Seq((0L, c0), (1L, c1)).toDF("cid", "embedding")
  private def tmp(p: String) = Files.createTempDirectory(p).toString

  private def run(rows: Seq[(Long, Seq[Float])], id: Long, clean: String,
                  idx: String): Unit =
    EmbedDedupStream.ingestBatch(rows.toDF("vec_id", "embedding"), id,
      clean, idx, cents, "vec_id", "embedding", "cid", threshold = 0.9,
      maxClusterSize = 10000, heavyBits = 6, heavyMaxBucketSize = 1000)

  test("ingest loop: intra-batch and cross-index near-dups drop per cluster") {
    val clean = tmp("edClean") + "/t"
    val idx = tmp("edIdx") + "/t"
    // batch 1: 2 duplicates 1 intra-batch (lowest id keeps); 3 is cluster 1
    run(Seq((1L, a), (2L, aDup), (3L, b)), 0L, clean, idx)
    assert(EmbedDedupStream.readClean(spark, clean)
      .select("vec_id").as[Long].collect().toSet == Set(1L, 3L))
    // batch 2: 4 duplicates indexed 1 (cross-index); 5 is same cluster but
    // below threshold → kept; 6 duplicates indexed 3 in the other cluster
    run(Seq((4L, aDup), (5L, aFar), (6L, bDup)), 1L, clean, idx)
    assert(EmbedDedupStream.readClean(spark, clean)
      .select("vec_id").as[Long].collect().toSet == Set(1L, 3L, 5L))
    // the index holds exactly the survivors, under their clusters
    val byId = spark.read.parquet(idx)
      .select(col("vec_id"), col("cluster").cast("long"))
      .as[(Long, Long)].collect().toMap
    assert(byId.keySet == Set(1L, 3L, 5L))
    assert(byId(1L) == 0L && byId(5L) == 0L && byId(3L) == 1L)
  }

  test("replayed batch is idempotent: decisions and clean output unchanged") {
    val clean = tmp("edCleanR") + "/t"
    val idx = tmp("edIdxR") + "/t"
    run(Seq((1L, a), (3L, b)), 0L, clean, idx)
    run(Seq((4L, aDup), (5L, aFar)), 1L, clean, idx)
    // crash-after-index-append replay: batch re-runs against an index
    // already holding its own survivor (5); the self-match filter keeps it
    run(Seq((4L, aDup), (5L, aFar)), 1L, clean, idx)
    val rows = EmbedDedupStream.readClean(spark, clean)
      .select("vec_id").as[Long].collect()
    assert(rows.sorted.toSeq == Seq(1L, 3L, 5L), s"got ${rows.toSeq}")
  }

  test("replay stays idempotent when the intra LSH prune misses an over-cap pair") {
    val clean = tmp("edCleanH") + "/t"
    val idx = tmp("edIdxH") + "/t"
    // 8-dim: cluster mass on dim 7 (outside the 6 sign-bucket dims);
    // x1/x2 have cosine ≈ 0.9999 but sign-buckets at Hamming 2 (dims 1-2
    // flip), so the heavy path's Hamming-1 multiprobe misses the pair and
    // BOTH survive the intra prune. maxClusterSize = 1 forces that path.
    val c0 = v(0, 0, 0, 0, 0, 0, 1, 0)
    val x1 = v(0.05, 0.05, 0, 0, 0, 0, 10, 0)
    val x2 = v(-0.05, -0.05, 0, 0, 0, 0, 10, 0)
    val cents1 = Seq((0L, c0)).toDF("cid", "embedding")
    def runH(bid: Long): Unit =
      EmbedDedupStream.ingestBatch(
        Seq((1L, x1), (2L, x2)).toDF("vec_id", "embedding"), bid, clean,
        idx, cents1, "vec_id", "embedding", "cid", threshold = 0.9,
        maxClusterSize = 1, heavyBits = 6, heavyMaxBucketSize = 1000)
    runH(0L)
    val first = EmbedDedupStream.readClean(spark, clean)
      .select("vec_id").as[Long].collect().toSet
    assert(first == Set(1L, 2L), "LSH-missed pair: both survive the first run")
    // crash-after-index-append replay: without the batch-id exclusion the
    // exact cross-index scan would now drop BOTH rows
    runH(0L)
    val replayed = EmbedDedupStream.readClean(spark, clean)
      .select("vec_id").as[Long].collect().toSet
    assert(replayed == first, s"replay changed decisions: $first -> $replayed")
  }

  test("bootstrap-crash residue (dir with only _temporary) still bootstraps") {
    val clean = tmp("edCleanB") + "/t"
    val idx = tmp("edIdxB") + "/t"
    Files.createDirectories(java.nio.file.Paths.get(idx, "_temporary"))
    run(Seq((1L, a), (3L, b)), 0L, clean, idx)
    assert(EmbedDedupStream.readClean(spark, clean)
      .select("vec_id").as[Long].collect().toSet == Set(1L, 3L))
    assert(spark.read.parquet(idx).select("vec_id")
      .as[Long].collect().toSet == Set(1L, 3L))
  }

  test("one empty-index batch ≡ the batch semDedup operator") {
    val clean = tmp("edCleanE") + "/t"
    val idx = tmp("edIdxE") + "/t"
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    EmbedDedupStream.ingestBatch(emb, 0L, clean, idx, cents8, "vec_id",
      "embedding", "cid", threshold = 0.4, maxClusterSize = 10000,
      heavyBits = 6, heavyMaxBucketSize = 1000)
    val streamed = EmbedDedupStream.readClean(spark, clean)
      .select("vec_id").as[Long].collect().toSet
    val batch = Similarity.semDedup(emb, cents8, "vec_id", "embedding",
      "cid", threshold = 0.4).select("vec_id").as[Long].collect().toSet
    assert(streamed == batch)
  }

  test("index probe prunes to the delivery's cluster partitions; no index shuffle") {
    val clean = tmp("edCleanP") + "/t"
    val idx = tmp("edIdxP") + "/t"
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    EmbedDedupStream.buildIndex(emb, cents8, "vec_id", "embedding", "cid", idx)
    val nClusters = spark.read.parquet(idx).select("cluster").distinct().count()
    assert(nClusters >= 4, s"fixture should spread clusters, got $nClusters")
    // a delivery confined to cluster 0's region
    val probe = Seq((90001L, a), (90002L, aDup)).toDF("vec_id", "embedding")
    val assigned = Similarity.ivfAssign(probe, cents8, "vec_id", "embedding", "cid")
      .localCheckpoint(true)
    val clusters = assigned.select(col("cluster").cast("long"))
      .distinct().collect().map(_.getLong(0)).toSeq
    val read = Similarity.readIvfIndex(spark, idx, clusters)
    val scanned = read.select(input_file_name()).distinct()
      .as[String].collect()
    assert(scanned.nonEmpty &&
      scanned.forall(f => clusters.exists(c => f.contains(s"cluster=$c"))),
      s"scan must touch only probed cluster partitions:\n${scanned.mkString("\n")}")
    val probed = read
      .select(col("cluster"), col("vec_id").as("__id_c"), col("embedding").as("__vc"))
      .join(broadcast(assigned.select(col("cluster"), col("vec_id").as("__id_n"),
        col("embedding").as("__vn"))), Seq("cluster"))
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"index side must not shuffle:\n$plan")
  }

  test("file stream end-to-end: bootstrap, then a second delivery dedups") {
    val in = tmp("edIn") + "/t"
    val clean = tmp("edCleanS") + "/t"
    val idx = tmp("edIdxS") + "/t"
    val ckpt = tmp("edCkpt")
    def start() = EmbedDedupStream.start(spark, in, clean, idx, cents,
      "vec_id", "embedding", "cid", checkpoint = ckpt, threshold = 0.9)
    Seq((1L, a), (2L, aDup), (3L, b)).toDF("vec_id", "embedding")
      .coalesce(1).write.mode("append").parquet(in)
    start().awaitTermination()
    Seq((4L, aDup), (5L, aFar), (6L, bDup)).toDF("vec_id", "embedding")
      .coalesce(1).write.mode("append").parquet(in)
    start().awaitTermination()
    assert(EmbedDedupStream.readClean(spark, clean)
      .select("vec_id").as[Long].collect().toSet == Set(1L, 3L, 5L))
  }

  /** 8 centroids = the sf0.001 fixture's stand-in quantizer (first 8
    * corpus vectors), matching the sim_* query family. */
  private def cents8 = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .where(col("vec_id") < 8)
    .select(col("vec_id").as("cid"), col("embedding"))
}
