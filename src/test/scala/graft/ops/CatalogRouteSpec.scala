package graft.ops

import graft.SparkSpec
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Probed IVF reads route through the METASTORE when a registration
  * exists: partition pruning then happens on catalog metadata, so no
  * distributed directory-listing job runs — the path-based read pays
  * one on every probe once the directory count crosses
  * `spark.sql.sources.parallelPartitionDiscovery.threshold` (forced to
  * 1 here so the 4-cluster fixture is "above threshold"). Results must
  * be identical either way. */
class CatalogRouteSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select("vec_id", "embedding").localCheckpoint(true)
  private lazy val cents = Similarity.kMeans(emb, "vec_id", "embedding",
    "cid", k = 4, iters = 3).localCheckpoint(true)
  // ONE query probing ONE cluster: the catalog route then lists a single
  // selected partition directory (below even the forced threshold of 1),
  // while the path route must discover ALL cluster directories first.
  private lazy val queries = emb.where($"vec_id" === 0L)
    .select($"vec_id".as("qid"), $"embedding").localCheckpoint(true)

  private def listingJobs(body: => Unit): Long = {
    val n = new java.util.concurrent.atomic.AtomicLong(0L)
    val l = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val d = Option(j.properties.getProperty("spark.job.description")).getOrElse("")
        if (d.startsWith("Listing leaf files")) n.incrementAndGet(): Unit
      }
    }
    spark.sparkContext.addSparkListener(l)
    try { body; Thread.sleep(1000) } // listener delivery is async
    finally spark.sparkContext.removeSparkListener(l)
    n.get()
  }

  private def knn(maskDir: String): Set[(Long, Long, Long)] =
    Similarity.binaryIvfKnn(spark, maskDir, emb, queries, cents,
      "vec_id", "embedding", "qid", "cid", k = 3, shortlist = 10, nprobe = 1)
      .select($"qid", $"vec_id", $"rank").as[(Long, Long, Long)]
      .collect().toSet

  test("registered probes skip the directory-listing job; results identical to the path read") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_cat").toString + "/m"
    val masks = Similarity.binaryMasks(
        Similarity.ivfAssign(emb, cents, "vec_id", "embedding", "cid"),
        "embedding")
      .select($"vec_id", $"mask_lo", $"mask_hi", $"cluster")
    Similarity.writeIvfIndex(masks, dir)
    spark.conf.set("spark.sql.sources.parallelPartitionDiscovery.threshold", "1")
    // the path-status cache would hide repeat listings — disable the
    // effect by clearing it between probes
    def coldCaches(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      org.apache.spark.sql.execution.datasources.FileStatusCache
        .getOrCreate(spark).invalidateAll()
    }
    try {
      coldCaches()
      var pathRes: Set[(Long, Long, Long)] = null
      val pathListings = listingJobs { pathRes = knn(dir) }
      assert(pathListings > 0,
        "sentinel: the path-based probe must pay a listing job above the threshold")

      Similarity.registerIvfIndex(spark, dir, "ivf_cat_route_spec")
      coldCaches()
      var catRes: Set[(Long, Long, Long)] = null
      val catListings = listingJobs { catRes = knn(dir) }
      assert(catListings == 0,
        s"catalog-routed probe must not launch a listing job (saw $catListings)")
      assert(catRes == pathRes && catRes.nonEmpty,
        "catalog and path probes must answer identically")

      // maintenance keeps the catalog exact: delete every doc of one
      // cluster, the probe (still catalog-routed) matches a fresh path
      // read with the registration removed
      val victim = spark.table("ivf_cat_route_spec")
        .groupBy($"cluster".cast("long").as("c")).count()
        .orderBy("count", "c").head().getLong(0)
      val dels = spark.table("ivf_cat_route_spec")
        .where($"cluster".cast("long") === victim)
        .select("vec_id").join(emb, Seq("vec_id"))
        .select($"vec_id", $"embedding", lit("D").as("op"))
      Similarity.updateBinaryIvfIndex(spark, dels, cents, "vec_id",
        "embedding", "cid", "op", dir, "cat_d1")
      assert(spark.table("ivf_cat_route_spec")
        .where($"cluster".cast("long") === victim).isEmpty,
        "dropped partition must leave the catalog entry")
    } finally {
      spark.conf.unset("spark.sql.sources.parallelPartitionDiscovery.threshold")
      spark.sql("DROP TABLE IF EXISTS ivf_cat_route_spec")
    }
  }

  test("an append creating a NEW cluster partition syncs the catalog entry") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_cat_app").toString + "/m"
    val assigned = Similarity.ivfAssign(emb, cents, "vec_id", "embedding", "cid")
      .select($"vec_id", $"embedding", $"cluster").localCheckpoint(true)
    // base index misses one whole cluster; the append introduces it
    val clusters = assigned.select($"cluster".cast("long")).distinct()
      .as[Long].collect().sorted
    assert(clusters.length >= 2, "fixture needs >= 2 clusters")
    val missing = clusters.last
    Similarity.writeIvfIndex(assigned.where($"cluster".cast("long") =!= missing), dir)
    Similarity.registerIvfIndex(spark, dir, "ivf_cat_append_spec")
    try {
      assert(spark.table("ivf_cat_append_spec")
        .where($"cluster".cast("long") === missing).isEmpty)
      Similarity.appendToIvfIndex(spark,
        assigned.where($"cluster".cast("long") === missing), dir, "a1")
      // the catalog-routed read must see the appended partition with NO
      // re-registration (maintenance synced the entry)
      val got = spark.table("ivf_cat_append_spec")
        .where($"cluster".cast("long") === missing).count()
      val want = assigned.where($"cluster".cast("long") === missing).count()
      assert(got == want && got > 0,
        s"appended partition invisible through the catalog: $got vs $want")
    } finally spark.sql("DROP TABLE IF EXISTS ivf_cat_append_spec")
  }
}
