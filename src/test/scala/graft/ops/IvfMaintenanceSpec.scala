package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CDC maintenance of the persisted IVF index: partition-level
  * copy-on-write (only impacted `cluster=` partitions rewritten),
  * ledger-gated appends, replay idempotence. */
class IvfMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet").localCheckpoint(true)
  private lazy val cents = Similarity.kMeans(emb, "vec_id", "embedding",
    "cid", k = 4, iters = 3).localCheckpoint(true)

  private def indexRows(docs: DataFrame): DataFrame =
    Similarity.ivfAssign(docs, cents, "vec_id", "embedding", "cid")
      .select(col("vec_id"), col("embedding"), col("cluster"))

  private def contents(dir: String): Set[(Long, Long)] =
    spark.read.parquet(dir).select(col("vec_id"), col("cluster").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("update + delete rewrites ONLY impacted partitions; contents ≡ fresh index over merged corpus") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_maint").toString + "/idx"
    val base = emb.where($"vec_id" % 5 =!= 0L)
    Similarity.writeIvfIndex(indexRows(base), dir)

    // Record per-partition file timestamps to prove untouched partitions
    // were not rewritten.
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def partFiles(): Map[String, Long] =
      fs.globStatus(new org.apache.hadoop.fs.Path(dir, "cluster=*/part-*"))
        .map(s => s.getPath.toString -> s.getModificationTime).toMap
    val before = partFiles()

    // Change set: move 3 vectors to the position of other corpus vectors
    // (likely different clusters), delete 2, ghost-delete 1.
    val moved = emb.where($"vec_id".isin(5L, 10L, 15L))
      .join(emb.where($"vec_id".isin(101L, 102L, 103L))
        .select($"vec_id".as("src"), $"embedding".as("newv")),
        $"vec_id" % 100L + 100L === $"src")
      .select($"vec_id", $"newv".as("embedding"), lit("U").as("op"))
    val dels = Seq((20L, "D"), (25L, "D"), (99999999L, "D"))
      .toDF("vec_id", "op").withColumn("embedding",
        lit(null).cast(emb.schema("embedding").dataType))
      .select("vec_id", "embedding", "op")
    val changes = moved.unionByName(dels).localCheckpoint(true)

    Similarity.updateIvfIndex(spark, changes, cents, "vec_id", "embedding",
      "cid", "op", dir, batchId = "u1")

    val mergedCorpus = base.join(changes.select("vec_id"), Seq("vec_id"), "left_anti")
      .select("vec_id", "embedding")
      .unionByName(moved.select("vec_id", "embedding"))
    val freshDir = java.nio.file.Files.createTempDirectory("ivf_fresh").toString + "/idx"
    Similarity.writeIvfIndex(indexRows(mergedCorpus), freshDir)
    assert(contents(dir) == contents(freshDir))

    // Partitions not holding any changed id must be byte-untouched.
    val after = partFiles()
    val impactedOld = contents(freshDir) // merged view
    val changedIds = Set(5L, 10L, 15L, 20L, 25L)
    val touchedClusters = spark.read.parquet(freshDir)
      .unionByName(spark.read.parquet(dir))
      .where($"vec_id".isin(changedIds.toSeq: _*))
      .select($"cluster".cast("long")).distinct().collect().map(_.getLong(0)).toSet
    val untouched = before.filter { case (p, _) =>
      val c = "cluster=(\\d+)".r.findFirstMatchIn(p).get.group(1).toLong
      !touchedClusters.contains(c)
    }
    assert(untouched.nonEmpty, "fixture must leave some partition untouched")
    untouched.foreach { case (p, t) =>
      assert(after.get(p).contains(t), s"untouched partition rewritten: $p")
    }
  }

  test("replayed update and append no-op (ledger-gated); crash-replay of update converges") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_replay").toString + "/idx"
    Similarity.writeIvfIndex(indexRows(emb.where($"vec_id" < 200L)), dir)
    val extra = indexRows(emb.where($"vec_id" >= 200L && $"vec_id" < 220L))
    Similarity.appendToIvfIndex(spark, extra, dir, "a1")
    val once = contents(dir)
    Similarity.appendToIvfIndex(spark, extra, dir, "a1")
    assert(contents(dir) == once)

    val changes = emb.where($"vec_id".isin(7L, 210L))
      .select($"vec_id", $"embedding", lit("D").as("op"))
    Similarity.updateIvfIndex(spark, changes, cents, "vec_id", "embedding",
      "cid", "op", dir, batchId = "u1")
    val afterUpd = contents(dir)
    assert(!afterUpd.exists(r => r._1 == 7L || r._1 == 210L))
    Similarity.updateIvfIndex(spark, changes, cents, "vec_id", "embedding",
      "cid", "op", dir, batchId = "u1")
    assert(contents(dir) == afterUpd)
    // Crash simulation: ledger row lost after the partition rewrite —
    // a replay under a NEW attempt of the same logical batch converges
    // to the same contents (remove-then-add of the same change set).
    Similarity.updateIvfIndex(spark, changes, cents, "vec_id", "embedding",
      "cid", "op", dir, batchId = "u1_retry")
    assert(contents(dir) == afterUpd)
  }

  test("registered index is discoverable by name from a fresh session; re-register syncs maintenance") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_reg").toString + "/idx"
    val base = emb.where($"vec_id" < 100L)
    Similarity.writeIvfIndex(indexRows(base), dir)
    val name = Similarity.registerIvfIndex(spark, dir, "ivf_reg_spec")
    // a FRESH session sharing the catalog resolves the index by NAME —
    // no path passed around (the property a bare parquet dir lacks)
    val s2 = spark.newSession()
    assert(s2.table(name).count() == spark.read.parquet(dir).count())
    // catalog reads keep the partition layout: a cluster predicate is a
    // PartitionFilter on the scan (prunes directories, not just rows)
    val someCluster = spark.read.parquet(dir)
      .select($"cluster".cast("long")).head().getLong(0)
    val scan = s2.table(name).where(col("cluster") === someCluster)
      .queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*cluster".r.findFirstIn(scan).nonEmpty,
      s"cluster predicate not pushed to PartitionFilters:\n$scan")
    // registration is idempotent (unchanged entry kept, no DROP window)
    Similarity.registerIvfIndex(spark, dir, "ivf_reg_spec")
    // maintenance that DELETES a whole cluster directory: re-register
    // SYNCs the dropped partition out of the catalog entry
    val victim = spark.read.parquet(dir).groupBy($"cluster".cast("long").as("c"))
      .count().orderBy("count", "c").head().getLong(0)
    val changes = spark.read.parquet(dir).where($"cluster".cast("long") === victim)
      .select("vec_id").join(emb, Seq("vec_id"))
      .select($"vec_id", $"embedding", lit("D").as("op"))
    Similarity.updateIvfIndex(spark, changes, cents, "vec_id", "embedding",
      "cid", "op", dir, batchId = "reg_d1")
    Similarity.registerIvfIndex(spark, dir, "ivf_reg_spec")
    val byName = spark.newSession().table(name)
    assert(byName.count() == spark.read.parquet(dir).count())
    assert(byName.where($"cluster".cast("long") === victim).isEmpty)
    spark.sql("DROP TABLE IF EXISTS ivf_reg_spec")
  }

  test("maintenance reads ONLY the id-map buckets + impacted cluster partitions (O(batch) lookup)") {
    import scala.jdk.CollectionConverters._
    val dir = java.nio.file.Files.createTempDirectory("ivf_omap").toString + "/idx"
    Similarity.writeIvfIndex(indexRows(emb), dir)
    // First update backfills the id->cluster sidecar (the ONE full scan
    // left in the lifecycle) — run it before the listener attaches.
    val warm = emb.where($"vec_id" === 3L)
      .select($"vec_id", $"embedding", lit("U").as("op"))
    Similarity.updateIvfIndex(spark, warm, cents, "vec_id", "embedding",
      "cid", "op", dir, batchId = "warm")
    val mapDir = dir + "_idmap"
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.globStatus(new org.apache.hadoop.fs.Path(mapDir, "id_bucket=*")).nonEmpty)

    // The measured delivery: move one vector, delete one.
    val changedIds = Seq(30L, 35L)
    val newVec = emb.where($"vec_id" === 200L)
      .select("embedding").as[Seq[Float]].head()
    val changes = emb.where($"vec_id" === 30L)
      .select($"vec_id", typedLit(newVec).as("embedding"), lit("U").as("op"))
      .unionByName(Seq((35L, "D")).toDF("vec_id", "op")
        .withColumn("embedding", lit(null).cast(emb.schema("embedding").dataType))
        .select("vec_id", "embedding", "op"))
      .localCheckpoint(true)
    // Expected impacted clusters: where 30/35 live now + where 30 lands.
    val oldC = spark.read.parquet(dir).where($"vec_id".isin(changedIds: _*))
      .select($"cluster".cast("long")).distinct().collect().map(_.getLong(0)).toSet
    val newC = Similarity.ivfAssign(changes.where($"op" =!= "D"), cents,
        "vec_id", "embedding", "cid")
      .select($"cluster".cast("long")).distinct().collect().map(_.getLong(0)).toSet
    val impacted = oldC ++ newC
    val allClusters = fs.globStatus(new org.apache.hadoop.fs.Path(dir, "cluster=*"))
      .map(_.getPath.getName.stripPrefix("cluster=").toLong).toSet
    assert((allClusters -- impacted).nonEmpty,
      "fixture must leave unimpacted clusters or the assert is vacuous")

    val scanned = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      private def walk(p: SparkPlan): Unit = p.foreach {
        case f: FileSourceScanExec =>
          // selectedPartitions = files the scan actually opens AFTER
          // partition pruning (inputFiles would list the whole index)
          f.selectedPartitions.toPartitionArray
            .foreach(pf => scanned.add(pf.urlEncodedPath))
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: QueryStageExec => walk(q.plan)
        case _ =>
      }
      override def onSuccess(fn: String, qe: org.apache.spark.sql.execution.QueryExecution,
                             ns: Long): Unit = walk(qe.executedPlan)
      override def onFailure(fn: String, qe: org.apache.spark.sql.execution.QueryExecution,
                             e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      Similarity.updateIvfIndex(spark, changes, cents, "vec_id", "embedding",
        "cid", "op", dir, batchId = "probe")
      // listener delivery is async — drain until the impacted-cluster
      // read surfaced (proves this update's events arrived)
      val deadline = System.currentTimeMillis() + 20000
      while (System.currentTimeMillis() < deadline &&
             !scanned.asScala.exists(_.contains("cluster=")))
        Thread.sleep(100)
    } finally spark.listenerManager.unregister(listener)
    val files = scanned.asScala.toSet
    val indexClustersScanned = files
      .filter(f => f.contains(dir) && f.contains("cluster="))
      .map(f => "cluster=(\\d+)".r.findFirstMatchIn(f).get.group(1).toLong)
    assert(indexClustersScanned.nonEmpty &&
      indexClustersScanned.subsetOf(impacted),
      s"index scan left the impacted set: $indexClustersScanned vs $impacted")
    val mapBucketsScanned = files.filter(_.contains("id_bucket="))
      .map(f => "id_bucket=(\\d+)".r.findFirstMatchIn(f).get.group(1).toLong)
    assert(mapBucketsScanned.size <= changedIds.size,
      s"map read not pruned to the changed ids' buckets: $mapBucketsScanned")
    // contents still converge with a fresh build over the merged corpus
    val merged = emb.where(!$"vec_id".isin(changedIds: _*))
      .select("vec_id", "embedding")
      .unionByName(changes.where($"op" =!= "D").select("vec_id", "embedding"))
    val freshDir = java.nio.file.Files.createTempDirectory("ivf_omap_f").toString + "/idx"
    Similarity.writeIvfIndex(indexRows(merged), freshDir)
    assert(contents(dir) == contents(freshDir))
  }

  test("a crashed id-map backfill (data without meta) reads as absent; the retry converges") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_meta").toString + "/idx"
    Similarity.writeIvfIndex(indexRows(emb.where($"vec_id" < 100L)), dir)
    val changes = emb.where($"vec_id" === 7L)
      .select($"vec_id", $"embedding", lit("D").as("op"))
    Similarity.updateIvfIndex(spark, changes, cents, "vec_id", "embedding",
      "cid", "op", dir, "m1")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate the crash window: map data committed, meta write lost
    val meta = new org.apache.hadoop.fs.Path(dir + "_idmap", "_nbuckets")
    assert(fs.exists(meta))
    fs.delete(meta, false)
    // the next delivery must treat the map as absent (re-backfill) and
    // still converge with a fresh build over the merged corpus
    val changes2 = emb.where($"vec_id" === 9L)
      .select($"vec_id", $"embedding", lit("D").as("op"))
    Similarity.updateIvfIndex(spark, changes2, cents, "vec_id", "embedding",
      "cid", "op", dir, "m2")
    assert(fs.exists(meta), "retry must recommit the meta file")
    val freshDir = java.nio.file.Files.createTempDirectory("ivf_meta_f").toString + "/idx"
    Similarity.writeIvfIndex(
      indexRows(emb.where($"vec_id" < 100L && !$"vec_id".isin(7L, 9L))), freshDir)
    assert(contents(dir) == contents(freshDir))
  }

  test("a cluster emptied by deletes is cleared, not left stale") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_empty").toString + "/idx"
    val tiny = emb.where($"vec_id" < 50L)
    Similarity.writeIvfIndex(indexRows(tiny), dir)
    // Delete EVERY doc of one cluster.
    val victims = spark.read.parquet(dir)
      .withColumn("c", $"cluster".cast("long"))
    val victimCluster = victims.groupBy("c").count().orderBy("count", "c")
      .head().getLong(0)
    val changes = victims.where($"c" === victimCluster).select("vec_id")
      .join(emb, Seq("vec_id"))
      .select($"vec_id", $"embedding", lit("D").as("op"))
    Similarity.updateIvfIndex(spark, changes, cents, "vec_id", "embedding",
      "cid", "op", dir, batchId = "d1")
    val remaining = contents(dir).map(_._2)
    assert(!remaining.contains(victimCluster))
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir, s"cluster=$victimCluster")))
  }
}
