package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CDC maintenance of the persisted LSH index: after any maintenance
  * sequence, the against-index candidates equal a from-scratch index
  * over the merged corpus (below the bucket cap on both sides). */
class DedupMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(): DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  private lazy val base = corpus().where($"doc_id" % 5 =!= 0L).localCheckpoint(true)
  private lazy val probeDocs = corpus().where($"doc_id" % 5 === 0L)
    .withColumn("doc_id", $"doc_id" + 2000000L).localCheckpoint(true)

  private def cands(table: String): Set[(Long, Long, Double)] =
    Dedup.lshCandidatesAgainstIndex(spark, table, probeDocs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  private def fresh(docs: DataFrame): Set[(Long, Long, Double)] = {
    val t = "lsh_maint_fresh"
    Dedup.writeLshIndex(docs, "doc_id", "text", t, buckets = 4)
    val out = cands(t)
    dropIndex(t)
    out
  }

  private def dropIndex(t: String): Unit =
    Seq(t, t + "_segments", t + "_tombstones")
      .foreach(x => spark.sql(s"DROP TABLE IF EXISTS $x"))

  test("update + delete: candidates ≡ from-scratch index over the merged corpus") {
    val t = "lsh_maint_upd"
    Dedup.writeLshIndex(base, "doc_id", "text", t, buckets = 4)
    // Change set: delete every doc ≡ 1 (mod 10), rewrite every doc ≡ 2
    // (mod 10) to a near-copy of a PROBE doc (forces new candidates that
    // only exist post-update), ghost-delete an id the index never held.
    val upd = probeDocs.where($"doc_id" % 10 === 0L).limit(5)
      .select(($"doc_id" % 100000L + 3000000L).as("doc_id"), $"text")
      .withColumn("op", lit("U"))
    val dels = base.where($"doc_id" % 10 === 1L)
      .select($"doc_id", lit(null).cast("string").as("text"), lit("D").as("op"))
    val ghost = Seq((99999999L, null: String, "D")).toDF("doc_id", "text", "op")
    val changes = upd.unionByName(dels).unionByName(ghost).localCheckpoint(true)
    Dedup.updateLshIndex(spark, changes, "doc_id", "text", "op", t, 4, batchId = "u1")
    val mergedCorpus = base.select("doc_id", "text")
      .join(changes.select("doc_id"), Seq("doc_id"), "left_anti")
      .unionByName(upd.select("doc_id", "text"))
    val got = cands(t)
    assert(got == fresh(mergedCorpus))
    // the rewritten docs are near-copies of probe docs → candidates exist
    assert(got.exists(_._2 >= 3000000L))
    dropIndex(t)
  }

  test("replayed update no-ops; compaction folds tombstones, candidates unchanged") {
    val t = "lsh_maint_replay"
    Dedup.writeLshIndex(base, "doc_id", "text", t, buckets = 4)
    val changes = base.where($"doc_id" % 7 === 0L)
      .select($"doc_id", lit(null).cast("string").as("text"), lit("D").as("op"))
    Dedup.updateLshIndex(spark, changes, "doc_id", "text", "op", t, 4, batchId = "u1")
    val once = cands(t)
    val segs = spark.table(t + "_segments").count()
    Dedup.updateLshIndex(spark, changes, "doc_id", "text", "op", t, 4, batchId = "u1")
    assert(cands(t) == once && spark.table(t + "_segments").count() == segs)
    Dedup.compactLshIndex(spark, t, buckets = 4)
    assert(cands(t) == once)
    // post-compaction physical tables live under the committed generation
    val SI = graft.io.SegmentedIndex
    assert(SI.tombstones(spark, t).count() == 0)
    assert(spark.table(SI.resolve(spark, t)).where($"__seg" =!= 0L).count() == 0)
    dropIndex(t)
  }

  test("maintenance policy fires exactly at the segment/tombstone budgets") {
    val t = "lsh_maint_policy"
    val SI = graft.io.SegmentedIndex
    Dedup.writeLshIndex(base, "doc_id", "text", t, buckets = 4)
    // healthy index: within both budgets → no-op, sidecars untouched
    assert(Dedup.maintainLshIndexIfNeeded(spark, t, buckets = 4).isEmpty)
    assert(SI.health(spark, t).segments == 1)
    // churn: 5 small delete batches → 6 segments, tombstones accumulate
    (1 to 5).foreach { i =>
      val dels = base.where($"doc_id" % 50 === i.toLong)
        .select($"doc_id", lit(null).cast("string").as("text"), lit("D").as("op"))
      Dedup.updateLshIndex(spark, dels, "doc_id", "text", "op", t, 4,
        batchId = s"p$i")
    }
    val before = cands(t)
    val h = SI.health(spark, t)
    assert(h.segments == 6 && h.tombstoneRows > 0)
    // still within the default budgets (16 segments, 0.3 tombstones) —
    // the policy must NOT fire...
    assert(Dedup.maintainLshIndexIfNeeded(spark, t, buckets = 4).isEmpty)
    assert(SI.health(spark, t) == h, "a no-op check must not touch the index")
    // ...and must fire EXACTLY when the budget says, returning the
    // pre-maintenance readout
    val fired = Dedup.maintainLshIndexIfNeeded(spark, t, buckets = 4,
      maxSegments = 5L)
    assert(fired.contains(h))
    val after = SI.health(spark, t)
    assert(after.segments == 1 && after.tombstoneRows == 0,
      s"compaction must re-flatten the ledger, got $after")
    assert(cands(t) == before, "maintenance must not change probe results")
    // flat again: an immediate re-check is a no-op
    assert(Dedup.maintainLshIndexIfNeeded(spark, t, buckets = 4,
      maxSegments = 5L).isEmpty)
    dropIndex(t)
  }

  test("replayed append no-ops (ledger-gated)") {
    val t = "lsh_maint_append"
    Dedup.writeLshIndex(base, "doc_id", "text", t, buckets = 4)
    val extra = corpus().where($"doc_id" % 10 === 0L)
      .withColumn("doc_id", $"doc_id" + 1000000L)
    Dedup.appendToLshIndex(extra, "doc_id", "text", t, buckets = 4, batchId = "a1")
    val rows = spark.table(t).count()
    Dedup.appendToLshIndex(extra, "doc_id", "text", t, buckets = 4, batchId = "a1")
    assert(spark.table(t).count() == rows)
    dropIndex(t)
  }
}
