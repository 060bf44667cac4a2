package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CDC maintenance of the persisted BM25 index: update/delete/replay/
  * compaction semantics (VERDICT r6 tasks 2-3). The invariant under
  * test everywhere: after any maintenance sequence, the probe is
  * BIT-IDENTICAL to a from-scratch index over the merged corpus. */
class RetrievalMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private val base = Seq(
    (1L, "a b a c"),
    (2L, "a c d"),
    (3L, "b b e"),
    (4L, "c c d f"),
    (5L, "e f a")
  ).toDF("doc_id", "text")

  // Merged change set: update 1, delete 3, insert 9.
  private val changes = Seq(
    (1L, "a b updated words", "U"),
    (3L, null: String, "D"),
    (9L, "f e b fresh doc", "I")
  ).toDF("doc_id", "text", "op")

  private val merged = Seq(
    (1L, "a b updated words"),
    (2L, "a c d"),
    (4L, "c c d f"),
    (5L, "e f a"),
    (9L, "f e b fresh doc")
  ).toDF("doc_id", "text")

  private val q = Seq((0L, "a b"), (1L, "e f c")).toDF("qid", "qtext")

  private def probe(table: String): Set[(Long, Long, Double, Long)] =
    Retrieval.bm25AgainstIndex(spark, table, q, "qid", "qtext", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet

  private def freshProbe(corpus: DataFrame): Set[(Long, Long, Double, Long)] = {
    val t = "bm25_maint_fresh"
    Retrieval.writeBm25Index(corpus, "doc_id", "text", t, buckets = 4)
    val out = probe(t)
    dropIndex(t)
    out
  }

  private def dropIndex(t: String): Unit =
    Seq(t, t + "_docs", t + "_segments", t + "_tombstones")
      .foreach(x => spark.sql(s"DROP TABLE IF EXISTS $x"))

  test("update + delete + insert: probe ≡ from-scratch index over the merged corpus") {
    val t = "bm25_maint_upd"
    Retrieval.writeBm25Index(base, "doc_id", "text", t, buckets = 4)
    Retrieval.updateBm25Index(spark, changes, "doc_id", "text", "op", t, 4, "b1")
    assert(probe(t) == freshProbe(merged))
    // ... and the stats are exact: nd = 5 live docs.
    val led = spark.table(t + "_segments").agg(sum("n_docs")).head().getLong(0)
    val tn = spark.table(t + "_tombstones").count()
    assert(led - tn == 5)
    dropIndex(t)
  }

  test("maintenance policy: fires at the segment budget, probe unchanged, ledger re-flattens") {
    val t = "bm25_maint_policy"
    val SI = graft.io.SegmentedIndex
    Retrieval.writeBm25Index(base, "doc_id", "text", t, buckets = 4)
    Retrieval.updateBm25Index(spark, changes, "doc_id", "text", "op", t, 4, "b1")
    val before = probe(t)
    val h = SI.health(spark, t)
    assert(h.segments == 2)
    // within budget (the 5-doc fixture's tombstone fraction is 0.4, so
    // relax that knob to isolate the segment budget): no fire, no touch
    assert(Retrieval.maintainBm25IndexIfNeeded(spark, t, buckets = 4,
      maxTombstoneFraction = 1.0).isEmpty,
      "within the budgets the policy must not fire")
    val fired = Retrieval.maintainBm25IndexIfNeeded(spark, t, buckets = 4,
      maxSegments = 1L, maxTombstoneFraction = 1.0)
    assert(fired.contains(h))
    val after = SI.health(spark, t)
    assert(after.segments == 1 && after.tombstoneRows == 0)
    assert(probe(t) == before, "maintenance must not change probe results")
    dropIndex(t)
  }

  test("replayed update batch no-ops (ledger-gated, exactly-once)") {
    val t = "bm25_maint_replay"
    Retrieval.writeBm25Index(base, "doc_id", "text", t, buckets = 4)
    Retrieval.updateBm25Index(spark, changes, "doc_id", "text", "op", t, 4, "b1")
    val once = probe(t)
    val segsOnce = spark.table(t + "_segments").count()
    Retrieval.updateBm25Index(spark, changes, "doc_id", "text", "op", t, 4, "b1")
    assert(probe(t) == once)
    assert(spark.table(t + "_segments").count() == segsOnce)
    dropIndex(t)
  }

  test("replayed append no-ops; crash-resume (data committed, ledger row lost) completes without doubling") {
    val t = "bm25_maint_append"
    Retrieval.writeBm25Index(base, "doc_id", "text", t, buckets = 4)
    val extra = Seq((10L, "a e g"), (11L, "b g g")).toDF("doc_id", "text")
    Retrieval.appendToBm25Index(spark, extra, "doc_id", "text", t, 4, "b2")
    val once = probe(t)
    Retrieval.appendToBm25Index(spark, extra, "doc_id", "text", t, 4, "b2")
    assert(probe(t) == once)
    assert(once == freshProbe(base.unionByName(extra)))
    // Crash simulation: the postings/docs commits survived but the
    // ledger row did not — resume must detect the segment and append
    // ONLY the ledger row (no posting duplication).
    val ledT = t + "_segments"
    val pruned = spark.table(ledT).where(col("batch_id") =!= "b2").localCheckpoint(true)
    pruned.write.mode("overwrite").format("parquet").saveAsTable(ledT)
    val postingsRows = spark.table(t).count()
    Retrieval.appendToBm25Index(spark, extra, "doc_id", "text", t, 4, "b2")
    assert(spark.table(t).count() == postingsRows)
    assert(probe(t) == once)
    dropIndex(t)
  }

  test("deleting a non-live id is a no-op (no tombstone, no stats drift)") {
    val t = "bm25_maint_ghost"
    Retrieval.writeBm25Index(base, "doc_id", "text", t, buckets = 4)
    val ghost = Seq((77L, null: String, "D")).toDF("doc_id", "text", "op")
    Retrieval.updateBm25Index(spark, ghost, "doc_id", "text", "op", t, 4, "g1")
    assert(spark.table(t + "_tombstones").count() == 0)
    assert(probe(t) == freshProbe(base))
    dropIndex(t)
  }

  test("a twice-updated id keeps only its latest version; compaction folds tombstones away") {
    val t = "bm25_maint_compact"
    Retrieval.writeBm25Index(base, "doc_id", "text", t, buckets = 4)
    Retrieval.updateBm25Index(spark, changes, "doc_id", "text", "op", t, 4, "b1")
    val again = Seq((1L, "a a final text", "U"), (9L, null: String, "D"))
      .toDF("doc_id", "text", "op")
    Retrieval.updateBm25Index(spark, again, "doc_id", "text", "op", t, 4, "b2")
    val mergedTwice = Seq(
      (1L, "a a final text"), (2L, "a c d"), (4L, "c c d f"), (5L, "e f a")
    ).toDF("doc_id", "text")
    val expect = freshProbe(mergedTwice)
    assert(probe(t) == expect)
    Retrieval.compactBm25Index(spark, t, buckets = 4)
    assert(probe(t) == expect)
    // post-compaction physical tables live under the committed generation
    val SI = graft.io.SegmentedIndex
    assert(SI.tombstones(spark, t).count() == 0)
    assert(SI.ledger(spark, t).where(col("seg") >= 0L).count() == 1)
    assert(spark.table(SI.resolve(spark, t)).where(col("__seg") =!= 0L).count() == 0)
    dropIndex(t)
  }

  test("phrase index: build + append + update ≡ recompute over the union; replay no-ops") {
    val t = "phrase_maint_idx"
    val pq = Seq((0L, "a b"), (1L, "e f a")).toDF("qid", "qtext")
    def probeP(): Set[(Long, Long, Long, Long)] =
      Retrieval.phraseAgainstIndex(spark, t, pq, "qid", "qtext", k = 10)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    def recompute(corpus: DataFrame): Set[(Long, Long, Long, Long)] =
      Retrieval.phraseTopK(corpus, pq, "doc_id", "text", "qid", "qtext", k = 10)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    Retrieval.writePhraseIndex(base.where($"doc_id" <= 3L), "doc_id", "text", t, buckets = 4)
    Retrieval.appendToPhraseIndex(spark, base.where($"doc_id" > 3L),
      "doc_id", "text", t, 4, "a1")
    assert(probeP() == recompute(base))
    // replayed append no-ops
    Retrieval.appendToPhraseIndex(spark, base.where($"doc_id" > 3L),
      "doc_id", "text", t, 4, "a1")
    assert(probeP() == recompute(base))
    // CDC update: maintained ≡ from-scratch over the merged corpus
    Retrieval.updatePhraseIndex(spark, changes, "doc_id", "text", "op", t, 4, "c1")
    assert(probeP() == recompute(merged))
    Retrieval.updatePhraseIndex(spark, changes, "doc_id", "text", "op", t, 4, "c1")
    assert(probeP() == recompute(merged))
    // compaction folds segments + tombstones away; probe unchanged
    Retrieval.compactPhraseIndex(spark, t, buckets = 4)
    val SI = graft.io.SegmentedIndex
    assert(SI.tombstones(spark, t).count() == 0)
    assert(SI.ledger(spark, t).where(col("seg") >= 0L).count() == 1)
    // the re-baselined n_docs recounts live ids from the surviving
    // bigram rows — docs holding >= 1 bigram (writePhraseIndex's
    // membership rule: single-token docs are not index members). All 5
    // merged fixture docs have >= 2 tokens, so all 5 count here.
    assert(SI.ledger(spark, t).where(col("seg") >= 0L).select("n_docs").head().getLong(0) == 5L)
    assert(spark.table(SI.resolve(spark, t)).where(col("__seg") =!= 0L).count() == 0)
    assert(probeP() == recompute(merged))
    (Seq(t, t + "_tombstones", t + "_segments", SI.genPointerTable(t)) ++
      Seq(SI.resolve(spark, t)).flatMap(p =>
        Seq(p, p + "_tombstones", p + "_segments")))
      .foreach(x => spark.sql(s"DROP TABLE IF EXISTS $x"))
  }
}
