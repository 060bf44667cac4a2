package graft.io

import graft.SparkSpec
import graft.ops.{Dedup, Retrieval}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Crash-atomicity of the compaction COMMIT (r7 verdict task 4): the
  * previous multi-table swap could crash mid-sequence and leave a
  * mixed-generation index that probed wrong until rebuilt. Now the next
  * generation is fully written first and committed by ONE generation-
  * pointer append ([[SegmentedIndex.compact]]); these tests kill the
  * compaction on BOTH sides of that commit and assert the probe always
  * answers from a complete generation — bit-identical results, working
  * ledger/tombstone accessors, and a clean re-run that converges. */
class CompactionCrashSpec extends SparkSpec {
  import spark.implicits._

  private final class InjectedCrash extends RuntimeException("injected crash")
  private def crash(): Unit = throw new InjectedCrash

  private val base = Seq(
    (1L, "a b a c"), (2L, "a c d"), (3L, "b b e"), (4L, "c c d f"), (5L, "e f a")
  ).toDF("doc_id", "text")
  private val changes = Seq(
    (1L, "a b updated words", "U"), (3L, null: String, "D"), (9L, "f e b fresh doc", "I")
  ).toDF("doc_id", "text", "op")
  private val q = Seq((0L, "a b"), (1L, "e f c")).toDF("qid", "qtext")

  private def probe(t: String): Set[(Long, Long, Double, Long)] =
    Retrieval.bm25AgainstIndex(spark, t, q, "qid", "qtext", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet

  private def dropAllGens(t: String): Unit = {
    val SI = SegmentedIndex
    (0L to SI.currentGen(spark, t)).map(SI.physName(t, _)).foreach { p =>
      Seq(p, p + "_docs", p + "_vecs",
        SI.tombstoneTable(p), SI.tombstoneTable(p + "_vecs"),
        SI.ledgerTable(p))
        .foreach(x => spark.sql(s"DROP TABLE IF EXISTS $x"))
    }
    spark.sql(s"DROP TABLE IF EXISTS ${SI.genPointerTable(t)}")
  }

  test("bm25 compaction: crash BEFORE the pointer commit leaves the old generation probing; re-run converges") {
    val t = "crash_bm25_before"
    Retrieval.writeBm25Index(base, "doc_id", "text", t, buckets = 4)
    Retrieval.updateBm25Index(spark, changes, "doc_id", "text", "op", t, 4, "b1")
    val before = probe(t)
    val tombsBefore = SegmentedIndex.tombstones(spark, t).count()
    assert(tombsBefore > 0) // the update really left churn to fold away

    // Kill the compaction AFTER the next generation is fully written but
    // BEFORE the commit — the worst crash point of the old swap design.
    intercept[InjectedCrash] {
      Retrieval.compactBm25Index(spark, t, buckets = 4, beforeCommit = crash _)
    }
    assert(SegmentedIndex.currentGen(spark, t) == 0L, "uncommitted gen must stay invisible")
    assert(probe(t) == before, "probe must still answer from the OLD complete generation")
    assert(SegmentedIndex.tombstones(spark, t).count() == tombsBefore)

    // Re-running the compaction converges: same next-gen names, overwrite.
    Retrieval.compactBm25Index(spark, t, buckets = 4)
    assert(SegmentedIndex.currentGen(spark, t) == 1L)
    assert(probe(t) == before, "probe must be unchanged across the committed compaction")
    assert(SegmentedIndex.tombstones(spark, t).count() == 0)
    assert(SegmentedIndex.ledger(spark, t).where(col("seg") >= 0L).count() == 1)
    dropAllGens(t)
  }

  test("bm25 compaction: crash AFTER the commit (before cleanup) probes the NEW generation; maintenance continues") {
    val t = "crash_bm25_after"
    Retrieval.writeBm25Index(base, "doc_id", "text", t, buckets = 4)
    Retrieval.updateBm25Index(spark, changes, "doc_id", "text", "op", t, 4, "b1")
    val before = probe(t)
    intercept[InjectedCrash] {
      Retrieval.compactBm25Index(spark, t, buckets = 4, afterCommit = crash _)
    }
    // Commit landed: readers resolve generation 1 even though the old
    // generation's tables were never dropped (orphans, not a mix).
    assert(SegmentedIndex.currentGen(spark, t) == 1L)
    assert(probe(t) == before)
    assert(SegmentedIndex.tombstones(spark, t).count() == 0)
    // Maintenance APIs follow the pointer: a further update on the
    // compacted index behaves exactly as on a fresh index.
    val more = Seq((2L, "g g h", "U")).toDF("doc_id", "text", "op")
    Retrieval.updateBm25Index(spark, more, "doc_id", "text", "op", t, 4, "b2")
    val expect = {
      val mergedNow = Seq((1L, "a b updated words"), (2L, "g g h"),
        (4L, "c c d f"), (5L, "e f a"), (9L, "f e b fresh doc"))
        .toDF("doc_id", "text")
      val ft = "crash_bm25_fresh"
      Retrieval.writeBm25Index(mergedNow, "doc_id", "text", ft, buckets = 4)
      val out = probe(ft); dropAllGens(ft); out
    }
    assert(probe(t) == expect)
    // A second compaction (gen 1 → 2) also sweeps the orphaned gen 0.
    Retrieval.compactBm25Index(spark, t, buckets = 4)
    assert(SegmentedIndex.currentGen(spark, t) == 2L)
    assert(probe(t) == expect)
    assert(!spark.catalog.tableExists(t), "orphaned generation-0 table must be swept")
    dropAllGens(t)
  }

  test("fresh rebuild over a compacted index sweeps the stranded generation tables") {
    val t = "crash_bm25_reset"
    Retrieval.writeBm25Index(base, "doc_id", "text", t, buckets = 4)
    Retrieval.updateBm25Index(spark, changes, "doc_id", "text", "op", t, 4, "b1")
    Retrieval.compactBm25Index(spark, t, buckets = 4)
    assert(SegmentedIndex.currentGen(spark, t) == 1L)
    val g1 = SegmentedIndex.physName(t, 1L)
    assert(spark.catalog.tableExists(g1))
    // A fresh (overwrite) rebuild resolves back to the plain names AND
    // sweeps every generation-suffixed physical table — resolve() never
    // returns them once the pointer drops, so without the sweep they
    // were a permanent disk leak (r8 advice).
    Retrieval.writeBm25Index(base, "doc_id", "text", t, buckets = 4)
    assert(SegmentedIndex.currentGen(spark, t) == 0L)
    Seq(g1, g1 + "_docs", SegmentedIndex.ledgerTable(g1),
        SegmentedIndex.tombstoneTable(g1))
      .foreach(x => assert(!spark.catalog.tableExists(x), s"stranded: $x"))
    assert(probe(t).nonEmpty)
    dropAllGens(t)
  }

  test("lsh compaction: crash before the commit leaves candidates unchanged") {
    val docs = (0L until 60L).map(i =>
      (i, s"tok${i % 7} alpha beta gamma delta tok${i % 5} epsilon zeta " +
        s"eta theta iota kappa word${i / 20}"))
      .toDF("doc_id", "text")
    val t = "crash_lsh"
    Dedup.writeLshIndex(docs, "doc_id", "text", t, buckets = 4)
    val dels = docs.where($"doc_id" % 6 === 0L)
      .select($"doc_id", lit(null).cast("string").as("text"), lit("D").as("op"))
    Dedup.updateLshIndex(spark, dels, "doc_id", "text", "op", t, 4, batchId = "u1")
    val probeDocs = docs.where($"doc_id" % 10 === 3L)
      .withColumn("doc_id", $"doc_id" + 1000000L)
    def cands(): Set[(Long, Long)] =
      Dedup.lshCandidatesAgainstIndex(spark, t, probeDocs, "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val before = cands()
    assert(before.nonEmpty)
    intercept[InjectedCrash] {
      Dedup.compactLshIndex(spark, t, buckets = 4, beforeCommit = crash _)
    }
    assert(SegmentedIndex.currentGen(spark, t) == 0L)
    assert(cands() == before)
    Dedup.compactLshIndex(spark, t, buckets = 4)
    assert(cands() == before)
    assert(SegmentedIndex.tombstones(spark, t).count() == 0)
    dropAllGens(t)
  }
}
