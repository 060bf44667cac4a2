package graft.streaming

import graft.SparkSpec
import graft.io.SegmentedIndex
import graft.ops.{Dedup, Retrieval}
import org.apache.spark.sql.DataFrame

import java.nio.file.Files

/** Pins the bootstrap-wipe data-loss fix (r11, commit "stream bootstrap
  * wiping a compacted index"): after a compaction the plain-named gen-0
  * tables are DROPPED and the live index answers through the generation
  * pointer, so a stream bootstrap that probes existence with a bare
  * `catalog.tableExists(table)` sees "missing" and re-creates an EMPTY
  * index over the live one — silently losing every pre-compaction
  * document. Each test drives the exact scenario for one
  * generation-pointer family: deliveries → compaction fires mid-stream →
  * another delivery → every pre-compaction document still answers. A
  * revert of the `SegmentedIndex.exists` bootstrap to `tableExists`
  * makes each of these fail (the fresh build's resetGen wipes gen ≥ 1).
  */
class MidStreamCompactionSpec extends SparkSpec {
  import spark.implicits._

  private def dropFamily(t: String): Unit =
    spark.sql(s"SHOW TABLES LIKE '$t*'").collect()
      .foreach(r => spark.sql(
        s"DROP TABLE IF EXISTS ${r.getAs[String]("tableName")}"))

  private val q = Seq((0L, "alpha beta"), (1L, "gamma delta")).toDF("qid", "qtext")

  private def key(df: DataFrame) = df.collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet

  test("BM25 stream survives a mid-stream compaction (bootstrap-wipe pin)") {
    val t = s"bm25_midc_${System.nanoTime()}"
    val b0 = Seq((1L, "alpha beta gamma", "I"), (2L, "beta gamma", "I"),
      (3L, "delta delta", "I")).toDF("doc_id", "text", "op")
    val b1 = Seq((2L, "alpha alpha gamma", "U"), (3L, null: String, "D"))
      .toDF("doc_id", "text", "op")
    RetrievalStream.cdcBatch(b0, 0L, t, "doc_id", "text", "op", buckets = 2)
    RetrievalStream.cdcBatch(b1, 1L, t, "doc_id", "text", "op", buckets = 2)

    // Compaction fires mid-stream (what maintainBm25IndexIfNeeded does
    // when the segment budget trips): plain-named tables drop, gen ≥ 1.
    Retrieval.compactBm25Index(spark, t, buckets = 2)
    assert(SegmentedIndex.currentGen(spark, t) >= 1L)
    assert(!spark.catalog.tableExists(t), "plain gen-0 table must be gone " +
      "for this spec to exercise the wipe scenario")

    // Next delivery — its bootstrap must resolve existence through the
    // generation pointer, NOT re-create an empty index.
    val b2 = Seq((4L, "gamma delta epsilon", "I")).toDF("doc_id", "text", "op")
    RetrievalStream.cdcBatch(b2, 2L, t, "doc_id", "text", "op", buckets = 2)

    val merged = Seq((1L, "alpha beta gamma"), (2L, "alpha alpha gamma"),
      (4L, "gamma delta epsilon")).toDF("doc_id", "text")
    val want = key(Retrieval.bm25TopK(merged, q,
      "doc_id", "text", "qid", "qtext", k = 10))
    val got = key(Retrieval.bm25AgainstIndex(spark, t, q, "qid", "qtext", k = 10))
    assert(got == want, "pre-compaction docs must survive the post-" +
      "compaction delivery's bootstrap")
    // Pre-compaction doc 1 specifically still answers (the data-loss signal).
    assert(got.exists(_._2 == 1L))
    dropFamily(t)
  }

  test("phrase stream survives a mid-stream compaction (append + CDC bootstraps)") {
    val t = s"phrase_midc_${System.nanoTime()}"
    val b0 = Seq((1L, "alpha beta gamma"), (2L, "beta beta delta"))
      .toDF("doc_id", "text")
    RetrievalStream.phraseBatch(b0, 0L, t, "doc_id", "text", buckets = 2)

    Retrieval.compactPhraseIndex(spark, t, buckets = 2)
    assert(SegmentedIndex.currentGen(spark, t) >= 1L)
    assert(!spark.catalog.tableExists(t))

    // Both post-compaction entry points bootstrap-check: the append path…
    val b1 = Seq((3L, "alpha beta delta")).toDF("doc_id", "text")
    RetrievalStream.phraseBatch(b1, 1L, t, "doc_id", "text", buckets = 2)
    // …and the CDC path.
    val b2 = Seq((2L, "gamma delta epsilon", "U")).toDF("doc_id", "text", "op")
    RetrievalStream.phraseCdcBatch(b2, 2L, t, "doc_id", "text", "op", buckets = 2)

    val merged = Seq((1L, "alpha beta gamma"), (2L, "gamma delta epsilon"),
      (3L, "alpha beta delta")).toDF("doc_id", "text")
    def pkey(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val want = pkey(Retrieval.phraseTopK(merged, q, "doc_id", "text",
      "qid", "qtext", k = 10))
    val got = pkey(Retrieval.phraseAgainstIndex(spark, t, q, "qid", "qtext", k = 10))
    assert(got == want && got.exists(_._2 == 1L))
    dropFamily(t)
  }

  test("append-shaped replay from BEFORE a compaction is exactly-once (batch-id memory)") {
    val t = s"bm25_memo_${System.nanoTime()}"
    val b1 = Seq((1L, "alpha beta gamma"), (2L, "beta beta delta")).toDF("doc_id", "text")
    val b2 = Seq((3L, "alpha delta"), (4L, "epsilon zeta")).toDF("doc_id", "text")
    RetrievalStream.ingestBatch(b1, 0L, t, "doc_id", "text", buckets = 2)
    RetrievalStream.ingestBatch(b2, 1L, t, "doc_id", "text", buckets = 2)
    val want = key(Retrieval.bm25TopK(b1.union(b2), q,
      "doc_id", "text", "qid", "qtext", k = 10))

    Retrieval.compactBm25Index(spark, t, buckets = 2)
    assert(SegmentedIndex.currentGen(spark, t) >= 1L)
    // the rebased ledger reports ONE segment (memo rows are replay
    // memory, not segments — health must not trip maintenance forever)
    assert(SegmentedIndex.health(spark, t).segments == 1L)

    // crash replay of the PRE-compaction delivery 1: previously this
    // re-appended its postings (the ledger rebase forgot the batch id);
    // now the seg -1 memo row makes it a no-op
    RetrievalStream.ingestBatch(b2, 1L, t, "doc_id", "text", buckets = 2)
    assert(key(Retrieval.bm25AgainstIndex(spark, t, q, "qid", "qtext", k = 10)) == want,
      "replayed pre-compaction append must not duplicate postings")
    // and batch-id memory survives a SECOND compaction too
    Retrieval.compactBm25Index(spark, t, buckets = 2)
    RetrievalStream.ingestBatch(b2, 1L, t, "doc_id", "text", buckets = 2)
    assert(key(Retrieval.bm25AgainstIndex(spark, t, q, "qid", "qtext", k = 10)) == want)
    dropFamily(t)
  }

  test("LSH dedup stream survives a mid-stream compaction (cross-index memory kept)") {
    val t = s"lsh_midc_${System.nanoTime()}"
    val clean = Files.createTempDirectory("lshmidc").toString + "/clean"
    def ingest(batch: DataFrame, id: Long): Unit =
      DedupStream.ingestBatch(batch, id, clean, t, "doc_id", "text",
        threshold = 0.8, buckets = 2, shingleWords = 3, k = 16, bands = 4,
        maxBucketSize = 1000)
    val textA = "the quick brown fox jumps over the lazy dog tonight"
    val b0 = Seq((1L, textA),
      (2L, "entirely different words describing some other topic here"))
      .toDF("doc_id", "text")
    ingest(b0, 0L)

    Dedup.compactLshIndex(spark, t, buckets = 2)
    assert(SegmentedIndex.currentGen(spark, t) >= 1L)
    assert(!spark.catalog.tableExists(t))

    // Post-compaction delivery: doc 3 duplicates pre-compaction doc 1 —
    // it must be DROPPED (the index still remembers doc 1); doc 4 is
    // fresh and must survive. A tableExists-revert bootstrap would wipe
    // the index via writeLshIndex and let doc 3 through.
    val b1 = Seq((3L, textA),
      (4L, "completely novel content with no overlap at all anywhere"))
      .toDF("doc_id", "text")
    ingest(b1, 1L)

    val ids = DedupStream.readClean(spark, clean)
      .select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L, 2L, 4L),
      s"expected the near-dup of a pre-compaction doc to be dropped, got $ids")
    dropFamily(t)
  }
}
