package graft.streaming

import graft.SparkSpec
import graft.ops.Retrieval
import org.apache.spark.sql.DataFrame

import java.nio.file.Files

class RetrievalStreamSpec extends SparkSpec {
  import spark.implicits._

  private def dropIndex(t: String): Unit =
    Seq(t, t + "_docs", t + "_segments", t + "_tombstones")
      .foreach(x => spark.sql(s"DROP TABLE IF EXISTS $x"))

  private val q = Seq((0L, "alpha beta"), (1L, "gamma delta")).toDF("qid", "qtext")

  private def key(df: DataFrame) = df.collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet

  private def probe(t: String) =
    Retrieval.bm25AgainstIndex(spark, t, q, "qid", "qtext", k = 10)

  test("two append deliveries ≡ from-scratch index over the union; replay no-ops") {
    val t = s"bm25_stream_${System.nanoTime()}"
    val b1 = Seq((1L, "alpha beta gamma"), (2L, "beta beta delta")).toDF("doc_id", "text")
    val b2 = Seq((3L, "alpha delta"), (4L, "epsilon zeta")).toDF("doc_id", "text")
    RetrievalStream.ingestBatch(b1, 0L, t, "doc_id", "text", buckets = 2)
    RetrievalStream.ingestBatch(b2, 1L, t, "doc_id", "text", buckets = 2)
    val want = key(Retrieval.bm25TopK(b1.union(b2), q,
      "doc_id", "text", "qid", "qtext", k = 10))
    assert(key(probe(t)) == want)
    // Replay of delivery 1 (crash after ledger commit): ledger-gated no-op.
    RetrievalStream.ingestBatch(b2, 1L, t, "doc_id", "text", buckets = 2)
    assert(key(probe(t)) == want)
    dropIndex(t)
  }

  test("CDC deliveries: upsert + delete ≡ from-scratch over the merged corpus") {
    val t = s"bm25_cdc_${System.nanoTime()}"
    val b0 = Seq((1L, "alpha beta", "I"), (2L, "beta gamma", "I"),
      (3L, "delta delta", "I")).toDF("doc_id", "text", "op")
    // doc 2 re-written, doc 3 deleted
    val b1 = Seq((2L, "alpha alpha gamma", "U"), (3L, null: String, "D"))
      .toDF("doc_id", "text", "op")
    RetrievalStream.cdcBatch(b0, 0L, t, "doc_id", "text", "op", buckets = 2)
    RetrievalStream.cdcBatch(b1, 1L, t, "doc_id", "text", "op", buckets = 2)
    val merged = Seq((1L, "alpha beta"), (2L, "alpha alpha gamma"))
      .toDF("doc_id", "text")
    val want = key(Retrieval.bm25TopK(merged, q,
      "doc_id", "text", "qid", "qtext", k = 10))
    assert(key(probe(t)) == want)
    // Replay of the change delivery: no-op (no double tombstones/postings).
    RetrievalStream.cdcBatch(b1, 1L, t, "doc_id", "text", "op", buckets = 2)
    assert(key(probe(t)) == want)
    dropIndex(t)
  }

  test("phrase deliveries: append + CDC ≡ recompute over the merged corpus; replay no-ops") {
    val t = s"phrase_stream_${System.nanoTime()}"
    val b1 = Seq((1L, "alpha beta gamma"), (2L, "beta beta delta")).toDF("doc_id", "text")
    val b2 = Seq((3L, "alpha beta delta", "I"), (2L, "gamma delta epsilon", "U"))
      .toDF("doc_id", "text", "op")
    RetrievalStream.phraseBatch(b1, 0L, t, "doc_id", "text", buckets = 2)
    RetrievalStream.phraseCdcBatch(b2, 1L, t, "doc_id", "text", "op", buckets = 2)
    val pq = Seq((0L, "alpha beta"), (1L, "gamma delta")).toDF("qid", "qtext")
    val merged = Seq((1L, "alpha beta gamma"), (2L, "gamma delta epsilon"),
      (3L, "alpha beta delta")).toDF("doc_id", "text")
    def pkey(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val want = pkey(Retrieval.phraseTopK(merged, pq, "doc_id", "text",
      "qid", "qtext", k = 10))
    def probeP() = pkey(Retrieval.phraseAgainstIndex(spark, t, pq,
      "qid", "qtext", k = 10))
    assert(probeP() == want && want.nonEmpty)
    RetrievalStream.phraseCdcBatch(b2, 1L, t, "doc_id", "text", "op", buckets = 2)
    assert(probeP() == want)
    Seq(t, t + "_segments", t + "_tombstones")
      .foreach(x => spark.sql(s"DROP TABLE IF EXISTS $x"))
  }

  test("file stream end-to-end: checkpoint restart resumes the fold") {
    val t = s"bm25_fs_${System.nanoTime()}"
    val in = Files.createTempDirectory("bm25in").toString + "/t"
    val ckpt = Files.createTempDirectory("bm25ck").toString
    val b1 = Seq((1L, "alpha beta gamma"), (2L, "beta beta delta")).toDF("doc_id", "text")
    val b2 = Seq((3L, "alpha delta"), (4L, "epsilon zeta")).toDF("doc_id", "text")
    b1.coalesce(1).write.mode("append").parquet(in)
    RetrievalStream.start(spark, in, t, "doc_id", "text", ckpt, buckets = 2)
      .awaitTermination()
    b2.coalesce(1).write.mode("append").parquet(in)
    RetrievalStream.start(spark, in, t, "doc_id", "text", ckpt, buckets = 2)
      .awaitTermination()
    val want = key(Retrieval.bm25TopK(b1.union(b2), q,
      "doc_id", "text", "qid", "qtext", k = 10))
    assert(key(probe(t)) == want)
    dropIndex(t)
  }
}
