package graft.streaming

import graft.SparkSpec
import graft.ops.TextAnalysis
import org.apache.spark.sql.functions._

import java.nio.file.Files

class CurationStreamSpec extends SparkSpec {
  import spark.implicits._

  // ≥ 5 words, ≥ 2 distinct stopwords, all-alpha, mean word length in
  // [3, 10] — each passes the Gopher gate at minWords = 5.
  private val tA = "the quick brown fox jumps over a lazy dog today"
  private val tB = "completely different words appear in the other document right here"
  private val tC = "unique content for the fourth document arrives just now"
  private val tShort = "too few words" // fails the word-count rule

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  private def withIndexTable(f: String => Unit): Unit = {
    val idx = s"curation_stream_idx_${System.nanoTime()}"
    try f(idx) finally spark.sql(s"DROP TABLE IF EXISTS $idx")
  }

  private def run(b: org.apache.spark.sql.DataFrame, id: Long,
                  clean: String, idx: String): Unit =
    CurationStream.ingestBatch(b, id, clean, idx, "doc_id", "text",
      maxDupRate = 0.5, spanN = 3, buckets = 4, minWords = 5)

  test("ingestBatch: gopher gate, cross-index span gate, intra-batch rate gate") {
    withIndexTable { idx =>
      val clean = tmp("curclean") + "/t"
      val b1 = Seq((1L, tA), (2L, tB), (3L, tShort)).toDF("doc_id", "text")
      run(b1, 0L, clean, idx)
      // 3 fails gopher; 1 and 2 survive with all their spans indexed
      assert(CurationStream.readClean(spark, clean)
        .select("doc_id").as[Long].collect().toSet == Set(1L, 2L))
      // batch 2: 4 re-delivers tA (every span already indexed → rate 1);
      // 5 is fresh; 6 and 7 duplicate each other intra-batch — the gate is
      // a QUALITY threshold, not keep-one dedup, so both drop (run
      // DedupStream for keep-one semantics)
      val b2 = Seq((4L, tA), (5L, tC), (6L, tB), (7L, tB)).toDF("doc_id", "text")
      run(b2, 1L, clean, idx)
      assert(CurationStream.readClean(spark, clean)
        .select("doc_id").as[Long].collect().toSet == Set(1L, 2L, 5L))
      // the index holds exactly the survivors' spans
      val expectSpans = TextAnalysis.spanDupRate(
        Seq((1L, tA), (2L, tB), (5L, tC)).toDF("doc_id", "text"),
        "doc_id", "text", n = 3)
        .agg(sum("n_spans")).as[Long].head()
      assert(spark.table(idx).count() == expectSpans)
    }
  }

  test("redactPii masks the clean output but the span index keeps original evidence") {
    withIndexTable { idx =>
      val clean = tmp("curredact") + "/t"
      val tPii = "please contact me at me@ex.com for the offer of today"
      val b = Seq((1L, tPii), (2L, tB)).toDF("doc_id", "text")
      CurationStream.ingestBatch(b, 0L, clean, idx, "doc_id", "text",
        maxDupRate = 0.5, spanN = 3, buckets = 4, minWords = 5, redactPii = true)
      val out = CurationStream.readClean(spark, clean)
        .select($"doc_id", $"text").as[(Long, String)].collect().toMap
      assert(out(1L) == "please contact me at <EMAIL> for the offer of today")
      assert(out(2L) == tB, "clean text passes through byte-identical")
      // the index keeps ORIGINAL spans, so redaction cannot mask
      // duplicate evidence: an unredacted re-delivery still gates out
      val b2 = Seq((3L, tPii)).toDF("doc_id", "text")
      CurationStream.ingestBatch(b2, 1L, clean, idx, "doc_id", "text",
        maxDupRate = 0.5, spanN = 3, buckets = 4, minWords = 5, redactPii = true)
      assert(!CurationStream.readClean(spark, clean)
        .select($"doc_id").as[Long].collect().contains(3L),
        "unredacted re-delivery must still hit the original-span index")
    }
  }

  test("decontamination gate: bench near-copy drops, clean docs pass, ≡ batch rule") {
    withIndexTable { idx =>
      val clean = tmp("curdecon") + "/t"
      // doc 1 shares all its trigrams with the bench doc; 2 is unrelated
      val bench = Seq((100L, tA)).toDF("bench_id", "text")
      val benchGrams = graft.ops.Decontaminate.benchGramSet(bench, "text", 3)
        .localCheckpoint(true)
      val b = Seq((1L, tA), (2L, tB)).toDF("doc_id", "text")
      CurationStream.ingestBatch(b, 0L, clean, idx, "doc_id", "text",
        maxDupRate = 0.5, spanN = 3, buckets = 4, minWords = 5,
        benchGrams = Some(benchGrams), benchShingleWords = 3,
        maxOverlapFrac = 0.5)
      assert(CurationStream.readClean(spark, clean)
        .select("doc_id").as[Long].collect().toSet == Set(2L),
        "the bench copy must drop; the clean doc must pass")
      // the dropped doc's spans must NOT have joined the index
      val batchEquiv = graft.ops.Decontaminate.contaminationScoresAgainst(
        b, "doc_id", "text", benchGrams, 3, 0.5)
        .where(!col("contaminated")).select("doc_id").as[Long].collect().toSet
      assert(batchEquiv == Set(2L), "stream gate ≡ the batch decision rule")
      val idxSrc = spark.table(idx).select("__src_id").as[Long].collect().toSet
      assert(idxSrc == Set(2L), "only survivors' spans enter the span index")
    }
  }

  test("empty index, one batch ≡ the batch operators' own gate semantics") {
    withIndexTable { idx =>
      val clean = tmp("cureq") + "/t"
      val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      CurationStream.ingestBatch(d, 0L, clean, idx, "doc_id", "text",
        maxDupRate = 0.7, spanN = 3, buckets = 4, minWords = 30)
      val streamed = CurationStream.readClean(spark, clean)
        .select("doc_id").as[Long].collect().toSet
      val gopher = TextAnalysis.gopherRules(d, "doc_id", "text", minWords = 30)
        .where(col("pass")).select("doc_id")
      val batch = d.join(gopher, Seq("doc_id"), "left_semi")
      val expected = TextAnalysis.spanDupRate(batch, "doc_id", "text", n = 3)
        .where(col("dup_rate") <= 0.7)
        .select("doc_id").as[Long].collect().toSet
      assert(streamed == expected)
      assert(streamed.nonEmpty, "fixture must keep at least one document")
    }
  }

  test("replayed batch is idempotent; duplicated postings don't flip later gates") {
    withIndexTable { idx =>
      val clean = tmp("currep") + "/t"
      run(Seq((1L, tA), (2L, tB)).toDF("doc_id", "text"), 0L, clean, idx)
      val b2 = Seq((4L, tA), (5L, tC)).toDF("doc_id", "text")
      run(b2, 1L, clean, idx)
      // crash-after-index-append replay: batch 1 re-runs against an index
      // already holding its own spans — the id-based probe excludes the
      // batch's own postings, so decisions repeat
      run(b2, 1L, clean, idx)
      assert(CurationStream.readClean(spark, clean)
        .select("doc_id").as[Long].collect().toSet == Set(1L, 2L, 5L))
      // later batch: a re-delivery of tC still drops (duplicated postings
      // for tC's spans are membership-equivalent)
      run(Seq((6L, tC)).toDF("doc_id", "text"), 2L, clean, idx)
      assert(CurationStream.readClean(spark, clean)
        .select("doc_id").as[Long].collect().toSet == Set(1L, 2L, 5L))
    }
  }

  test("fresh checkpoint (batch ids restart at 0) still probes the whole index") {
    withIndexTable { idx =>
      val clean = tmp("curfresh") + "/t"
      run(Seq((1L, tA), (2L, tB)).toDF("doc_id", "text"), 0L, clean, idx)
      run(Seq((5L, tC)).toDF("doc_id", "text"), 1L, clean, idx)
      // the stream loses its checkpoint and restarts: batch ids reset to
      // 0. The probe keys on document ids, not checkpoint-scoped batch
      // ids, so a re-crawl of tA still gates against docs 1/2/5's
      // postings. (Fresh cleanDir per the IngestStream.writeClean
      // contract — a reset stream must not recycle the old partitions.)
      val clean2 = tmp("curfresh2") + "/t"
      val tFresh = "nothing in the corpus resembles this sentence for it was never indexed"
      run(Seq((8L, tA), (9L, tC), (10L, tFresh)).toDF("doc_id", "text"),
        0L, clean2, idx)
      assert(CurationStream.readClean(spark, clean2)
        .select("doc_id").as[Long].collect().toSet == Set(10L),
        "re-crawled docs must gate against the pre-reset index")
    }
  }

  test("index probe runs in the bucket layout: zero index-side exchange") {
    withIndexTable { idx =>
      val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      CurationStream.buildSpanIndex(d.where($"doc_id" % 2 === 0L), idx,
        "doc_id", "text", spanN = 3, buckets = 4)
      val batch = d.where($"doc_id" % 2 === 1L)
      val spans = TextAnalysis.spanHashes(batch, "doc_id", "text", 3)
      val known = CurationStream.knownSpans(spark, idx,
        batch.select("doc_id"), "doc_id", spans)
      val plan = known.queryExecution.executedPlan.toString
      assert(plan.contains("Bucketed: true"), s"index scan not bucketed:\n$plan")
      // the index side never exchanges: replay exclusion broadcasts the
      // batch ids, the batch's span set broadcasts for the semi-join, and
      // the final distinct runs on the scan's bucket partitioning. The ONE
      // exchange in the plan is the batch-side span-hash distinct — an
      // index-side shuffle would make it ≥2.
      def nEx(p: String) = p.split("Exchange hashpartitioning").length - 1
      assert(nEx(plan) == 1, s"expected exactly the batch-side exchange:\n$plan")
      assert(plan.split("BroadcastHashJoin").length - 1 == 2,
        s"replay anti-join and span semi-join must both broadcast:\n$plan")
    }
  }

  test("streaming end-to-end: file stream bootstraps the span index and gates") {
    withIndexTable { idx =>
      val in = tmp("curin") + "/t"
      val clean = tmp("curcleanS") + "/t"
      val ckpt = tmp("curckpt")
      Seq((1L, tA), (2L, tB)).toDF("doc_id", "text")
        .coalesce(1).write.mode("append").parquet(in)
      def start() = CurationStream.start(spark, in, clean, idx, "doc_id",
        "text", checkpoint = ckpt, maxDupRate = 0.5, spanN = 3, buckets = 4,
        minWords = 5)
      start().awaitTermination()
      // second delivery resumes from the checkpoint: the re-crawl of tA
      // gates against batch 1's index, the fresh doc lands
      Seq((4L, tA), (5L, tC)).toDF("doc_id", "text")
        .coalesce(1).write.mode("append").parquet(in)
      start().awaitTermination()
      assert(CurationStream.readClean(spark, clean)
        .select("doc_id").as[Long].collect().toSet == Set(1L, 2L, 5L))
    }
  }
}
