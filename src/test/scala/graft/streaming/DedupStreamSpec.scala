package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.Files

class DedupStreamSpec extends SparkSpec {
  import spark.implicits._

  private val tA = "alpha beta gamma delta epsilon zeta eta theta"
  private val tB = "totally different words appear here right now okay"
  private val tC = "unique text for the fourth document indeed folks"

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  /** Unique per run (a stale warehouse dir from an interrupted prior JVM
    * would otherwise fail managed-table creation) and dropped after. */
  private def withIndexTable(f: String => Unit): Unit = {
    val idx = s"dedup_stream_idx_${System.nanoTime()}"
    try f(idx) finally spark.sql(s"DROP TABLE IF EXISTS $idx")
  }

  private def run(b: org.apache.spark.sql.DataFrame, id: Long,
                  clean: String, idx: String): Unit =
    DedupStream.ingestBatch(b, id, clean, idx, "doc_id", "text",
      threshold = 0.8, buckets = 4, shingleWords = 3, k = 16, bands = 4,
      maxBucketSize = 1000)

  test("ingestBatch loop: intra-batch and cross-index dups drop, survivors join index") {
    withIndexTable { idx =>
      val clean = tmp("clean") + "/t"
      val b1 = Seq((1L, tA), (2L, tB)).toDF("doc_id", "text")
      val b2 = Seq((3L, tA), (4L, tC), (5L, tC)).toDF("doc_id", "text")
      run(b1, 0L, clean, idx)
      // batch 2: 3 duplicates corpus doc 1 (cross-index), 5 duplicates 4
      // intra-batch (higher id loses)
      run(b2, 1L, clean, idx)
      val kept = DedupStream.readClean(spark, clean)
        .select("doc_id").as[Long].collect().toSet
      assert(kept == Set(1L, 2L, 4L))
      assert(spark.table(idx).select("doc_id").distinct()
        .as[Long].collect().toSet == Set(1L, 2L, 4L))
    }
  }

  test("replayed batch is idempotent: decisions and clean output unchanged") {
    withIndexTable { idx =>
      val clean = tmp("cleanR") + "/t"
      val b1 = Seq((1L, tA), (2L, tB)).toDF("doc_id", "text")
      val b2 = Seq((3L, tA), (4L, tC), (5L, tC)).toDF("doc_id", "text")
      run(b1, 0L, clean, idx)
      run(b2, 1L, clean, idx)
      // crash-after-index-append replay: batch 2 re-runs against an index
      // already containing its own survivors
      run(b2, 1L, clean, idx)
      val rows = DedupStream.readClean(spark, clean).select("doc_id").as[Long].collect()
      assert(rows.sorted.toSeq == Seq(1L, 2L, 4L), s"got ${rows.toSeq}")
    }
  }

  test("checkpoint restart: second delivery resumes and dedups against batch-1 index") {
    withIndexTable { idx =>
      val in = tmp("inR") + "/t"
      val clean = tmp("cleanCk") + "/t"
      val ckpt = tmp("ckptR")
      def start() = DedupStream.start(spark, in, clean, idx, "doc_id", "text",
        checkpoint = ckpt, threshold = 0.8, buckets = 4)
      Seq((1L, tA), (2L, tB)).toDF("doc_id", "text")
        .coalesce(1).write.mode("append").parquet(in)
      start().awaitTermination()
      // stream stopped (AvailableNow); a later delivery resumes from the
      // same checkpoint — batch 1's files are not reprocessed, and the
      // cross-index check sees batch 1's survivors
      Seq((3L, tA), (4L, tC), (5L, tC)).toDF("doc_id", "text")
        .coalesce(1).write.mode("append").parquet(in)
      start().awaitTermination()
      assert(DedupStream.readClean(spark, clean)
        .select("doc_id").as[Long].collect().toSet == Set(1L, 2L, 4L))
      // two distinct batch partitions: one per delivery
      assert(spark.read.parquet(clean).select(DedupStream.BatchCol)
        .distinct().count() == 2L)
    }
  }

  test("streaming end-to-end: file stream bootstraps index and dedups") {
    withIndexTable { idx =>
      val in = tmp("in") + "/t"
      val clean = tmp("cleanS") + "/t"
      val ckpt = tmp("ckpt")
      Seq((1L, tA), (2L, tB), (3L, tA), (4L, tC), (5L, tC))
        .toDF("doc_id", "text").coalesce(1).write.parquet(in)
      val q = DedupStream.start(spark, in, clean, idx, "doc_id", "text",
        checkpoint = ckpt, threshold = 0.8, buckets = 4)
      q.awaitTermination()
      assert(DedupStream.readClean(spark, clean)
        .select("doc_id").as[Long].collect().toSet == Set(1L, 2L, 4L))
    }
  }
}
