package graft.streaming

import graft.SparkSpec
import graft.ops.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** The incremental community-hierarchy refresh: streamed maintenance
  * (per-delivery [[Dedup.refreshCommunityIndex]] over the
  * CDC-maintained LSH index) must reproduce the from-scratch hierarchy
  * over the merged corpus EXACTLY — the law per-component Louvain
  * normalization exists to make true. */
class CommunityStreamSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  private def withTable(name: String)(f: String => Unit): Unit = {
    val t = s"${name}_${System.nanoTime()}"
    try f(t) finally spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  private val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select("doc_id", "text").localCheckpoint(true)

  private def rows(df: DataFrame): Set[(Long, Long, Long, Long)] =
    df.select("doc_id", "comp", "comm1", "comm2")
      .as[(Long, Long, Long, Long)].collect().toSet

  private def fromScratch(corpus: DataFrame, table: String): Set[(Long, Long, Long, Long)] = {
    val path = tmp("commTruth") + "/t"
    Dedup.writeLshIndex(corpus, "doc_id", "text", table, buckets = 8)
    Dedup.buildCommunityIndex(spark, table, path)
    rows(spark.read.parquet(path))
  }

  test("streamed hierarchy == from-scratch rebuild over the merged corpus") {
    withTable("comm_idx") { idx =>
      withTable("comm_truth1") { truth1 =>
        withTable("comm_truth2") { truth2 =>
          val commPath = tmp("commIdx") + "/t"
          Dedup.writeLshIndex(docs, "doc_id", "text", idx, buckets = 8)
          Dedup.buildCommunityIndex(spark, idx, commPath)

          // delivery 1: the standard change fixture — docs ≡ 1 mod 7
          // rewritten, docs ≡ 3 mod 7 deleted
          val d1 = docs.where($"doc_id" % 7 === 1L)
            .select($"doc_id",
              concat($"text", lit(" refreshed merge batch")).as("text"),
              lit("U").as("op"))
            .unionByName(docs.where($"doc_id" % 7 === 3L)
              .select($"doc_id", lit(null).cast("string").as("text"),
                lit("D").as("op")))
            .withColumn("__src", lit("f1")).withColumn("__idx", lit(0L))
          CommunityStream.ingestBatch(d1, 1L, idx, commPath,
            "doc_id", "text", "op", buckets = 8)
          val merged1 = docs.where($"doc_id" % 7 =!= 3L)
            .select($"doc_id", when($"doc_id" % 7 === 1L,
              concat($"text", lit(" refreshed merge batch")))
              .otherwise($"text").as("text"))
            .localCheckpoint(true)
          assert(rows(spark.read.parquet(commPath)) == fromScratch(merged1, truth1),
            "delivery-1 refresh must equal the from-scratch hierarchy")

          // delivery 2: a doc resurrects (id%7==3 re-inserted with a near
          // copy of another doc's text → new cross-component edges) and
          // one more rewrite
          val donor = docs.orderBy("doc_id").limit(1)
            .select($"text").as[String].head()
          val d2 = docs.where($"doc_id" % 7 === 3L && $"doc_id" % 3 === 0L)
            .select($"doc_id", lit(donor).as("text"), lit("U").as("op"))
            .unionByName(docs.where($"doc_id" % 7 === 5L)
              .select($"doc_id", concat(lit("prefix "), $"text").as("text"),
                lit("U").as("op")))
            .withColumn("__src", lit("f2")).withColumn("__idx", lit(0L))
          CommunityStream.ingestBatch(d2, 2L, idx, commPath,
            "doc_id", "text", "op", buckets = 8)
          val merged2 = merged1.where($"doc_id" % 7 =!= 5L)
            .unionByName(docs.where($"doc_id" % 7 === 5L)
              .select($"doc_id", concat(lit("prefix "), $"text").as("text")))
            .unionByName(docs.where($"doc_id" % 7 === 3L && $"doc_id" % 3 === 0L)
              .select($"doc_id", lit(donor).as("text")))
          assert(rows(spark.read.parquet(commPath)) == fromScratch(merged2, truth2),
            "delivery-2 refresh (resurrect + rewrite) must equal from-scratch")
        }
      }
    }
  }

  test("file-stream twin drives the same path; replayed batch converges") {
    withTable("comm_stream_idx") { idx =>
      withTable("comm_stream_truth") { truth =>
        val commPath = tmp("commIdxS") + "/t"
        val in = tmp("commIn")
        val ckpt = tmp("commCkpt")
        Dedup.writeLshIndex(docs, "doc_id", "text", idx, buckets = 8)
        Dedup.buildCommunityIndex(spark, idx, commPath)
        docs.where($"doc_id" % 7 === 1L)
          .select($"doc_id",
            concat($"text", lit(" refreshed merge batch")).as("text"),
            lit("U").as("op"))
          .coalesce(1).write.parquet(s"$in/f1")
        // register the nested files as one input dir via glob
        val q = CommunityStream.start(spark, s"$in/*", idx, commPath, ckpt,
          buckets = 8)
        q.awaitTermination()
        val merged = docs
          .select($"doc_id", when($"doc_id" % 7 === 1L,
            concat($"text", lit(" refreshed merge batch")))
            .otherwise($"text").as("text"))
        assert(rows(spark.read.parquet(commPath)) == fromScratch(merged, truth))
        // idempotent replay: re-running the same delivery through the
        // direct path changes nothing (ledger-gated index, idempotent
        // splice)
        val before = rows(spark.read.parquet(commPath))
        val d1 = docs.where($"doc_id" % 7 === 1L)
          .select($"doc_id",
            concat($"text", lit(" refreshed merge batch")).as("text"),
            lit("U").as("op"))
          .withColumn("__src", lit("f1")).withColumn("__idx", lit(0L))
        CommunityStream.ingestBatch(d1, 0L, idx, commPath,
          "doc_id", "text", "op", buckets = 8)
        assert(rows(spark.read.parquet(commPath)) == before)
      }
    }
  }
}
