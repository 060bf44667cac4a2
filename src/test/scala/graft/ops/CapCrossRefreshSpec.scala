package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Heavy-bucket cap transitions in the incremental community refresh:
  * a delivery that pushes a band bucket across `maxBucketSize` changes
  * pairs between UNCHANGED docs — a delete drops a bucket back under
  * the cap (pairs among the remaining members appear), an insert pushes
  * it over (they vanish). The affected-set closure alone cannot see
  * either (a deleted id has no live rows; the unchanged members are not
  * changed ids), so [[Dedup.refreshCommunityIndex]] seeds every live
  * member of a possibly-crossing bucket. These fixtures CROSS the cap
  * in both directions and pin refresh ≡ from-scratch rebuild. */
class CapCrossRefreshSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  private val textA = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
  private val textB = "one two three four five six seven eight nine ten eleven"
  private val textC = "totally unrelated content about something else entirely here now"

  private def rows(df: DataFrame): Set[(Long, Long, Long, Long)] =
    df.select("doc_id", "comp", "comm1", "comm2")
      .as[(Long, Long, Long, Long)].collect().toSet

  private def fromScratch(corpus: DataFrame, table: String): Set[(Long, Long, Long, Long)] = {
    val path = tmp("capTruth") + "/t"
    Dedup.writeLshIndex(corpus, "doc_id", "text", table, buckets = 4)
    Dedup.buildCommunityIndex(spark, table, path, maxBucketSize = 3)
    rows(spark.read.parquet(path))
  }

  private def dropFamily(t: String): Unit =
    spark.sql(s"SHOW TABLES LIKE '$t*'").collect()
      .foreach(r => spark.sql(
        s"DROP TABLE IF EXISTS ${r.getAs[String]("tableName")}"))

  test("delete that drops a bucket under the cap resurfaces pairs among unchanged docs") {
    val idx = s"cap_under_${System.nanoTime()}"
    val truth = s"cap_under_t_${System.nanoTime()}"
    val commPath = tmp("capUnder") + "/t"
    // ids 1-4 identical -> every band bucket holds 4 rows > cap 3: no
    // pairs. 10/11 near-dups; 20 unique.
    val corpus = Seq((1L, textA), (2L, textA), (3L, textA), (4L, textA),
      (10L, textB), (11L, textB + " extra"), (20L, textC)).toDF("doc_id", "text")
    Dedup.writeLshIndex(corpus, "doc_id", "text", idx, buckets = 4)
    Dedup.buildCommunityIndex(spark, idx, commPath, maxBucketSize = 3)
    assert(!rows(spark.read.parquet(commPath)).exists(_._1 <= 4L),
      "fixture: the capped clique must start pair-less")

    // delivery: delete doc 4 -> the clique's buckets drop to 3 live (=cap)
    val d = Seq((4L, null.asInstanceOf[String], "D")).toDF("doc_id", "text", "op")
    Dedup.updateLshIndex(spark, d, "doc_id", "text", "op", idx,
      buckets = 4, batchId = "d1")
    Dedup.refreshCommunityIndex(spark, idx, commPath,
      d.select("doc_id"), maxBucketSize = 3)

    val merged = corpus.where($"doc_id" =!= 4L)
    val want = fromScratch(merged, truth)
    assert(want.exists(_._1 == 1L), "truth must contain the resurfaced clique")
    assert(rows(spark.read.parquet(commPath)) == want,
      "refresh after an under-cap transition must equal the rebuild")
    dropFamily(idx); dropFamily(truth)
  }

  test("insert that pushes a bucket over the cap retires pairs among unchanged docs") {
    val idx = s"cap_over_${System.nanoTime()}"
    val truth = s"cap_over_t_${System.nanoTime()}"
    val commPath = tmp("capOver") + "/t"
    // ids 1-3 identical -> buckets at the cap: pairs exist. 10/11/20 as above.
    val corpus = Seq((1L, textA), (2L, textA), (3L, textA),
      (10L, textB), (11L, textB + " extra"), (20L, textC)).toDF("doc_id", "text")
    Dedup.writeLshIndex(corpus, "doc_id", "text", idx, buckets = 4)
    Dedup.buildCommunityIndex(spark, idx, commPath, maxBucketSize = 3)
    assert(rows(spark.read.parquet(commPath)).exists(_._1 == 1L),
      "fixture: the clique must start WITH pairs")

    // delivery: insert doc 5 with the same text -> buckets go to 4 > cap
    val d = Seq((5L, textA, "I")).toDF("doc_id", "text", "op")
    Dedup.updateLshIndex(spark, d, "doc_id", "text", "op", idx,
      buckets = 4, batchId = "i1")
    Dedup.refreshCommunityIndex(spark, idx, commPath,
      d.select("doc_id"), maxBucketSize = 3)

    val merged = corpus.unionByName(Seq((5L, textA)).toDF("doc_id", "text"))
    val want = fromScratch(merged, truth)
    assert(!want.exists(_._1 <= 5L), "truth: the over-cap clique is pair-less")
    assert(rows(spark.read.parquet(commPath)) == want,
      "refresh after an over-cap transition must equal the rebuild")
    dropFamily(idx); dropFamily(truth)
  }
}
