package graft.streaming

import graft.SparkSpec
import graft.io.SegmentedIndex

/** The index-family streams run their threshold maintenance check on the
  * [[CdcStream]] `maintainEvery` cadence, not unconditionally per
  * delivery: with a budget forced to trip (maxSegments = 1), compaction
  * — observable as a generation-pointer advance — fires exactly on
  * batches where `(batchId + 1) % maintainEvery == 0`, and never with
  * `maintainEvery = 0`. */
class MaintainCadenceSpec extends SparkSpec {
  import spark.implicits._

  private def dropFamily(t: String): Unit =
    spark.sql(s"SHOW TABLES LIKE '$t*'").collect()
      .foreach(r => spark.sql(
        s"DROP TABLE IF EXISTS ${r.getAs[String]("tableName")}"))

  private def gen(t: String) = SegmentedIndex.currentGen(spark, t)

  test("RetrievalStream.cdcBatch checks maintenance every N batches only") {
    val t = s"bm25_cad_${System.nanoTime()}"
    def deliver(id: Long, every: Int): Unit =
      RetrievalStream.cdcBatch(
        Seq((id, s"alpha beta doc$id", "I")).toDF("doc_id", "text", "op"),
        id, t, "doc_id", "text", "op", buckets = 2,
        maintainEvery = every, maxSegments = 1L)
    deliver(0L, 2) // (0+1)%2 != 0 → no check, even though the budget trips
    assert(gen(t) == 0L)
    deliver(1L, 2) // fires → compaction → gen advances
    assert(gen(t) == 1L)
    deliver(2L, 2) // off-cadence again
    assert(gen(t) == 1L)
    deliver(3L, 2)
    assert(gen(t) == 2L)
    // maintainEvery = 0: never, regardless of accumulated segments
    deliver(4L, 0); deliver(5L, 0)
    assert(gen(t) == 2L)
    dropFamily(t)
  }

  test("CommunityStream.ingestBatch checks maintenance every N batches only") {
    val t = s"lsh_cad_${System.nanoTime()}"
    val comm = java.nio.file.Files.createTempDirectory("commcad").toString + "/h"
    graft.ops.Dedup.writeLshIndex(
      Seq((100L, "base document with enough words to shingle properly here"))
        .toDF("doc_id", "text"), "doc_id", "text", t, buckets = 2)
    def deliver(id: Long): Unit =
      CommunityStream.ingestBatch(
        Seq((id, s"the quick brown fox number $id jumps over the lazy dog", "I",
          s"f$id", 0L)).toDF("doc_id", "text", "op", "__src", "__idx"),
        id, t, comm, "doc_id", "text", "op", buckets = 2,
        maintainEvery = 2, maxSegments = 1L)
    deliver(0L)
    assert(gen(t) == 0L)
    deliver(1L)
    assert(gen(t) == 1L)
    deliver(2L)
    assert(gen(t) == 1L)
    dropFamily(t)
  }
}
