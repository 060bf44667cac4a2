package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PqSpec extends SparkSpec {
  import spark.implicits._

  // 8-dim vectors, m=2 subspaces of 4 dims; codebook = first 2 vectors.
  private def vecs = Seq(
    (0L, Array(0f, 0f, 0f, 0f, 9f, 9f, 9f, 9f)),
    (1L, Array(5f, 5f, 5f, 5f, 1f, 1f, 1f, 1f)),
    (2L, Array(0.1f, 0f, 0f, 0f, 1.2f, 1f, 1f, 1f)), // sub0→code0, sub1→code1
    (3L, Array(4.9f, 5f, 5f, 5f, 8.8f, 9f, 9f, 9f))  // sub0→code1, sub1→code0
  ).toDF("vec_id", "embedding")

  private def codebook = vecs.where($"vec_id" < 2)
    .select($"vec_id".as("cid"), $"embedding")

  test("pqCodes: assigns each subspace to the nearest codebook entry") {
    val out = Similarity.pqCodes(vecs, codebook, "vec_id", "embedding", "cid", m = 2)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Long]("code0"), r.getAs[Long]("code1"), r.getAs[Long]("pq_code"))).toMap
    assert(out(0L) == ((0L, 0L, 0L)))      // codebook entries code to themselves
    assert(out(1L) == ((1L, 1L, 257L)))    // 1 + 1*256
    assert(out(2L) == ((0L, 1L, 256L)))    // mixed assignment
    assert(out(3L) == ((1L, 0L, 1L)))
  }

  test("pqCodes: equidistant ties resolve to the lowest code") {
    val cb = Seq((0L, Array(0f, 0f)), (1L, Array(2f, 0f))).toDF("cid", "embedding")
    val pts = Seq((10L, Array(1f, 0f))).toDF("vec_id", "embedding") // midway
    val out = Similarity.pqCodes(pts, cb, "vec_id", "embedding", "cid", m = 1).collect()
    assert(out.head.getAs[Long]("code0") == 0L)
  }
}
