package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Crash windows of the id->cluster map sidecar under APPEND
  * maintenance (the r12 verdict's un-specced healing claim, made
  * stronger in r13: the map append is row-gated on the map itself, so a
  * retry appends nothing instead of relying on a later update to fold
  * duplicates away).
  *
  * The manufactured state is "crash AFTER the data + map appends, BEFORE
  * the ledger row" — the window the Similarity.appendToIvfIndex comment
  * documents. The replay must: skip the data append (segment probe),
  * skip the already-present map rows (row gate), land only the ledger
  * row — and leave the map holding exactly one row per id. */
class IvfIdMapCrashSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select("vec_id", "embedding").localCheckpoint(true)
  private lazy val cents = Similarity.kMeans(emb, "vec_id", "embedding",
    "cid", k = 4, iters = 3).localCheckpoint(true)

  private def mapRows(dir: String): Seq[(Long, Long)] =
    spark.read.parquet(dir.stripSuffix("/") + "_idmap")
      .select($"vec_id", $"cluster".cast("long").as("cluster"))
      .as[(Long, Long)].collect().toSeq

  test("append replay after a map-append/ledger crash leaves ONE map row per id") {
    val SI = graft.io.SegmentedIndex
    val dir = java.nio.file.Files.createTempDirectory("idmap_crash").toString + "/idx"
    // base index over the even ids; the odd ids arrive as an append
    val base = Similarity.ivfAssign(emb.where($"vec_id" % 2 === 0), cents,
      "vec_id", "embedding", "cid")
      .select($"vec_id", $"embedding", $"cluster").localCheckpoint(true)
    val appended = Similarity.ivfAssign(emb.where($"vec_id" % 2 === 1), cents,
      "vec_id", "embedding", "cid")
      .select($"vec_id", $"embedding", $"cluster").localCheckpoint(true)
    Similarity.writeIvfIndex(base, dir)
    Similarity.buildIvfIdMap(spark, dir, "vec_id")

    // ---- manufacture the crashed first attempt: data committed, map
    // rows committed, NO ledger row ----
    val seg = SI.pathNextSeg(spark, dir)
    val tagged = appended.withColumn(SI.SegCol, lit(seg)).localCheckpoint(true)
    tagged.write.mode("append").partitionBy("cluster").parquet(dir)
    // the build's TRUE bucket count, from the meta file (a guessed
    // modulus would place the manufactured rows in the wrong buckets
    // and the retry's bucket-pruned gate would miss them)
    val nBuckets = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir.stripSuffix("/") + "_idmap", "_nbuckets")),
      java.nio.charset.StandardCharsets.UTF_8).trim
      .split("\\s+").head.toLong
    tagged.select($"vec_id", $"cluster".cast("long").as("cluster"),
        pmod(xxhash64($"vec_id"), lit(nBuckets)).as("id_bucket"))
      .write.mode("append").partitionBy("id_bucket")
      .parquet(dir.stripSuffix("/") + "_idmap")
    val before = mapRows(dir)

    // ---- the at-least-once retry ----
    Similarity.appendToIvfIndex(spark, appended, dir, "crash_a1")

    val after = mapRows(dir)
    assert(after.size == after.toSet.size,
      s"retry must not duplicate map rows: ${after.size} rows, ${after.toSet.size} distinct")
    assert(after.toSet == before.toSet,
      "retry must append nothing the crashed attempt already landed")
    // the map mirrors the index exactly
    val idx = spark.read.parquet(dir)
      .select($"vec_id", $"cluster".cast("long").as("cluster"))
      .as[(Long, Long)].collect().toSet
    assert(after.toSet == idx, "map must mirror the index after replay")
    // and the batch is now ledger-committed: a SECOND replay no-ops whole
    Similarity.appendToIvfIndex(spark, appended, dir, "crash_a1")
    assert(mapRows(dir).size == after.size)
    assert(spark.read.parquet(dir).count() == idx.size.toLong,
      "ledger-gated replay must not re-append index rows")
    // a follow-up UPDATE delivery converges through the healed map: move
    // one appended id to a new vector, expect a from-scratch equality
    val mv = emb.as("a").where($"a.vec_id" === 1L)
      .join(emb.as("b"), $"b.vec_id" === $"a.vec_id" + 1L)
      .select($"a.vec_id".as("vec_id"), $"b.embedding".as("embedding"),
        lit("U").as("op"))
    Similarity.updateIvfIndex(spark, mv, cents, "vec_id", "embedding",
      "cid", "op", dir, "crash_u1")
    val merged = emb.as("e").join(mv.select($"vec_id", $"embedding".as("ne")),
        Seq("vec_id"), "left")
      .select($"vec_id", coalesce($"ne", $"embedding").as("embedding"))
    val want = Similarity.ivfAssign(merged, cents, "vec_id", "embedding", "cid")
      .select($"vec_id", $"cluster".cast("long").as("cluster"))
      .as[(Long, Long)].collect().toSet
    val got = spark.read.parquet(dir)
      .select($"vec_id", $"cluster".cast("long").as("cluster"))
      .as[(Long, Long)].collect().toSet
    assert(got == want, "post-crash update must equal the from-scratch assignment")
    assert(mapRows(dir).toSet == want, "map must track the update too")
  }
}
