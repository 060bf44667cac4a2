package graft.ops

import graft.SparkSpec
import graft.streaming.EmbedDedupStream
import org.apache.spark.sql.functions._

/** The id->cluster map re-buckets when the index outgrows its
  * build-time geometry ([[Similarity.maintainIvfIdMapIfNeeded]]): the
  * `_nbuckets` count is frozen at backfill, so an append-heavy index
  * would otherwise drift toward corpus-sized buckets and the
  * per-delivery bucket read would grow with it. The spec grows an index
  * ~8x past the doubling threshold, asserts the map re-buckets exactly
  * once, and that lookups/deliveries through the re-bucketed map stay
  * exact against a from-scratch assignment. */
class IdMapRebucketSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select("vec_id", "embedding").localCheckpoint(true)
  private lazy val cents = Similarity.kMeans(emb, "vec_id", "embedding",
    "cid", k = 4, iters = 3).localCheckpoint(true)

  private def metaTokens(dir: String): Array[String] =
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir.stripSuffix("/") + "_idmap", "_nbuckets")),
      java.nio.charset.StandardCharsets.UTF_8).trim.split("\\s+")

  private def mapPairs(dir: String): Seq[(Long, Long)] =
    spark.read.parquet(dir.stripSuffix("/") + "_idmap")
      .select($"vec_id", $"cluster".cast("long").as("cluster"))
      .as[(Long, Long)].collect().toSeq

  test("growth past 2x capacity re-buckets the map once; lookups stay exact") {
    val dir = java.nio.file.Files.createTempDirectory("idmap_grow").toString + "/idx"
    val assigned = Similarity.ivfAssign(emb, cents, "vec_id", "embedding", "cid")
      .select($"vec_id", $"embedding", $"cluster").localCheckpoint(true)
    // build over 60 ids at 4 rows/bucket: floor(16) buckets, capacity
    // 16*4 = 128 live rows before the doubling trigger
    Similarity.writeIvfIndex(assigned.where($"vec_id" < 60), dir)
    Similarity.buildIvfIdMap(spark, dir, "vec_id", rowsPerBucket = 4L)
    assert(metaTokens(dir).toSeq == Seq("16", "4"),
      s"build-time geometry: ${metaTokens(dir).toSeq}")
    // within budget: the check is a no-op
    assert(Similarity.maintainIvfIdMapIfNeeded(spark, dir, "vec_id").isEmpty)

    // the index grows ~8x past the build sizing
    Similarity.appendToIvfIndex(spark,
      assigned.where($"vec_id" >= 60), dir, "grow1")
    val fired = Similarity.maintainIvfIdMapIfNeeded(spark, dir, "vec_id")
    assert(fired.exists { case (o, n) => o == 16 && n > 32 },
      s"expected a >2x re-bucket from 16, got $fired")
    val newN = metaTokens(dir)(0).toInt
    assert(newN == fired.get._2 && metaTokens(dir)(1) == "4",
      "meta must record the new count under the same rows-per-bucket target")
    // the re-bucketed map mirrors the index exactly, one row per id
    val pairs = mapPairs(dir)
    val want = assigned.select($"vec_id", $"cluster".cast("long"))
      .as[(Long, Long)].collect().toSet
    assert(pairs.size == pairs.toSet.size && pairs.toSet == want)
    // and it re-buckets ONCE: a second maintenance pass is a no-op
    assert(Similarity.maintainIvfIdMapIfNeeded(spark, dir, "vec_id").isEmpty)

    // deliveries through the re-bucketed map converge to from-scratch:
    // move one id to its successor's vector, delete another
    val mv = emb.as("a").where($"a.vec_id" === 7L)
      .join(emb.as("b"), $"b.vec_id" === $"a.vec_id" + 1L)
      .select($"a.vec_id".as("vec_id"), $"b.embedding".as("embedding"),
        lit("U").as("op"))
      .unionByName(emb.where($"vec_id" === 100L)
        .select($"vec_id", $"embedding", lit("D").as("op")))
    Similarity.updateIvfIndex(spark, mv, cents, "vec_id", "embedding",
      "cid", "op", dir, "grow_u1")
    val merged = emb.where($"vec_id" =!= 100L).as("e")
      .join(mv.where($"op" === "U")
        .select($"vec_id", $"embedding".as("ne")), Seq("vec_id"), "left")
      .select($"vec_id", coalesce($"ne", $"embedding").as("embedding"))
    val wantAfter = Similarity.ivfAssign(merged, cents, "vec_id", "embedding", "cid")
      .select($"vec_id", $"cluster".cast("long").as("cluster"))
      .as[(Long, Long)].collect().toSet
    val gotAfter = spark.read.parquet(dir)
      .select($"vec_id", $"cluster".cast("long").as("cluster"))
      .as[(Long, Long)].collect().toSet
    assert(gotAfter == wantAfter,
      "post-re-bucket delivery must equal the from-scratch assignment")
    assert(mapPairs(dir).toSet == wantAfter, "map must track the delivery")
  }

  test("the EmbedDedupStream cadence drives the re-bucket (maintainEvery hook)") {
    val root = java.nio.file.Files.createTempDirectory("embgrow").toString
    val (cleanDir, idxDir) = (s"$root/clean", s"$root/idx")
    // threshold > 1 disables dedup entirely (cosine <= 1): every row
    // survives to the index append — the test exercises the cadence
    def mk(lo: Int, hi: Int) = spark.range(lo, hi).select($"id".as("vec_id"),
      expr("transform(sequence(1, 8), i -> CAST(CASE WHEN i = 1 + int(id % 8) " +
        "THEN 1.0 + id / 1000.0 ELSE id / 10000.0 END AS FLOAT))").as("embedding"))
    val cs = mk(0, 4).select($"vec_id".as("cid"), $"embedding").localCheckpoint(true)
    // batch 0 seeds a small index; its map is built at 2 rows/bucket
    EmbedDedupStream.ingestBatch(mk(0, 40), 0L, cleanDir, idxDir, cs,
      "vec_id", "embedding", "cid", threshold = 1.1, maxClusterSize = 10000,
      heavyBits = 6, heavyMaxBucketSize = 1000, maintainEvery = 1)
    Similarity.buildIvfIdMap(spark, idxDir, "vec_id", rowsPerBucket = 2L)
    val n0 = metaTokens(idxDir)(0).toInt
    assert(n0 == 21, s"40 rows at 2/bucket build 21 buckets, got $n0")
    // batch 1 grows the index past 2 x 21 x 2 = 84 live rows; the
    // cadence hook must re-bucket without any explicit maintenance call
    EmbedDedupStream.ingestBatch(mk(40, 400), 1L, cleanDir, idxDir, cs,
      "vec_id", "embedding", "cid", threshold = 1.1, maxClusterSize = 10000,
      heavyBits = 6, heavyMaxBucketSize = 1000, maintainEvery = 1)
    assert(metaTokens(idxDir)(0).toInt > 2 * n0,
      s"stream cadence must re-bucket the grown map, meta=${metaTokens(idxDir).toSeq}")
    // map still exact: mirrors the index one-row-per-id
    val pairs = mapPairs(idxDir)
    val idx = spark.read.parquet(idxDir)
      .select($"vec_id", $"cluster".cast("long").as("cluster"))
      .as[(Long, Long)].collect().toSet
    assert(pairs.size == pairs.toSet.size && pairs.toSet == idx)
  }
}
