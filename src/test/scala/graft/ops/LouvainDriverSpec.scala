package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The driver-side hierarchy path ([[Dedup.communitiesLocal]] under the
  * localThreshold gate → [[Similarity.louvainHierarchyDriver]]) must be
  * LABEL-IDENTICAL to the distributed level engine — same move rule,
  * tie-breaks, per-component m, round bound, coarsening — or the
  * refresh splice law silently breaks when a graph crosses the gate. */
class LouvainDriverSpec extends SparkSpec {
  import spark.implicits._

  private def rows(df: DataFrame): Set[(Long, Long, Long, Long)] =
    df.select("doc_id", "comp", "comm1", "comm2")
      .as[(Long, Long, Long, Long)].collect().toSet

  test("driver hierarchy == distributed hierarchy on real candidate pairs") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val pairs = Dedup.lshCandidatePairs(docs, "doc_id", "text")
      .localCheckpoint(true)
    assert(pairs.count() > 50, "fixture must produce a non-trivial graph")
    val viaDriver = rows(Dedup.communitiesLocal(pairs))
    val viaCluster = rows(Dedup.communitiesLocal(pairs, localThreshold = -1L))
    assert(viaDriver == viaCluster && viaDriver.nonEmpty)
  }

  test("driver hierarchy == distributed on seeded random graphs (property sweep)") {
    // deterministic LCG so the sweep is reproducible; mixes densities,
    // multi-component splits and threshold strata (est in {4..16}/16)
    var state = 0x9e3779b97f4a7c15L
    def next(bound: Int): Int = {
      state = state * 6364136223846793005L + 1442695040888963407L
      (((state >>> 33) % bound + bound) % bound).toInt
    }
    for (case_ <- 1 to 6) {
      val nodes = 8 + next(30)
      val nEdges = nodes + next(3 * nodes)
      val pairs = (1 to nEdges).flatMap { _ =>
        val a = next(nodes).toLong; val b = next(nodes).toLong
        if (a == b) None
        else Some((math.min(a, b), math.max(a, b), (4 + next(13)) / 16.0))
      }.distinct
      if (pairs.nonEmpty) {
        val df = pairs.toDF("id_a", "id_b", "est_jaccard").localCheckpoint(true)
        val viaDriver = rows(Dedup.communitiesLocal(df))
        val viaCluster = rows(Dedup.communitiesLocal(df, localThreshold = -1L))
        assert(viaDriver == viaCluster,
          s"case $case_ diverged (nodes=$nodes edges=${pairs.size})")
      }
    }
  }

  test("driver hierarchy == distributed on an adversarial synthetic graph " +
      "(multi-component, chain + clique + self-coarsened loops)") {
    // two components: a 6-clique chained to a path (forces moves + a
    // second level with self-loops), and a separate triangle pair
    val clique = for (a <- 1L to 6L; b <- (a + 1) to 6L) yield (a, b, 1.0)
    val chain = Seq((6L, 7L, 0.3), (7L, 8L, 0.3), (8L, 9L, 0.3), (9L, 10L, 0.3))
    val tri = Seq((20L, 21L, 1.0), (21L, 22L, 1.0), (20L, 22L, 1.0),
      (22L, 23L, 0.3), (23L, 24L, 0.9), (24L, 25L, 0.9), (23L, 25L, 0.9))
    val pairs = (clique ++ chain ++ tri)
      .toDF("id_a", "id_b", "est_jaccard").localCheckpoint(true)
    val viaDriver = rows(Dedup.communitiesLocal(pairs))
    val viaCluster = rows(Dedup.communitiesLocal(pairs, localThreshold = -1L))
    assert(viaDriver == viaCluster && viaDriver.nonEmpty)
  }

  // ---- GLOBAL-m gate (Similarity.louvainLevels): with a constant compOf
  // ---- the driver mirror's per-component m IS the global m, so the gate
  // ---- must be label-identical to the distributed louvainLabels chain
  private def levelsRows(df: DataFrame): Set[(Long, Long, Long)] =
    df.select("vec_id", "comm1", "comm2")
      .as[(Long, Long, Long)].collect().toSet

  private def egSeed(pairs: DataFrame): (DataFrame, DataFrame) = {
    val eg = pairs.where(col("est_jaccard") >= 0.25)
      .select(col("id_a").as("a"), col("id_b").as("b")).distinct()
    val hi = pairs.where(col("est_jaccard") >= 0.75)
      .select(col("id_a").as("a"), col("id_b").as("b")).distinct()
    val seed = Dedup.resolveClusters(hi, "a", "b")
      .select(col("id").as("n"), col("cluster").as("comm"))
    (eg, seed)
  }

  test("louvainLevels driver gate == distributed on real candidate pairs (global m)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val pairs = Dedup.lshCandidatePairs(docs, "doc_id", "text")
      .localCheckpoint(true)
    val (eg, seed) = egSeed(pairs)
    val viaDriver = levelsRows(Similarity.louvainLevels(eg, seed))
    val viaCluster = levelsRows(Similarity.louvainLevels(eg, seed, localThreshold = -1L))
    assert(viaDriver == viaCluster && viaDriver.nonEmpty)
  }

  test("louvainLevels driver gate == distributed on seeded random graphs (global m)") {
    var state = 0x51a3bc0e62d14b7dL
    def next(bound: Int): Int = {
      state = state * 6364136223846793005L + 1442695040888963407L
      (((state >>> 33) % bound + bound) % bound).toInt
    }
    for (case_ <- 1 to 6) {
      val nodes = 8 + next(30)
      val nEdges = nodes + next(3 * nodes)
      val pairs = (1 to nEdges).flatMap { _ =>
        val a = next(nodes).toLong; val b = next(nodes).toLong
        if (a == b) None
        else Some((math.min(a, b), math.max(a, b), (4 + next(13)) / 16.0))
      }.distinct
      if (pairs.nonEmpty) {
        val df = pairs.toDF("id_a", "id_b", "est_jaccard").localCheckpoint(true)
        val (eg, seed) = egSeed(df)
        val viaDriver = levelsRows(Similarity.louvainLevels(eg, seed))
        val viaCluster = levelsRows(Similarity.louvainLevels(eg, seed, localThreshold = -1L))
        assert(viaDriver == viaCluster,
          s"case $case_ diverged (nodes=$nodes edges=${pairs.size})")
      }
    }
  }

  test("louvainLevels gate preserves INT ids and skips string ids (global m)") {
    import org.apache.spark.sql.types.{IntegerType, StringType}
    val intEdges = Seq((1, 2), (2, 3), (10, 11), (3, 4), (1, 3)).toDF("a", "b")
    val intSeed = Seq((1, 1), (2, 1)).toDF("n", "comm")
    val viaDriver = Similarity.louvainLevels(intEdges, intSeed)
    val viaCluster = Similarity.louvainLevels(intEdges, intSeed, localThreshold = -1L)
    assert(viaDriver.schema("vec_id").dataType == IntegerType)
    assert(viaDriver.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      viaCluster.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    def asInt(df: DataFrame) = df.select("vec_id", "comm1", "comm2")
      .as[(Int, Int, Int)].collect().toSet
    assert(asInt(viaDriver) == asInt(viaCluster) && asInt(viaDriver).nonEmpty)
    val strEdges = Seq(("d1", "d2"), ("d2", "d3")).toDF("a", "b")
    val strSeed = Seq(("d1", "d1")).toDF("n", "comm")
    val viaGate = Similarity.louvainLevels(strEdges, strSeed)
    assert(viaGate.schema("vec_id").dataType == StringType)
    val got = viaGate.select("vec_id", "comm1", "comm2")
      .as[(String, String, String)].collect().toSet
    val want = Similarity.louvainLevels(strEdges, strSeed, localThreshold = -1L)
      .select("vec_id", "comm1", "comm2")
      .as[(String, String, String)].collect().toSet
    assert(got == want && got.nonEmpty)
  }

  // ---- MOVE-ROUND gate (Similarity.louvainMoveRound): one synchronized
  // ---- local-move round with global m — the driver mirror must be
  // ---- row-identical to the distributed chain (same components, links,
  // ---- exact-LONG gains, tie-breaks)
  private def moveRows(df: DataFrame): Set[(Long, Long, Long, Boolean)] =
    df.select("vec_id", "old_comm", "new_comm", "moved")
      .as[(Long, Long, Long, Boolean)].collect().toSet

  test("louvainMoveRound driver gate == distributed on the real mutual-kNN backbone") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val mut = Similarity.mutualKnn(
        Similarity.knnGraph(e, "vec_id", "embedding",
          k = 3, bits = 6, maxBucketSize = 1000))
      .localCheckpoint(true)
    assert(mut.count() > 50, "fixture must produce a non-trivial backbone")
    val viaDriver = moveRows(Similarity.louvainMoveRound(mut))
    val viaCluster = moveRows(Similarity.louvainMoveRound(mut, localThreshold = -1L))
    assert(viaDriver == viaCluster && viaDriver.nonEmpty)
    assert(viaDriver.exists(_._4), "sentinel: some node must move")
  }

  test("louvainMoveRound driver gate == distributed on seeded random backbones") {
    var state = 0x2545f4914f6cdd1dL
    def next(bound: Int): Int = {
      state = state * 6364136223846793005L + 1442695040888963407L
      (((state >>> 33) % bound + bound) % bound).toInt
    }
    for (case_ <- 1 to 6) {
      val nodes = 8 + next(30)
      val nEdges = nodes + next(3 * nodes)
      // symmetric duplicates included on purpose: mutualKnn emits both
      // directions and the canonicalize-distinct must fold them equally
      // on both paths
      val pairs = (1 to nEdges).flatMap { _ =>
        val a = next(nodes).toLong; val b = next(nodes).toLong
        val cos = (4 + next(13)) / 16.0
        if (a == b) Nil else Seq((a, b, cos), (b, a, cos))
      }
      if (pairs.nonEmpty) {
        val df = pairs.toDF("src", "dst", "cos").localCheckpoint(true)
        val viaDriver = moveRows(Similarity.louvainMoveRound(df))
        val viaCluster = moveRows(Similarity.louvainMoveRound(df, localThreshold = -1L))
        assert(viaDriver == viaCluster,
          s"case $case_ diverged (nodes=$nodes edges=${pairs.size})")
      }
    }
  }

  test("louvainMoveRound gate preserves INT ids and skips string ids") {
    import org.apache.spark.sql.types.{IntegerType, StringType}
    val intEdges = Seq((1, 2, 0.9), (2, 3, 0.3), (3, 4, 0.9), (10, 11, 0.9))
      .flatMap { case (a, b, c) => Seq((a, b, c), (b, a, c)) }
      .toDF("src", "dst", "cos")
    val viaDriver = Similarity.louvainMoveRound(intEdges)
    val viaCluster = Similarity.louvainMoveRound(intEdges, localThreshold = -1L)
    assert(viaDriver.schema("vec_id").dataType == IntegerType)
    assert(viaDriver.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      viaCluster.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    def asInt(df: DataFrame) = df.select("vec_id", "old_comm", "new_comm", "moved")
      .as[(Int, Int, Int, Boolean)].collect().toSet
    assert(asInt(viaDriver) == asInt(viaCluster) && asInt(viaDriver).nonEmpty)
    val strEdges = Seq(("d1", "d2", 0.9), ("d2", "d3", 0.4))
      .toDF("src", "dst", "cos")
    val viaGate = Similarity.louvainMoveRound(strEdges)
    assert(viaGate.schema("vec_id").dataType == StringType)
    val got = viaGate.select("vec_id", "old_comm", "new_comm", "moved")
      .as[(String, String, String, Boolean)].collect().toSet
    val want = Similarity.louvainMoveRound(strEdges, localThreshold = -1L)
      .select("vec_id", "old_comm", "new_comm", "moved")
      .as[(String, String, String, Boolean)].collect().toSet
    assert(got == want && got.nonEmpty)
  }

  test("the driver gate preserves non-long INTEGRAL id types and skips non-integral ids") {
    import org.apache.spark.sql.types.{IntegerType, StringType}
    val edges = Seq((1, 2, 1.0), (2, 3, 1.0), (10, 11, 0.9))
    // INT ids: driver path fires (under the threshold) and must keep
    // IntegerType end-to-end — labels are min-ids, so the cast back is
    // lossless and the schema matches the type-generic distributed path
    val intPairs = edges.toDF("id_a", "id_b", "est_jaccard").localCheckpoint(true)
    val viaDriver = Dedup.communitiesLocal(intPairs)
    val viaCluster = Dedup.communitiesLocal(intPairs, localThreshold = -1L)
    assert(viaDriver.schema("doc_id").dataType == IntegerType,
      s"driver gate must preserve IntegerType ids, got ${viaDriver.schema}")
    assert(viaDriver.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      viaCluster.schema.fields.map(f => (f.name, f.dataType)).toSeq,
      "gate must be column-type-invisible against the distributed path")
    def asInt(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "comp", "comm1", "comm2")
        .as[(Int, Int, Int, Int)].collect().toSet
    assert(asInt(viaDriver) == asInt(viaCluster) && asInt(viaDriver).nonEmpty)
    // STRING ids: the Long-typed driver engine cannot hold them — the
    // gate must fall through to the distributed path (no runtime cast
    // crash, StringType preserved) even under the threshold
    val strPairs = edges.map { case (a, b, j) => (s"d$a", s"d$b", j) }
      .toDF("id_a", "id_b", "est_jaccard").localCheckpoint(true)
    val viaGate = Dedup.communitiesLocal(strPairs)
    assert(viaGate.schema.fields.take(4).forall(_.dataType == StringType),
      s"string ids must keep StringType, got ${viaGate.schema}")
    val got = viaGate.select("doc_id", "comp", "comm1", "comm2")
      .as[(String, String, String, String)].collect().toSet
    val want = Dedup.communitiesLocal(strPairs, localThreshold = -1L)
      .select("doc_id", "comp", "comm1", "comm2")
      .as[(String, String, String, String)].collect().toSet
    assert(got == want && got.nonEmpty,
      "string-id graphs must solve identically through the fallback")
  }
}
