package graft.streaming

import graft.SparkSpec
import graft.ops.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Incremental kNN-graph maintenance: the streamed graph must equal the
  * batch [[Similarity.knnGraph]] over the union corpus (exact — the
  * fixture stays under every bucket cap, so the documented LSH-recall
  * divergence never triggers), and maintenance must be exactly-once
  * under replay. */
class GraphStreamSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet").localCheckpoint(true)

  private val K = 5
  private val Bits = 6

  private def graphSet(df: DataFrame): Set[(Long, Long, Double, Long)] =
    df.select(col("src"), col("dst"), col("cos"), col("rank"))
      .as[(Long, Long, Double, Long)].collect().toSet

  private def append(chunk: DataFrame, table: String, batchId: String): Unit =
    Similarity.appendToKnnGraphIndex(spark, chunk, "vec_id", "embedding",
      table, buckets = 8, k = K, bits = Bits, maxBucketSize = 1000, batchId)

  test("maintained graph ≡ batch knnGraph over the union corpus; backbone matches") {
    val table = "knn_graph_spec_inc"
    val c1 = emb.where($"vec_id" % 3 === 0L)
    val c2 = emb.where($"vec_id" % 3 === 1L)
    val c3 = emb.where($"vec_id" % 3 === 2L)
    Similarity.buildKnnGraphIndex(c1, "vec_id", "embedding", table,
      buckets = 8, k = K, bits = Bits)
    append(c2, table, "b1")
    append(c3, table, "b2")
    val streamed = graphSet(Similarity.readKnnGraph(spark, table))
    val batch = graphSet(Similarity.knnGraph(emb, "vec_id", "embedding", K, Bits))
    assert(streamed == batch,
      s"streamed ${streamed.size} edges vs batch ${batch.size}; " +
        s"only-streamed=${(streamed -- batch).take(3)} only-batch=${(batch -- streamed).take(3)}")
    assert(graphSet(GraphStream.readBackbone(spark, table)) ==
      graphSet(Similarity.mutualKnn(Similarity.knnGraph(emb, "vec_id", "embedding", K, Bits))))
  }

  test("replayed delivery no-ops: graph and ledger unchanged (exactly-once)") {
    val table = "knn_graph_spec_replay"
    Similarity.buildKnnGraphIndex(emb.where($"vec_id" < 200L),
      "vec_id", "embedding", table, buckets = 8, k = K, bits = Bits)
    val extra = emb.where($"vec_id" >= 200L && $"vec_id" < 250L)
    append(extra, table, "b1")
    val once = graphSet(Similarity.readKnnGraph(spark, table))
    val ledgerOnce = graft.io.SegmentedIndex.ledger(spark, table).count()
    append(extra, table, "b1")
    assert(graphSet(Similarity.readKnnGraph(spark, table)) == once)
    assert(graft.io.SegmentedIndex.ledger(spark, table).count() == ledgerOnce)
    // compaction folds segments + tombstones away without changing the graph
    Similarity.compactKnnGraphIndex(spark, table, buckets = 8)
    assert(graphSet(Similarity.readKnnGraph(spark, table)) == once)
    assert(graft.io.SegmentedIndex.tombstones(spark, table).isEmpty)
    // and maintenance keeps working on the compacted index
    append(emb.where($"vec_id" >= 250L && $"vec_id" < 270L), table, "b2")
    assert(graphSet(Similarity.readKnnGraph(spark, table)) ==
      graphSet(Similarity.knnGraph(emb.where($"vec_id" < 270L),
        "vec_id", "embedding", K, Bits)))
  }

  test("update + delete: maintained graph ≡ fresh build over the merged corpus; replay no-ops") {
    val table = "knn_graph_spec_upd"
    Similarity.buildKnnGraphIndex(emb, "vec_id", "embedding", table,
      buckets = 8, k = K, bits = Bits)
    // move vectors ≡ 1 mod 9 onto their successor's embedding, delete
    // ≡ 4 mod 9 (the sim_ivf_after_update fixture), ghost-delete one
    val upd = emb.as("a").where($"a.vec_id" % 9 === 1L)
      .join(emb.as("b"), $"b.vec_id" === $"a.vec_id" + 1L)
      .select($"a.vec_id".as("vec_id"), $"b.embedding".as("embedding"),
        lit("U").as("op"))
    val dels = emb.where($"vec_id" % 9 === 4L)
      .select($"vec_id", $"embedding", lit("D").as("op"))
      .unionByName(Seq((99999999L, "D")).toDF("vec_id", "op")
        .withColumn("embedding", lit(null).cast(emb.schema("embedding").dataType))
        .select("vec_id", "embedding", "op"))
    val changes = upd.unionByName(dels).localCheckpoint(true)
    Similarity.updateKnnGraphIndex(spark, changes, "vec_id", "embedding",
      "op", table, buckets = 8, k = K, bits = Bits, maxBucketSize = 1000,
      batchId = "u1")
    val mergedCorpus = emb
      .join(changes.select("vec_id"), Seq("vec_id"), "left_anti")
      .select("vec_id", "embedding")
      .unionByName(upd.select("vec_id", "embedding"))
      .localCheckpoint(true)
    val expect = graphSet(Similarity.knnGraph(mergedCorpus, "vec_id", "embedding", K, Bits))
    val got = graphSet(Similarity.readKnnGraph(spark, table))
    assert(got == expect,
      s"got ${got.size} vs expect ${expect.size}; " +
        s"only-got=${(got -- expect).take(3)} only-expect=${(expect -- got).take(3)}")
    // replay no-ops
    Similarity.updateKnnGraphIndex(spark, changes, "vec_id", "embedding",
      "op", table, buckets = 8, k = K, bits = Bits, maxBucketSize = 1000,
      batchId = "u1")
    assert(graphSet(Similarity.readKnnGraph(spark, table)) == expect)
    // appends keep working after an update (and see the merged state)
    val extra = emb.select(($"vec_id" + 1000000L).as("vec_id"), $"embedding")
      .where($"vec_id" % 97 === 0L)
    append(extra, table, "b_after_upd")
    assert(graphSet(Similarity.readKnnGraph(spark, table)) ==
      graphSet(Similarity.knnGraph(mergedCorpus.unionByName(extra),
        "vec_id", "embedding", K, Bits)))
  }

  test("store probe rides the __bkt bucket layout: no store-side exchange") {
    val table = "knn_graph_spec_plan"
    Similarity.buildKnnGraphIndex(emb, "vec_id", "embedding", table,
      buckets = 8, k = K, bits = Bits)
    // the probe shape appendToKnnGraphIndex/updateKnnGraphIndex build:
    // broadcast probed-key semi-join + per-bucket cap window — both must
    // be satisfied by the store's bucketing, leaving NO __bkt exchange
    val keys = org.apache.spark.sql.functions.broadcast(
      Seq(1L, 2L, 3L).toDF("__bkt"))
    val probed = spark.table(table + "_vecs")
      .join(keys, Seq("__bkt"), "left_semi")
      .withColumn("__bn", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("__bkt")))
      .where(col("__bn") <= 1000)
    val plan = probed.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning(__bkt"),
      s"store must not exchange on __bkt:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"probe join must broadcast:\n$plan")
  }

  test("empty-corpus bootstrap + file stream end-to-end equals the batch graph") {
    val table = "knn_graph_spec_stream"
    val in = Files.createTempDirectory("gsIn").toString + "/t"
    val ckpt = Files.createTempDirectory("gsCkpt").toString
    Similarity.buildKnnGraphIndex(emb.limit(0), "vec_id", "embedding", table,
      buckets = 8, k = K, bits = Bits)
    def run() = GraphStream.start(spark, in, table, "vec_id", "embedding",
      buckets = 8, k = K, bits = Bits, checkpoint = ckpt).awaitTermination()
    val half1 = emb.where($"vec_id" % 2 === 0L)
    val half2 = emb.where($"vec_id" % 2 === 1L)
    half1.coalesce(1).write.mode("append").parquet(in)
    run()
    half2.coalesce(1).write.mode("append").parquet(in)
    run()
    val streamed = graphSet(GraphStream.readGraph(spark, table))
    val batch = graphSet(Similarity.knnGraph(emb, "vec_id", "embedding", K, Bits))
    assert(streamed == batch,
      s"streamed ${streamed.size} vs batch ${batch.size}; " +
        s"only-streamed=${(streamed -- batch).take(5)} only-batch=${(batch -- streamed).take(5)}")
  }
}
