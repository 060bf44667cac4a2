package graft.streaming

import graft.SparkSpec
import graft.ops.Sketches
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Streaming sketch profile: per-delivery register/cell appends must
  * fold (losslessly, by the merge laws) into exactly the single-pass
  * sketch over everything ingested; replays no-op. */
class SketchStreamSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet").localCheckpoint(true)
  private def terms(d: DataFrame) = d.select(col("doc_id"), col("source"),
    explode(graft.functions.TextFunctions.tokens(col("text"))).as("term"))

  private def hllSet(df: DataFrame): Set[(String, Long, Double)] =
    df.select(col("source"), col("n_buckets_set"), col("hll_distinct"))
      .as[(String, Long, Double)].collect().toSet
  private def cmsSet(df: DataFrame): Set[(String, Long)] =
    df.as[(String, Long)].collect().toSet

  private lazy val watch = graft.functions.TextFunctions.StopwordsEn.toDF("term")

  test("file stream end-to-end: merged profile ≡ single pass over the union; replay no-ops") {
    val t = "sketch_stream_spec"
    val in = Files.createTempDirectory("skIn").toString + "/t"
    val ckpt = Files.createTempDirectory("skCkpt").toString
    def run() = SketchStream.start(spark, in, t, Seq("source"), "term",
      checkpoint = ckpt).awaitTermination()
    terms(docs.where($"doc_id" % 2 === 0L)).coalesce(1)
      .write.mode("append").parquet(in)
    run()
    terms(docs.where($"doc_id" % 2 === 1L)).coalesce(1)
      .write.mode("append").parquet(in)
    run()
    val all = terms(docs)
    assert(hllSet(SketchStream.readDistinctProfile(spark, t, Seq("source"))) ==
      hllSet(Sketches.hllDistinct(all, Seq("source"), "term", m = 64)))
    assert(cmsSet(SketchStream.readTermCounts(spark, t, watch, "term")) ==
      cmsSet(Sketches.cmsEstimate(
        Sketches.cmsBuild(all, "term", 4, 256), watch, "term", 4, 256)))
    // replayed batch id: no double counting (CMS would over-count loudly)
    SketchStream.ingestBatch(terms(docs.where($"doc_id" % 2 === 1L)), "b1",
      t, Seq("source"), "term", 64, 4, 256)
    assert(cmsSet(SketchStream.readTermCounts(spark, t, watch, "term")) ==
      cmsSet(Sketches.cmsEstimate(
        Sketches.cmsBuild(all, "term", 4, 256), watch, "term", 4, 256)))
  }

  test("sliding distinct over stream-maintained registers ≡ the batch sliding estimate") {
    val t = "sliding_stream_spec"
    val in = Files.createTempDirectory("slIn").toString + "/t"
    val ckpt = Files.createTempDirectory("slCkpt").toString
    // events framed by pseudo-hour; deliveries split mid-frame so the
    // sliding answer NEEDS the cross-delivery register merge
    def framed(d: DataFrame) = d.select(
      (col("doc_id") % 5L).as("hour"),
      concat(lit("u"), (col("doc_id") % 97L).cast("string")).as("uid"))
    framed(docs.where($"doc_id" % 2 === 0L)).coalesce(1)
      .write.mode("append").parquet(in)
    SketchStream.start(spark, in, t, Seq("hour"), "uid", checkpoint = ckpt)
      .awaitTermination()
    framed(docs.where($"doc_id" % 2 === 1L)).coalesce(1)
      .write.mode("append").parquet(in)
    SketchStream.start(spark, in, t, Seq("hour"), "uid", checkpoint = ckpt)
      .awaitTermination()
    val streamed = SketchStream.readSlidingDistinct(spark, t, "hour", trailing = 3L)
      .select(col("hour"), col("n_buckets_set"), col("hll_distinct"))
      .collect().map(_.toString).toSet
    val batch = Sketches.hllSlidingEstimate(
      Sketches.hllRegisters(framed(docs), Seq("hour"), "uid", m = 64),
      "hour", trailing = 3L, m = 64)
      .select(col("hour"), col("n_buckets_set"), col("hll_distinct"))
      .collect().map(_.toString).toSet
    assert(streamed == batch)
  }

  test("quantile sketch ingest: per-delivery samples fold to the single-pass sketch; replay no-ops") {
    val t = "qsketch_stream_spec"
    val in = Files.createTempDirectory("qskIn").toString + "/t"
    val ckpt = Files.createTempDirectory("qskCkpt").toString
    def lens(d: DataFrame) = d.select(col("source"), col("doc_id"),
      size(graft.functions.TextFunctions.tokens(col("text"))).cast("long").as("v"))
    def run() = SketchStream.startQuantiles(spark, in, t, Seq("source"),
      "doc_id", "v", checkpoint = ckpt, k = 64).awaitTermination()
    lens(docs.where($"doc_id" % 2 === 0L)).coalesce(1)
      .write.mode("append").parquet(in)
    run()
    lens(docs.where($"doc_id" % 2 === 1L)).coalesce(1)
      .write.mode("append").parquet(in)
    run()
    val probs = Seq((1, 4), (1, 2), (3, 4))
    def qset(df: DataFrame) = df
      .select(col("source"), col("q"), col("n_sample"), col("q_value"))
      .as[(String, Double, Long, Long)].collect().toSet
    val streamed = qset(SketchStream.readQuantiles(spark, t, Seq("source"), probs, k = 64))
    val single = qset(Sketches.quantiles(lens(docs), Seq("source"),
      "doc_id", "v", probs, k = 64))
    assert(streamed == single)
    // replayed delivery: ledger gate no-ops (a double sample would
    // change n_sample for under-k groups)
    SketchStream.ingestQuantileBatch(lens(docs.where($"doc_id" % 2 === 1L)),
      "b1", t, Seq("source"), "doc_id", "v", k = 64)
    assert(qset(SketchStream.readQuantiles(spark, t, Seq("source"), probs, k = 64)) == single)
    (Seq(t + "_qsk", graft.io.SegmentedIndex.ledgerTable(t + "_qsk")))
      .foreach(x => spark.sql(s"DROP TABLE IF EXISTS $x"))
  }

  test("top-k gate: per-delivery winners fold to the single-pass top-k; replay no-ops") {
    val t = "topk_stream_spec"
    val in = Files.createTempDirectory("tpkIn").toString + "/t"
    val ckpt = Files.createTempDirectory("tpkCkpt").toString
    def lens(d: DataFrame) = d.select(col("source"), col("doc_id"),
      size(graft.functions.TextFunctions.tokens(col("text"))).cast("long").as("v"))
    val keys = Seq("v" -> false, "doc_id" -> true)
    def run() = SketchStream.startTopK(spark, in, t, Seq("source"), keys,
      checkpoint = ckpt, k = 3).awaitTermination()
    lens(docs.where($"doc_id" % 2 === 0L)).coalesce(1)
      .write.mode("append").parquet(in)
    run()
    lens(docs.where($"doc_id" % 2 === 1L)).coalesce(1)
      .write.mode("append").parquet(in)
    run()
    def tset(df: DataFrame) = df
      .select(col("source"), col("rank"), col("v"), col("doc_id"))
      .as[(String, Long, Long, Long)].collect().toSet
    val streamed = tset(SketchStream.readTopK(spark, t, Seq("source"), keys, k = 3))
    // single-pass truth: the window formulation over the union
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("v").desc, col("doc_id"))
    val single = tset(lens(docs)
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= 3))
    assert(streamed == single)
    // replayed delivery: ledger gate no-ops (duplicated winner rows
    // would double-place ties and shift ranks)
    SketchStream.ingestTopKBatch(lens(docs.where($"doc_id" % 2 === 1L)),
      "b1", t, Seq("source"), keys, k = 3)
    assert(tset(SketchStream.readTopK(spark, t, Seq("source"), keys, k = 3)) == single)
    // state is winners-only: ≤ deliveries · groups · k rows persisted
    val stateRows = spark.table(t + "_tpk").count()
    val nGroups = docs.select("source").distinct().count()
    assert(stateRows <= 2 * nGroups * 3, s"state too big: $stateRows")
    (Seq(t + "_tpk", graft.io.SegmentedIndex.ledgerTable(t + "_tpk")))
      .foreach(x => spark.sql(s"DROP TABLE IF EXISTS $x"))
  }

  test("quantile gate shares a table name with the hll/cms gate without ledger collision") {
    val t = "sketch_shared_name"
    val half = terms(docs.where($"doc_id" % 2 === 0L)).localCheckpoint(true)
    SketchStream.ingestBatch(half, "b0", t, Seq("source"), "term", 64, 4, 256)
    val before = cmsSet(SketchStream.readTermCounts(spark, t, watch, "term"))
    // same table name, SAME batch id — a shared ledger would wipe the
    // hll/cms rows on bootstrap and then mask this delivery's id
    val lens = docs.select(col("source"), col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("v"))
    SketchStream.ingestQuantileBatch(lens, "b0", t, Seq("source"), "doc_id", "v", 64)
    assert(cmsSet(SketchStream.readTermCounts(spark, t, watch, "term")) == before,
      "hll/cms ledger must survive the quantile bootstrap")
    assert(SketchStream.readQuantiles(spark, t, Seq("source"), Seq((1, 2)), 64)
      .count() > 0, "the same batch id must not be masked across families")
    (Seq(t + "_hll", t + "_cms", t + "_qsk",
      graft.io.SegmentedIndex.ledgerTable(t),
      graft.io.SegmentedIndex.ledgerTable(t + "_qsk")))
      .foreach(x => spark.sql(s"DROP TABLE IF EXISTS $x"))
  }
}
