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
}
