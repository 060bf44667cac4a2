package graft.tools

import graft.ops.Similarity
import graft.streaming.EmbedDedupStream
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Scratch end-to-end driver (test scope): EmbedDedupStream over REAL
  * testdata embeddings through a REAL file stream — two deliveries, the
  * second containing re-deliveries of first-delivery vectors (forced
  * cross-index drops) plus fresh ones, then expect-vs-got against the
  * batch operator composition. */
object DriveEmbedDedup {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    val cents = emb.where(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding"))

    val d1 = emb.where(col("vec_id") < 300)
    // delivery 2: 100 fresh vectors + 50 verbatim re-deliveries of
    // delivery-1 vectors under new ids (cosine 1.0 → certain drops)
    val redelivered = emb.where(col("vec_id") < 50)
      .select((col("vec_id") + 10000L).as("vec_id"), col("embedding"))
    val d2 = emb.where(col("vec_id") >= 300 && col("vec_id") < 400)
      .unionByName(redelivered)

    val in = Files.createTempDirectory("edeIn").toString + "/t"
    val clean = Files.createTempDirectory("edeClean").toString + "/t"
    val idx = Files.createTempDirectory("edeIdx").toString + "/t"
    val ckpt = Files.createTempDirectory("edeCkpt").toString
    def start() = EmbedDedupStream.start(spark, in, clean, idx, cents,
      "vec_id", "embedding", "cid", checkpoint = ckpt, threshold = 0.4)

    d1.coalesce(1).write.mode(SaveMode.Append).parquet(in)
    start().awaitTermination()
    d2.coalesce(1).write.mode(SaveMode.Append).parquet(in)
    start().awaitTermination()
    val got = EmbedDedupStream.readClean(spark, clean)
      .select("vec_id").as[Long].collect().toSet

    // batch expectation: semDedup(d1); then d2 pruned intra-delivery,
    // minus rows with a >=threshold neighbor among d1's survivors
    // (same cluster — the SemDeDup contract).
    val keep1 = Similarity.semDedup(d1, cents, "vec_id", "embedding", "cid", 0.4)
      .select("vec_id")
    val a1 = Similarity.ivfAssign(d1, cents, "vec_id", "embedding", "cid")
      .join(keep1, Seq("vec_id"), "left_semi")
      .select(col("vec_id").as("__id_c"), col("embedding").as("__vc"), col("cluster"))
    val keep2intra = Similarity.semDedup(d2, cents, "vec_id", "embedding", "cid", 0.4)
      .select("vec_id")
    val a2 = Similarity.ivfAssign(d2, cents, "vec_id", "embedding", "cid")
      .join(keep2intra, Seq("vec_id"), "left_semi")
      .select(col("vec_id"), col("embedding"), col("cluster"))
    val crossLosers = a2.join(a1, Seq("cluster"))
      .where(col("vec_id") =!= col("__id_c"))
      .where(graft.functions.VectorFunctions.cosine(col("embedding"), col("__vc")) >= 0.4)
      .select("vec_id").distinct()
    val keep2 = a2.join(crossLosers, Seq("vec_id"), "left_anti").select("vec_id")
    val expect = (keep1.as[Long].collect() ++ keep2.as[Long].collect()).toSet

    val redelIds = (0L until 50L).map(_ + 10000L).toSet
    println(s"[drive] d1=${d1.count()} d2=${d2.count()} clean=${got.size} expect=${expect.size}")
    println(s"[drive] expect==got: ${expect == got}")
    println(s"[drive] verbatim re-deliveries all dropped: ${got.intersect(redelIds).isEmpty}")
    assert(expect == got, "stream ≠ batch composition")
    assert(got.intersect(redelIds).isEmpty, "a verbatim re-delivery leaked through")
    println("[drive] OK")
    spark.stop()
  }
}
