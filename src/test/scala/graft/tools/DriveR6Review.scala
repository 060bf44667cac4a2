package graft.tools

import graft.ops.{Dedup, Multimodal}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch drive for the round-6 review fixes: NULL-payload exclusion in
  * media exact dedup, and the shared estJaccard/cappedSketches helpers
  * behind all three LSH candidate entry points, over real testdata. */
object DriveR6Review {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]").appName("drive-r6-review")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false)
      .getOrCreate()
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

    // 1. exactDedup over a media table with a NULL payload injected.
    val media = Multimodal.mediaFromDocuments(docs, "doc_id", "text")
      .unionByName(Seq((900001L, "image"), (900002L, "image"))
        .toDF("media_id", "kind")
        .withColumn("payload", lit(null).cast("binary")))
    val groups = Multimodal.exactDedup(media)
    val nRows = groups.count()
    val nullGroups = groups.where(col("payload_md5").isNull).count()
    val nDocs = docs.count()
    println(s"expect groups=$nDocs (every payload distinct, nulls excluded), got=$nRows")
    println(s"expect null-hash groups=0, got=$nullGroups")

    // 2. Self-join LSH candidates (shared helpers) on the real corpus.
    val self = Dedup.lshCandidatePairs(docs, "doc_id", "text")
    val selfN = self.count()
    val estOk = self.where(col("est_jaccard") < 0 || col("est_jaccard") > 1).count()
    println(s"expect self-join candidates>0, got=$selfN; out-of-range est_jaccard=$estOk (expect 0)")

    // 3. Cross-corpus candidates: evens vs odds of the same corpus — every
    //    pair must be oriented even->odd and carry a sane estimate.
    val cross = Dedup.crossCorpusCandidates(
      docs.where(col("doc_id") % 2 === 0), docs.where(col("doc_id") % 2 === 1),
      "doc_id", "text")
    val crossN = cross.count()
    val badOrient = cross.where(col("id_a") % 2 =!= 0 || col("id_b") % 2 =!= 1).count()
    println(s"cross-corpus candidates=$crossN; mis-oriented=$badOrient (expect 0)")

    spark.stop()
  }
}
