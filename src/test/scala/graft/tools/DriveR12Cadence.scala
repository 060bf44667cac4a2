package graft.tools

import graft.ops.Retrieval
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch end-to-end driver (test scope), round-12: the maintainEvery
  * cadence on the BM25 CDC stream over REAL testdata documents. Splits
  * sf0.001 docs into 4 CDC deliveries with maintainEvery=2 and a segment
  * budget forced to trip, then expect-vs-got probes the maintained index
  * against a from-scratch bm25TopK over the full corpus. */
object DriveR12Cadence {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"), lit("I").as("op"))
    val t = s"bm25_r12_drive_${System.nanoTime()}"
    (0L to 3L).foreach { i =>
      val slice = docs.where(col("doc_id") % 4 === i)
      graft.streaming.RetrievalStream.cdcBatch(slice, i, t,
        "doc_id", "text", "op", buckets = 4,
        maintainEvery = 2, maxSegments = 1L)
      println(s"[info] delivery $i -> gen ${graft.io.SegmentedIndex.currentGen(spark, t)}")
    }
    val q = Seq((0L, "spark merge join"), (1L, "window sort batch stream"))
      .toDF("qid", "qtext")
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val got = key(Retrieval.bm25AgainstIndex(spark, t, q, "qid", "qtext", k = 5))
    val want = key(Retrieval.bm25TopK(docs, q, "doc_id", "text", "qid", "qtext", k = 5))
    println(s"[info] expect ${want.size} rows, got ${got.size} rows, " +
      s"match=${got == want}")
    require(got == want && got.nonEmpty, "maintained index != recompute")
    val gens = graft.io.SegmentedIndex.currentGen(spark, t)
    require(gens == 2L, s"expected 2 cadenced compactions, saw gen $gens")
    println("[info] DriveR12Cadence OK")
    spark.sql(s"SHOW TABLES LIKE '$t*'").collect()
      .foreach(r => spark.sql(s"DROP TABLE IF EXISTS ${r.getAs[String]("tableName")}"))
    spark.stop()
  }
}
