package graft.tools

import graft.ops.{Decontaminate, TextAnalysis}
import graft.streaming.CurationStream
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Scratch end-to-end driver (test scope): CurationStream with the
  * decontamination gate over REAL testdata documents, through a REAL
  * file stream (readStream → gates → clean dir), then expect-vs-got
  * against the batch-operator composition of the same gates. */
object DriveCurationDecon {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    // Eval suite: every 25th doc — wide enough that real corpus docs hit it.
    val bench = docs.where(col("doc_id") % 25 === 0)
      .select(col("doc_id").as("bench_id"), col("text"))

    val raw = Files.createTempDirectory("deconRaw").toString
    val clean = Files.createTempDirectory("deconClean").toString + "/t"
    val ckpt = Files.createTempDirectory("deconCkpt").toString
    val idx = s"drive_decon_idx_${System.nanoTime()}"
    docs.coalesce(1).write.mode(SaveMode.Overwrite).parquet(raw)

    val q = CurationStream.start(spark, raw, clean, idx, "doc_id", "text",
      ckpt, maxDupRate = 0.7, spanN = 3, buckets = 4, minWords = 30,
      bench = Some(bench), benchTextCol = "text", benchShingleWords = 3,
      maxOverlapFrac = 0.5)
    q.awaitTermination()

    val got = CurationStream.readClean(spark, clean)
      .select("doc_id").as[Long].collect().toSet

    // Batch-side expectation: gopher pass ∧ NOT contaminated ∧ span gate.
    val gopher = TextAnalysis.gopherRules(docs, "doc_id", "text", minWords = 30)
      .where(col("pass")).select("doc_id")
    val ruled = docs.join(gopher, Seq("doc_id"), "left_semi")
    val deconOk = Decontaminate.contaminationScores(ruled, "doc_id", "text",
      bench, "text", shingleWords = 3, threshold = 0.5)
      .where(!col("contaminated")).select("doc_id")
    val gated = ruled.join(deconOk, Seq("doc_id"), "left_semi")
    val expect = TextAnalysis.spanDupRate(gated, "doc_id", "text", n = 3)
      .where(col("dup_rate") <= 0.7).select("doc_id").as[Long].collect().toSet

    val benchCopies = docs.where(col("doc_id") % 25 === 0)
      .select("doc_id").as[Long].collect().toSet
    println(s"[drive] corpus=${docs.count()} bench=${benchCopies.size} " +
      s"clean=${got.size} expect=${expect.size}")
    println(s"[drive] expect==got: ${expect == got}")
    println(s"[drive] bench verbatim copies all dropped: " +
      s"${got.intersect(benchCopies).isEmpty}")
    spark.sql(s"DROP TABLE IF EXISTS $idx")
    assert(expect == got, "stream ≠ batch composition")
    assert(got.intersect(benchCopies).isEmpty, "a bench copy leaked through")
    println("[drive] OK")
    spark.stop()
  }
}
