package graft.tools

import graft.functions.TextFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

object ProfileDsir {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def time(tag: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[dsir] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val toked = docs.select(col("doc_id"), tokens(normalize(col("text"))).as("__toks"))
    time("tokenize")(toked)
    val feats = toked.select(col("doc_id"),
      concat(col("__toks"),
        when(size(col("__toks")) < 2, typedLit(Array.empty[String]))
          .otherwise(wordShingles(col("__toks"), 2))).as("__feats"))
    time("shingle-concat")(feats)
    val expl = feats.select(col("doc_id"), explode(col("__feats")).as("__feat"))
    time("explode")(expl)
    val bucketed = expl.select(col("doc_id"), pmod(hash60(col("__feat")), lit(1024L)).as("bucket"))
    time("hash-bucket")(bucketed)
    time("per-doc-counts")(bucketed.groupBy("doc_id", "bucket").agg(count(lit(1)).as("c")))
    time("full")(graft.ops.Curation.dsirScores(docs,
      docs.where(col("source") === "src0"), "doc_id", "text", 1024))
    spark.stop()
  }
}
// appended second entry point: parallelism check
object ProfileDsir2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    println("[dsir2] input partitions: " + docs.rdd.getNumPartitions)
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[dsir2] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    time("warm")(docs.count(): Unit)
    time("full-1part")(graft.ops.Curation.dsirScores(docs,
      docs.where(org.apache.spark.sql.functions.col("source") === "src0"),
      "doc_id", "text", 1024).write.format("noop").mode("overwrite").save())
    val par = docs.repartition(32)
    time("full-32part")(graft.ops.Curation.dsirScores(par,
      par.where(org.apache.spark.sql.functions.col("source") === "src0"),
      "doc_id", "text", 1024).write.format("noop").mode("overwrite").save())
  }
}
