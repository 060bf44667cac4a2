package graft.tools
import org.apache.spark.sql.SparkSession
object ProfileSpan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$tag: ${(System.nanoTime()-t0)/1e9}%.2fs")
    }
    // warm
    graft.ops.TextAnalysis.spanDupRate(d, "doc_id", "text", 3).write.format("noop").mode("overwrite").save()
    time("spanDupRate")(graft.ops.TextAnalysis.spanDupRate(d, "doc_id", "text", 3).write.format("noop").mode("overwrite").save())
    time("spanHashes only")(graft.ops.TextAnalysis.spanHashes(d, "doc_id", "text", 3).write.format("noop").mode("overwrite").save())
    import org.apache.spark.sql.functions._
    time("shingles no hash")(d.select(col("doc_id"), graft.functions.TextFunctions.tokens(col("text")).as("__toks"))
      .select(col("doc_id"), explode(graft.functions.TextFunctions.wordShingles(col("__toks"), 3)).as("__g"))
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
