package graft.tools
import graft.ops.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object CountPairs {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val pairs = Dedup.lshCandidatePairs(docs, "doc_id", "text", 3, 16, 4, 1000)
    println("PAIRS=" + pairs.count())
    val ids = pairs.select(col("id_a")).union(pairs.select(col("id_b"))).distinct()
    println("DOCS_IN_PAIRS=" + ids.count())
    val hashed = Dedup.minHashed(docs, "doc_id", "text", 3, 16, 4)
    val buckets = hashed.groupBy("band_key").count().orderBy(desc("count"))
    buckets.show(10, false)
    println("AVG_TEXT_LEN=" + docs.select(avg(length(col("text")))).head().getDouble(0))
    spark.stop()
  }
}
