package graft.tools
import org.apache.spark.sql.{SparkSession, functions => F}
import graft.functions.TextFunctions._
import graft.expressions.TextSketches
import graft.ops.Dedup
object ProfileDedup {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"$label%-40s ${(System.nanoTime()-t0)/1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    time("read count")(d.count())
    time("fingerprint only")(d.select(fingerprint(F.col("text"))).write.format("noop").mode("overwrite").save())
    time("dedup exact")(Dedup.exact(d, "doc_id", "text").write.format("noop").mode("overwrite").save())
    time("dedup exact again")(Dedup.exact(d, "doc_id", "text").write.format("noop").mode("overwrite").save())
    time("tokens+shingles")(d.select(wordShingles(tokens(F.col("text")),3)).write.format("noop").mode("overwrite").save())
    time("minhash sig k=16")(d.select(TextSketches.minHashSignature(F.col("text"),16,3)).write.format("noop").mode("overwrite").save())
    time("simhash")(d.select(TextSketches.simHash32(F.col("text"))).write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
