package graft.tools
import org.apache.spark.sql.SparkSession
import graft.ops.Dedup
object ProfileClusters {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = spark.read.parquet(sys.env.getOrElse("PROF_SF","/root/testdata/sf0.01") + "/documents.parquet")
    val t0 = System.nanoTime()
    val pairs = Dedup.simHashPairs(d, "doc_id", "text", 3)
    println("pairs: " + pairs.count() + f" (${(System.nanoTime()-t0)/1e9}%.1f s)")
    val t1 = System.nanoTime()
    val clusters = Dedup.simHashClusters(d, "doc_id", "text", 3)
    val n = clusters.count()
    val keeps = clusters.filter(org.apache.spark.sql.functions.col("keep")).count()
    println(f"clusters rows=$n keeps=$keeps (${(System.nanoTime()-t1)/1e9}%.1f s)")
    spark.stop()
  }
}
