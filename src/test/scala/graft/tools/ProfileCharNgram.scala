package graft.tools
import graft.ops.Dedup
import graft.functions.TextFunctions.{charNgramsOf, jaccardDistinct, normalize}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProfileCharNgram {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$name: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    val d = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    var pairs: org.apache.spark.sql.DataFrame = null
    time("lshCandidatePairs construct (eager ckpt)") {
      pairs = Dedup.lshCandidatePairs(d, "doc_id", "text", 3, 16, 4, 1000).select("id_a", "id_b")
    }
    time("pairs.count")(println("  pairs=" + pairs.count()))
    val ids = pairs.select(col("id_a").as("doc_id"))
      .unionByName(pairs.select(col("id_b").as("doc_id"))).distinct()
    time("ids.count")(println("  ids=" + ids.count()))
    val ng = d.join(ids, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), normalize(col("text")).as("__t"))
      .select(col("doc_id"), array_distinct(charNgramsOf(col("__t"), 3)).as("ng"))
    time("ng noop")(ng.write.format("noop").mode("overwrite").save())
    val out = pairs
      .join(ng.select(col("doc_id").as("id_a"), col("ng").as("ng_a")), "id_a")
      .join(ng.select(col("doc_id").as("id_b"), col("ng").as("ng_b")), "id_b")
      .select(col("id_a"), col("id_b"), jaccardDistinct(col("ng_a"), col("ng_b")).as("jaccard"))
    time("full noop")(out.write.format("noop").mode("overwrite").save())
    time("full noop again")(out.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
