package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Dedup

object ProfileJaccard {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    println("[prof] docs=" + d.count())
    val pairs = t("lshCandidatePairs+checkpoint") {
      Dedup.lshCandidatePairs(d, "doc_id", "text", 3, 16, 4, 1000)
        .select("id_a", "id_b").localCheckpoint(true)
    }
    println("[prof] pairs=" + pairs.count())
    t("ngramJaccard run1") {
      Dedup.ngramJaccard(d, pairs, "doc_id", "text", 3)
        .write.format("noop").mode("overwrite").save()
    }
    t("ngramJaccard run2") {
      Dedup.ngramJaccard(d, pairs, "doc_id", "text", 3)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
