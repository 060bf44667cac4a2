package graft.tools
import org.apache.spark.sql.SparkSession
import graft.SparkEntry
object ProfileBenchLike {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4")
      .config("spark.sql.adaptive.enabled","true")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def run(n: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, dir).write.format("noop").mode("overwrite").save()
      (System.nanoTime()-t0)/1e9
    }
    // mimic bench: warmup, then sorted prefix up to dedup_minhash_lsh
    run("rel_distinct")
    Seq("cdc_impacted_keys","cdc_insert_only","cdc_merge","cdc_schema_evolution",
        "cdc_sequence","dedup_exact").foreach(n => println(f"$n: ${run(n)}%.2f"))
    println(f"dedup_minhash_lsh r1: ${run("dedup_minhash_lsh")}%.2f")
    println(f"dedup_minhash_lsh r2: ${run("dedup_minhash_lsh")}%.2f")
    println("cached: " + spark.sharedState.cacheManager.isEmpty)
    spark.stop()
  }
}
