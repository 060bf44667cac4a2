package graft.tools
import org.apache.spark.sql.SparkSession
import graft.SparkEntry

object ProfCorpus {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    graft.plans.GraftOptimizations.install(spark)
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def run(n: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, dir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    run("rel_distinct")
    for (i <- 1 to 6) println(f"[prof] run$i: ${run("text_corpus_report")}%.3f s")
    println(SparkEntry.queries("text_corpus_report")(spark, dir).queryExecution.executedPlan.toString.take(4000))
    spark.stop()
  }
}
