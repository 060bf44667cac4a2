package graft.tools
import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Time named queries bench-style (noop sink, best of two). */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    if (!sys.env.contains("SPARK_GRAFT_NO_RULES"))
      graft.plans.GraftOptimizations.install(spark)
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def run(n: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, dir).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      dt
    }
    run("rel_distinct") // warmup
    args.foreach(n => println(f"[time] $n: ${math.min(run(n), run(n))}%.2f s"))
    spark.stop()
  }
}
