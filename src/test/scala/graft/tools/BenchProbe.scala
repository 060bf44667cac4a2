package graft.tools
import org.apache.spark.sql.SparkSession
import graft.SparkEntry
import scala.jdk.CollectionConverters._

/** Bench-shaped probe for the r11 drift investigation: ONE run per query
  * in bench (sorted) order, logging JIT code-cache occupancy along the
  * way — tests whether late-alphabet queries slow down because the code
  * cache fills (flushing/decompilation storms), which per-query plan
  * audits cannot see. */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    graft.plans.GraftOptimizations.install(spark)
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def codeCacheMb: String =
      java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
        .filter(_.getName.startsWith("CodeHeap"))
        .map(p => f"${p.getName.split("'")(1)}=${p.getUsage.getUsed / 1048576}%dM")
        .mkString(" ")
    def run(name: String): Double = {
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      } finally {
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
        spark.catalog.clearCache()
      }
    }
    val names = SparkEntry.queries.keys.toSeq.sorted
    run("rel_distinct")
    var total = 0.0
    names.zipWithIndex.foreach { case (n, i) =>
      val t = run(n)
      total += t
      println(f"[probe] $i%3d $n%-40s ${t}%7.2f  (cc: $codeCacheMb)")
    }
    println(f"[probe] TOTAL single-run: $total%.1f s")
    spark.stop()
  }
}
