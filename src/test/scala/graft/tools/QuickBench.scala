package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Subset bench for optimization iteration: same methodology as
  * [[graft.Bench]] (noop sink, warm-up, median-of-3, per-query unpersist)
  * but only the named queries — fast feedback without the full 361-query
  * sweep. NOT the committed record; Bench stays the only source of
  * bench_out.json / bench_history.jsonl lines. */
object QuickBench {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "QuickBench <query...>")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.plans.GraftOptimizations.install(spark)
    spark.sparkContext.setLogLevel("WARN")
    def run(name: String): Double = {
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      } catch { case e: Throwable =>
        System.err.println(s"[quickbench] $name failed: ${e.getMessage}"); -1.0
      } finally {
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
        spark.catalog.clearCache()
      }
    }
    run("rel_distinct") // warm-up, as in Bench
    args.foreach { n =>
      val ts = Seq.fill(3)(run(n)).filter(_ >= 0).sorted
      val med = if (ts.isEmpty) -1.0 else ts(ts.size / 2)
      println(f"[quickbench] $n%-40s median=$med%8.3f  runs=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
