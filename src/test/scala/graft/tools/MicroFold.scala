package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-probe for OrderedFoldRule: the ordered-fold idiom vs the native
  * ordered_sum aggregate on the register-fold shape (many groups, tens
  * of pairs each) and the per-doc-mean shape (fewer groups, hundreds of
  * pairs). Usage: Test/runMain graft.tools.MicroFold [rows] */
object MicroFold {
  def main(args: Array[String]): Unit = {
    val rows = if (args.nonEmpty) args(0).toLong else 20000000L
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def bench(label: String, groups: Long)(prep: SparkSession => Unit): Unit = {
      prep(spark)
      val df = spark.range(rows).select(
        ($"id" % groups).as("g"), (($"id" * 2654435761L) % 1000).as("o"),
        (($"id" % 97).cast("double") / 7.0 +
          when($"id" % 5 === 0, 1e12).otherwise(0.0)).as("v"))
      val q = df.groupBy("g").agg(
        aggregate(array_sort(collect_list(struct($"o", $"v"))),
          lit(0.0), (acc, s) => acc + s.getField("v")).as("s"))
      def once(): Double = {
        val t0 = System.nanoTime()
        q.agg(sum($"s")).head() // total forces every group's fold
        (System.nanoTime() - t0) / 1e9
      }
      once()
      println(f"[microfold] $label: ${math.min(once(), once())}%.2f s")
    }

    // register shape: rows/64 groups of ~64 pairs
    bench("idiom  groups=n/64", rows / 64)(_ => graft.plans.GraftOptimizations.uninstall(spark))
    bench("native groups=n/64", rows / 64)(graft.plans.GraftOptimizations.install)
    // per-doc-mean shape: 20k groups of rows/20k pairs
    bench("idiom  groups=20k", 20000L)(_ => graft.plans.GraftOptimizations.uninstall(spark))
    bench("native groups=20k", 20000L)(graft.plans.GraftOptimizations.install)
    spark.stop()
  }
}
