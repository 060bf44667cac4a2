package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Invocation-invariance check for cached-fixture lifecycle queries:
  * every query that memoizes its one-time fixture (QueryTmp.cached) and
  * re-applies its delivery per run MUST return the identical result on
  * every invocation in one JVM — this runs each named query twice and
  * diffs the collected rows. A mismatch means a re-delivery does NOT
  * converge and the query may not use the cached-fixture pattern. */
object RepeatCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    graft.plans.GraftOptimizations.install(spark)
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    var failed = 0
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "sim_ivf_after_update", "sim_binary_ivf_after_update",
      "cdc_incr_join_after_ingest", "dq_suite_after_ingest",
      "text_bm25_after_update", "text_phrase_after_update",
      "sim_graph_after_update", "dedup_communities_incr")
    names.foreach { n =>
      def snap(): Seq[String] = {
        val df = SparkEntry.queries(n)(spark, dir)
        df.collect().map(_.toString).sorted.toSeq
      }
      val (a, b) = (snap(), snap())
      if (a == b) println(s"[repeat] $n: OK (${a.size} rows, invariant)")
      else {
        failed += 1
        val diff = (b.toSet -- a.toSet).take(3) ++ (a.toSet -- b.toSet).take(3)
        println(s"[repeat] $n: MISMATCH (${a.size} vs ${b.size} rows; e.g. $diff)")
      }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      spark.catalog.clearCache()
    }
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
