package graft

import graft.state.JsonFileStateStore
import org.apache.spark.sql.SparkSession

/** CLI entry point: one scheduled pipeline run (the in-process equivalent
  * of the reference's EventBridge-cron → Controller → ProcessTable →
  * Load* chain, SURVEY.md §3.1).
  *
  * Usage: graft.Main <rawRoot> <lakeRoot> <stateDir> [parallelism]
  *
  * Tables start inactive (reference behavior: a human flips ActiveFlag
  * and sets keys in the state item, README.md:87); edit the JSON files
  * under <stateDir> and re-run.
  */
object Main {
  def main(args: Array[String]): Unit = {
    if (args.length < 3) {
      System.err.println("usage: graft.Main <rawRoot> <lakeRoot> <stateDir> [parallelism]")
      sys.exit(2)
    }
    val Array(raw, lake, stateDir) = args.take(3)
    val parallelism = if (args.length > 3) args(3).toInt else 8
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-cdc")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.register(spark)
    try {
      val controller = new Controller(spark, new JsonFileStateStore(stateDir), raw, lake, parallelism)
      val actions = controller.runOnce()
      actions.toSeq.sortBy(_._1).foreach { case (table, acts) =>
        println(f"$table%-40s ${acts.mkString(", ")}")
      }
    } finally spark.stop()
  }
}
