package graft

import graft.cdc.TableConfig
import graft.io.{Compaction, Discovery}
import graft.state.JsonFileStateStore
import org.apache.spark.sql.{DataFrame, SparkSession}

/** User-facing façade: everything a user of the reference walkthrough does
  * (deploy, flip ActiveFlag + keys in the state table, wait for the cron,
  * query the lake — /root/reference/README.md:87,298-306) as one object.
  *
  * {{{
  * val lake = GraftLake(spark, raw, out, state)
  * lake.activate("sampledb", "product", primaryKeys = Seq("id"))
  * lake.sync()                      // one scheduled run over all tables
  * val df = lake.read("sampledb", "product")
  * lake.compact("sampledb", "product")
  * }}}
  */
final class GraftLake(spark: SparkSession, rawRoot: String, lakeRoot: String,
                      stateDir: String, parallelism: Int = 8) {

  val store = new JsonFileStateStore(stateDir)
  private val controller = new Controller(spark, store, rawRoot, lakeRoot, parallelism)

  /** Discover raw tables (registers default state for new ones). */
  def tables(): Seq[String] = {
    val ts = Discovery.listTables(rawRoot, spark.sparkContext.hadoopConfiguration)
    ts.foreach(t => store.upsertDefaults(t.dir))
    ts.map(_.key)
  }

  /** Resolve a table's canonical dir the same way discovery does (the FS
    * may scheme-qualify paths, e.g. `file:/...`). */
  private def tableDir(schema: String, table: String): String =
    Discovery.listTables(rawRoot, spark.sparkContext.hadoopConfiguration)
      .find(_.key == s"$schema/$table").map(_.dir)
      .getOrElse(s"${rawRoot.stripSuffix("/")}/$schema/$table")

  /** The reference's human step: set keys + active flag. */
  def activate(schema: String, table: String, primaryKeys: Seq[String] = Nil,
               partitionKeys: Seq[String] = Nil): Unit = {
    val item = store.upsertDefaults(tableDir(schema, table))
    store.put(item.copy(config = TableConfig(primaryKeys, partitionKeys, active = true)))
  }

  /** One scheduled run over every discovered table (initial loads +
    * incremental merges as watermarks dictate). */
  def sync(): Map[String, List[Controller.Action]] = controller.runOnce()

  /** Read a lake table (mergeSchema: evolved tables read their union
    * schema). */
  def read(schema: String, table: String): DataFrame =
    spark.read.option("mergeSchema", "true")
      .parquet(s"${lakeRoot.stripSuffix("/")}/$schema/$table")

  /** Maintenance compaction of one lake table (uses the stored keys). */
  def compact(schema: String, table: String): Compaction.Stats = {
    val cfg = store.get(tableDir(schema, table)).map(_.config).getOrElse(TableConfig())
    Compaction.compact(spark, s"${lakeRoot.stripSuffix("/")}/$schema/$table",
      cfg.primaryKeys, cfg.partitionKeys)
  }
}

object GraftLake {
  def apply(spark: SparkSession, rawRoot: String, lakeRoot: String,
            stateDir: String, parallelism: Int = 8): GraftLake = {
    GraftFunctions.register(spark)
    new GraftLake(spark, rawRoot, lakeRoot, stateDir, parallelism)
  }
}
