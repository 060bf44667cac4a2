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

  /** Schema drift between the lake table and the raw source's current
    * footprint (pre-flight check before `sync`): what would the next merge
    * add/drop/retype, and is it lossless? Metadata-only — reads two
    * parquet footers, runs no jobs. */
  def drift(schema: String, table: String): Seq[io.SchemaDrift.Change] = {
    // mergeSchema on BOTH sides: the union footprint is what the next
    // merge will see (a single new change file must surface its column)
    val incoming = spark.read.option("mergeSchema", "true")
      .parquet(tableDir(schema, table)).schema
    val currentPath = s"${lakeRoot.stripSuffix("/")}/$schema/$table"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(currentPath), spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(currentPath))) Nil
    else {
      val current = spark.read.option("mergeSchema", "true").parquet(currentPath).schema
      // the CDC op marker never counts as drift (present in change files,
      // projected away by the merge)
      io.SchemaDrift.diff(current, incoming).filterNot(_.column == cdc.Op.column)
    }
  }

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
