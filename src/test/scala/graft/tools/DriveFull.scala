package graft.tools
import graft.{Controller, GraftFunctions}
import graft.cdc.TableConfig
import graft.io.{Compaction, Discovery}
import graft.state.JsonFileStateStore
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession, functions => F}
import java.nio.file.Files
/** Full-surface drive: controller over two tables (one hive-partitioned),
  * compaction, and SQL-registered sketch functions, with observations. */
object DriveFull {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    GraftFunctions.register(spark)
    def writeFile(df: DataFrame, dir: String, name: String): Unit = {
      val tmp = Files.createTempDirectory("stage").toString
      df.coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp)
      val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
      val part = fs.listStatus(new org.apache.hadoop.fs.Path(tmp))
        .map(_.getPath).find(_.getName.endsWith(".parquet")).get
      fs.mkdirs(new org.apache.hadoop.fs.Path(dir))
      fs.rename(part, new org.apache.hadoop.fs.Path(s"$dir/$name"))
      fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
    }
    val raw = Files.createTempDirectory("raw").toString
    val lake = Files.createTempDirectory("lake").toString
    val st = Files.createTempDirectory("state").toString
    // table 1: real customer data, partitioned by nation
    val cust = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    writeFile(cust.withColumn("Op", F.lit("I")), s"$raw/tpch/customer", "LOAD00000001.parquet")
    // table 2: real supplier data, unpartitioned
    val supp = spark.read.parquet("/root/testdata/sf0.001/supplier.parquet")
    writeFile(supp.withColumn("Op", F.lit("I")), s"$raw/tpch/supplier", "LOAD00000001.parquet")
    val store = new JsonFileStateStore(st)
    val ctl = new Controller(spark, store, raw, lake)
    ctl.runOnce()
    Discovery.listTables(raw).foreach { t =>
      val keys = if (t.table == "customer") TableConfig(Seq("c_custkey"), Seq("c_nationkey"), active = true)
                 else TableConfig(Seq("s_suppkey"), Nil, active = true)
      store.put(store.get(t.dir).get.copy(config = keys))
    }
    println("initial: " + ctl.runOnce().toSeq.sortBy(_._1))
    // CDC: update 5 customers across nations + delete 2 suppliers
    writeFile(cust.where($"c_custkey" < 5).withColumn("Op", F.lit("U"))
      .withColumn("c_acctbal", $"c_acctbal" + 100.0), s"$raw/tpch/customer", "20260812-01.parquet")
    writeFile(supp.where($"s_suppkey" < 2).withColumn("Op", F.lit("D")),
      s"$raw/tpch/supplier", "20260812-01.parquet")
    println("incr:    " + ctl.runOnce().toSeq.sortBy(_._1))
    val custBack = spark.read.parquet(s"$lake/tpch/customer")
    println(s"customer rows=${custBack.count} (expect ${cust.count}), updated=" +
      custBack.where($"Op" === "U").count + " (expect 5)")
    println("supplier rows=" + spark.read.parquet(s"$lake/tpch/supplier").count + s" (expect ${supp.count - 2})")
    // compact the partitioned lake table and confirm reads still work
    val stats = Compaction.compact(spark, s"$lake/tpch/customer", Seq("c_custkey"), Seq("c_nationkey"))
    println(s"compaction: ${stats.filesBefore} -> ${stats.filesAfter} files, rows=${stats.rows}")
    println("post-compaction count: " + spark.read.parquet(s"$lake/tpch/customer").count)
    // SQL surface over the lake
    spark.read.parquet(s"$lake/tpch/customer").createOrReplaceTempView("lake_customer")
    spark.sql("""SELECT c_nationkey, count(*) n, graft_simhash32(max(c_name)) sketch
                 FROM lake_customer GROUP BY 1 ORDER BY 1 LIMIT 3""").show()
    // probe: rerun (no-op) + compaction of missing dir must fail cleanly
    println("noop:    " + ctl.runOnce().toSeq.sortBy(_._1))
    try { Compaction.compact(spark, s"$lake/none", Nil); println("PROBE-MISSING: no error (BAD)") }
    catch { case e: Exception => println("PROBE-MISSING ok: " + e.getClass.getSimpleName) }
    spark.stop()
  }
}
