package graft.tools
import graft.{Controller}
import graft.cdc.TableConfig
import graft.io.Discovery
import graft.state.JsonFileStateStore
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import java.nio.file.Files
/** Scratch end-to-end driver: full controller lifecycle over a temp raw/lake
  * pair, with console observation (test scope). */
object DrivePipeline {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
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
    val stateDir = Files.createTempDirectory("state").toString
    // Use REAL testdata as the source table snapshot
    val part = spark.read.parquet("/root/testdata/sf0.001/part.parquet")
    writeFile(part.withColumn("Op", org.apache.spark.sql.functions.lit("I")), s"$raw/tpch/part", "LOAD00000001.parquet")
    val store = new JsonFileStateStore(stateDir)
    val ctl = new Controller(spark, store, raw, lake)
    println("run1 (inactive): " + ctl.runOnce())
    val t = Discovery.listTables(raw).head
    store.put(store.get(t.dir).get.copy(config = TableConfig(Seq("p_partkey"), Nil, active = true)))
    println("run2 (initial):  " + ctl.runOnce())
    println("lake rows after initial: " + spark.read.parquet(s"$lake/tpch/part").count())
    val cdc = part.filter($"p_partkey" <= 3).withColumn("Op", org.apache.spark.sql.functions.lit("U"))
      .withColumn("p_name", org.apache.spark.sql.functions.concat($"p_name", org.apache.spark.sql.functions.lit(" [RENAMED]")))
    writeFile(cdc, s"$raw/tpch/part", "20260812-000001.parquet")
    println("run3 (incr):     " + ctl.runOnce())
    val back = spark.read.parquet(s"$lake/tpch/part")
    println("lake rows after incr: " + back.count())
    back.filter($"p_partkey" <= 3).select("p_partkey", "Op", "p_name").show(false)
    println("run4 (no-op):    " + ctl.runOnce())
    println("state file contents:")
    println(java.nio.file.Files.readString(java.nio.file.Files.list(java.nio.file.Paths.get(stateDir)).findFirst.get))
    // probe: corrupt watermark (set future) -> run must be a no-op, not a crash
    val it = store.get(t.dir).get
    store.put(it.copy(state = it.state.copy(lastIncrementalFile = s"$raw/tpch/part/99999999.parquet")))
    println("run5 (future watermark probe): " + ctl.runOnce())
    spark.stop()
  }
}
