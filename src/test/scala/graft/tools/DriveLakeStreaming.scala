package graft.tools

import graft.GraftLake
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import java.nio.file.Files

/** Scratch end-to-end driver (test scope): GraftLake.syncStreaming fan-out
  * + catalog registration over REAL testdata tables as CDC sources. */
object DriveLakeStreaming {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
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
    val raw = Files.createTempDirectory("rawD").toString
    val out = Files.createTempDirectory("lakeD").toString
    val st = Files.createTempDirectory("stateD").toString
    val ckpt = Files.createTempDirectory("ckptD").toString
    // two real tables as CDC streams
    val region = spark.read.parquet("/root/testdata/sf0.001/region.parquet")
    val nation = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    writeFile(region.withColumn("Op", lit("I")), s"$raw/tpch/region", "20260812-01.parquet")
    writeFile(nation.withColumn("Op", lit("I")), s"$raw/tpch/nation", "20260812-01.parquet")

    val lake = GraftLake(spark, raw, out, st)
    lake.tables()
    lake.activate("tpch", "region", primaryKeys = Seq("r_regionkey"))
    lake.activate("tpch", "nation", primaryKeys = Seq("n_nationkey"))
    val mgr = lake.syncStreaming(ckpt)
    mgr.awaitAll()
    println(s"failures (expect none): ${mgr.failures}")
    println(s"queries  (expect 2):    ${mgr.queries.keySet.toSeq.sorted}")
    println(s"region rows expect=${region.count()} got=${lake.read("tpch", "region").count()}")
    println(s"nation rows expect=${nation.count()} got=${lake.read("tpch", "nation").count()}")
    // second CDC batch through the same manager, then catalog SQL
    writeFile(Seq(("U", 0, "AFRICA", "updated comment")).toDF("Op", "r_regionkey", "r_name", "r_comment"),
      s"$raw/tpch/region", "20260812-02.parquet")
    mgr.startAll().awaitAll()
    lake.registerAll()
    val c = spark.sql("SELECT r_comment FROM tpch_region WHERE r_regionkey = 0").head().getString(0)
    println(s"catalog SQL expect=updated comment got=$c")
    val m = mgr.metricsFor("tpch/region")
    println(s"metrics region (expect Some, batches>=1): $m")
    mgr.stopAll()
    spark.stop()
  }
}
