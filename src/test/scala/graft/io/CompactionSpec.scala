package graft.io

import graft.SparkSpec
import graft.cdc.TableConfig
import org.apache.spark.sql.{DataFrame, SaveMode}
import java.nio.file.Files

class CompactionSpec extends SparkSpec {
  import spark.implicits._

  private def writeFile(df: DataFrame, dir: String, name: String): Unit = {
    val tmp = Files.createTempDirectory("stage").toString
    df.coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp)
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val part = fs.listStatus(new org.apache.hadoop.fs.Path(tmp))
      .map(_.getPath).find(_.getName.endsWith(".parquet")).get
    fs.mkdirs(new org.apache.hadoop.fs.Path(dir))
    fs.rename(part, new org.apache.hadoop.fs.Path(s"$dir/$name"))
    fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
  }

  test("compaction shrinks fragmented table, preserves rows and evolved schema") {
    val lake = Files.createTempDirectory("lake").toString + "/db/t"
    // simulate fragmentation: 8 tiny files, one with an evolved schema
    (0 until 7).foreach { i =>
      writeFile(Seq(("I", i * 10 + 1, s"v${i}")).toDF("Op", "id", "v"), lake, f"frag-$i%02d.parquet")
    }
    writeFile(Seq(("U", 99, "x", "extra")).toDF("Op", "id", "v", "note"), lake, "frag-07.parquet")

    val stats = Compaction.compact(spark, lake, Seq("id"), maxRecordsPerFile = 1000)
    assert(stats.filesBefore == 8 && stats.filesAfter == 1 && stats.rows == 8)
    val back = spark.read.parquet(lake)
    assert(back.count() == 8)
    assert(back.columns.contains("note"))
    assert(back.filter($"id" === 99).head().getAs[String]("note") == "extra")
  }

  test("compaction splits oversized tables into bounded files; merge still works after") {
    val lake = Files.createTempDirectory("lake").toString + "/db/t"
    val raw = Files.createTempDirectory("raw").toString + "/db/t"
    writeFile((1 to 100).map(i => ("I", i, s"v$i")).toDF("Op", "id", "v"), lake, "big.parquet")
    val stats = Compaction.compact(spark, lake, Seq("id"), maxRecordsPerFile = 30)
    assert(stats.filesAfter >= 4, s"expected >=4 bounded files, got ${stats.filesAfter}")
    assert(spark.read.parquet(lake).count() == 100)
    // pipeline continues to merge correctly over the compacted layout
    writeFile(Seq(("U", 50, "NEW")).toDF("Op", "id", "v"), raw, "20260812-1.parquet")
    CdcPipeline.loadIncremental(spark, Seq(s"$raw/20260812-1.parquet"), lake,
      TableConfig(Seq("id"), Nil, active = true))
    val back = spark.read.parquet(lake)
    assert(back.count() == 100)
    assert(back.filter($"id" === 50).head().getAs[String]("v") == "NEW")
  }
}
