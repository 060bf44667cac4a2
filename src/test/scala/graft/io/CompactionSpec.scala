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

  test("compaction preserves hive partitioning") {
    val lake = Files.createTempDirectory("lake").toString + "/db/t"
    // fragmented partitioned layout: 3 files per bucket
    (0 until 3).foreach { i =>
      writeFile((1 to 5).map(j => ("I", i * 100 + j, s"v$j")).toDF("Op", "id", "v"),
        s"$lake/bucket=0", f"frag-a$i.parquet")
      writeFile((1 to 5).map(j => ("I", i * 100 + j + 1000, s"w$j")).toDF("Op", "id", "v"),
        s"$lake/bucket=1", f"frag-b$i.parquet")
    }
    val stats = Compaction.compact(spark, lake, Seq("id"), Seq("bucket"))
    assert(stats.filesBefore == 6 && stats.filesAfter == 2 && stats.rows == 30)
    val dirs = new java.io.File(lake).listFiles().filter(_.isDirectory).map(_.getName).toSet
    assert(dirs == Set("bucket=0", "bucket=1"), s"hive layout lost: $dirs")
    assert(spark.read.parquet(lake).where($"bucket" === 0).count() == 15)
  }

  test("a file appended by a concurrent merge survives the compaction swap") {
    val lake = Files.createTempDirectory("lake").toString + "/db/t"
    writeFile((1 to 20).map(i => ("I", i, s"v$i")).toDF("Op", "id", "v"), lake, "base.parquet")
    // the racing merge commits its file after the rewrite planned (and
    // read) its input, right before the directory swap
    val stats = Compaction.compact(spark, lake, Seq("id"), beforeSwap = () =>
      writeFile(Seq(("I", 999, "late")).toDF("Op", "id", "v"), lake, "racer.parquet"))
    assert(stats.rows == 20) // the rewrite itself saw the pinned snapshot
    val back = spark.read.parquet(lake)
    assert(back.count() == 21, "concurrently appended rows were lost in the swap")
    assert(back.filter($"id" === 999).head().getAs[String]("v") == "late")
  }

  test("an append that recreates the table dir mid-swap is absorbed, not stranded") {
    val lake = Files.createTempDirectory("lake").toString + "/db/t"
    writeFile((1 to 10).map(i => ("I", i, s"v$i")).toDF("Op", "id", "v"), lake, "base.parquet")
    // the racer lands BETWEEN the two swap renames: the table dir was just
    // moved aside, and the append recreates it — promotion must absorb it
    val stats = Compaction.compact(spark, lake, Seq("id"), afterMoveAside = () =>
      writeFile(Seq(("I", 888, "mid")).toDF("Op", "id", "v"), lake, "midswap.parquet"))
    assert(stats.rows == 10)
    val back = spark.read.parquet(lake)
    assert(back.count() == 11, "mid-swap append was lost")
    assert(back.filter($"id" === 888).head().getAs[String]("v") == "mid")
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
