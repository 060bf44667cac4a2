package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.Files

class StatsIndexSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("statsidx").toString + "/t"

  test("build: one row per file, min/max/nulls per column") {
    val dir = tmp()
    spark.range(1000).select($"id", ($"id" % 10).as("k"))
      .repartitionByRange(4, $"id").write.parquet(dir)
    val stats = StatsIndex.build(spark, dir, Seq("id", "k")).collect()
    assert(stats.length == 4)
    assert(stats.map(_.getAs[Long]("rows")).sum == 1000L)
    stats.foreach { r =>
      assert(r.getAs[Long]("min_id") <= r.getAs[Long]("max_id"))
      assert(r.getAs[Long]("nulls_id") == 0L)
    }
  }

  test("prunedRead: row-identical to a full filtered scan, fewer files opened") {
    val dir = tmp()
    // range-partitioned by id → each of 8 files owns a narrow id range
    spark.range(10000).select($"id", ($"id" * 3 % 97).as("v"))
      .repartitionByRange(8, $"id").write.parquet(dir)
    val stats = StatsIndex.build(spark, dir, Seq("id")).localCheckpoint(true)
    val pruned = StatsIndex.prunedRead(spark, dir, stats, "id",
      Some(2000L), Some(2999L))
    val full = spark.read.parquet(dir).where($"id".between(2000, 2999))
    assert(pruned.collect().map(_.toString).toSet == full.collect().map(_.toString).toSet)
    assert(pruned.inputFiles.length < spark.read.parquet(dir).inputFiles.length,
      s"expected pruning: ${pruned.inputFiles.length} vs ${spark.read.parquet(dir).inputFiles.length}")
    assert(pruned.inputFiles.length <= 2, "a 1000-id slice of 8 range files needs <= 2")
  }

  test("prunedRead: empty candidate set returns a typed empty frame") {
    val dir = tmp()
    spark.range(100).select($"id", $"id".as("v")).write.parquet(dir)
    val stats = StatsIndex.build(spark, dir, Seq("id"))
    val out = StatsIndex.prunedRead(spark, dir, stats, "id", Some(5000L), None)
    assert(out.schema.fieldNames.toSeq == Seq("id", "v"))
    assert(out.count() == 0L)
  }

  test("z-order layout: stats pruning works on EITHER morton dimension") {
    val dir = tmp()
    // a 64x64 grid z-order-clustered on (x, y) into 16 files
    val grid = spark.range(4096).select(
      ($"id" % 64).cast("int").as("x"), ($"id" / 64).cast("int").as("y"))
    graft.ops.ZOrder.cluster(grid, "x", "y", numPartitions = 16)
      .write.parquet(dir)
    val stats = StatsIndex.build(spark, dir, Seq("x", "y")).localCheckpoint(true)
    val total = spark.read.parquet(dir).inputFiles.length
    val onX = StatsIndex.prunedRead(spark, dir, stats, "x", Some(0), Some(7))
    val onY = StatsIndex.prunedRead(spark, dir, stats, "y", Some(0), Some(7))
    assert(onX.inputFiles.length < total && onY.inputFiles.length < total,
      s"z-order must prune on both dims: x=${onX.inputFiles.length} " +
        s"y=${onY.inputFiles.length} of $total")
    assert(onX.count() == 64L * 8 && onY.count() == 64L * 8)
  }

  test("stale index stays correct: appended files scan, vanished files skip") {
    val dir = tmp()
    spark.range(1000).select($"id").repartitionByRange(4, $"id").write.parquet(dir)
    val stats = StatsIndex.build(spark, dir, Seq("id")).localCheckpoint(true)
    // append rows OUTSIDE the indexed range after the build
    spark.range(5000, 5100).select($"id").write.mode("append").parquet(dir)
    val out = StatsIndex.prunedRead(spark, dir, stats, "id", Some(5000L), None)
    assert(out.count() == 100L, "appended (unindexed) files must be scanned")
    // delete one indexed file: reads of other ranges must not fail
    val f = new org.apache.hadoop.fs.Path(
      spark.read.parquet(dir).inputFiles.find(_.contains("part-00000")).get)
    f.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(f, false)
    val after = StatsIndex.prunedRead(spark, dir, stats, "id", Some(900L), Some(999L))
    assert(after.count() == 100L)
  }

  test("prunedRead keeps hive-partition columns via basePath") {
    val dir = tmp()
    spark.range(200).select($"id", ($"id" % 2).as("p"))
      .write.partitionBy("p").parquet(dir)
    val stats = StatsIndex.build(spark, dir, Seq("id"))
    val out = StatsIndex.prunedRead(spark, dir, stats, "id", Some(0L), Some(49L))
    assert(out.schema.fieldNames.contains("p"))
    assert(out.select(countDistinct($"p")).as[Long].head() == 2L)
  }
}
