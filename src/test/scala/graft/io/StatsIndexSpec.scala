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

  test("refresh after a copy-on-write merge: delta-only maintenance restores pruning") {
    val base = Files.createTempDirectory("statsrefresh").toString
    val out = s"$base/t"
    val cdc = s"$base/cdc"
    // initial table: ids 0..999 range-clustered into 4 files (Op column
    // like any merge-produced table carries)
    spark.range(1000).select(lit("I").as("Op"), $"id", ($"id" * 2).as("v"))
      .repartitionByRange(4, $"id").write.parquet(out)
    // Tamper the built index rows with a marker so reuse is PROVABLE: a
    // full rebuild would reset `rows`, delta maintenance preserves it for
    // files it did not re-scan.
    val marked = StatsIndex.build(spark, out, Seq("id"))
      .withColumn("rows", col("rows") + 1000000L)
      .localCheckpoint(true)
    // CoW merge: update ids 10..19 — rewrites exactly the file holding
    // them (deleting it) and appends the merged replacement
    spark.range(10, 20).select(lit("U").as("Op"), $"id", lit(-1L).as("v"))
      .coalesce(1).write.parquet(cdc)
    val cdcFile = spark.read.parquet(cdc).inputFiles.head
    graft.io.CdcPipeline.loadIncremental(spark, Seq(cdcFile), out,
      graft.cdc.TableConfig(Seq("id"), Nil, active = true))

    val refreshed = StatsIndex.refresh(spark, out, marked, Seq("id"))
      .localCheckpoint(true)
    val current = spark.read.parquet(out).inputFiles.map(f =>
      new org.apache.hadoop.fs.Path(f).toUri.getPath).toSet
    val indexed = refreshed.select("file").as[String].collect()
      .map(f => new org.apache.hadoop.fs.Path(f).toUri.getPath).toSet
    assert(indexed == current, "index must cover exactly the current files")
    // 3 untouched files keep their marker (reused, not re-scanned); the
    // merged replacement file(s) were freshly scanned
    val markers = refreshed.select("rows").as[Long].collect()
    assert(markers.count(_ > 1000000L) == 3, s"3 reused rows expected: ${markers.toSeq}")
    assert(markers.count(_ < 1000000L) >= 1, "rewritten file must be freshly scanned")
    // pruning works again through the refreshed index: an untouched range
    // opens one file, and the merged values are visible
    val pruned = StatsIndex.prunedRead(spark, out, refreshed, "id", Some(900L), Some(999L))
    assert(pruned.inputFiles.length == 1, s"expected 1 file, got ${pruned.inputFiles.length}")
    assert(pruned.count() == 100L)
    val updated = StatsIndex.prunedRead(spark, out, refreshed, "id", Some(10L), Some(19L))
      .select("v").as[Long].collect()
    assert(updated.toSeq == Seq.fill(10)(-1L), "merge result must be visible through the index")
  }

  test("prunedRead reconciles on normalized file identity, not exact strings") {
    val dir = tmp()
    spark.range(1000).select($"id").repartitionByRange(4, $"id").write.parquet(dir)
    // Re-render the stored file names with a different URI convention
    // (scheme-less raw paths vs the listing's file: URIs): exact-string
    // reconciliation would treat every file as unseen and scan all of them.
    val stats = StatsIndex.build(spark, dir, Seq("id"))
      .withColumn("file", regexp_replace(col("file"), "^file:/+", "/"))
      .localCheckpoint(true)
    val pruned = StatsIndex.prunedRead(spark, dir, stats, "id", Some(0L), Some(249L))
    assert(pruned.inputFiles.length == 1,
      s"URI-encoding drift must not defeat pruning: ${pruned.inputFiles.length} files")
    assert(pruned.count() == 250L)
  }

  test("bloom sidecar: point probe prunes files that min/max cannot, row-identical answer") {
    val dir = tmp()
    // id-range-clustered files; k is high-cardinality and UNCLUSTERED —
    // each file's [min_k, max_k] spans ~the whole domain, so the range
    // path cannot prune a k point lookup, but each file holds only
    // ~1/8th of the k values, so the bloom can.
    spark.range(8000).select($"id", (($"id" * 2654435761L) % 100000L).as("k"))
      .repartitionByRange(8, $"id").write.parquet(dir)
    val stats = StatsIndex.build(spark, dir, Seq("id"),
      bloomCols = Seq("k"), bloomBits = 1 << 16).localCheckpoint(true)
    val probe = spark.read.parquet(dir).select($"k").limit(1).head().getLong(0)
    val pruned = StatsIndex.prunedReadPoint(spark, dir, stats, "k", probe)
    val full = spark.read.parquet(dir).where($"k" === probe)
    assert(pruned.collect().map(_.toString).toSet ==
      full.collect().map(_.toString).toSet)
    val total = spark.read.parquet(dir).inputFiles.length
    assert(pruned.inputFiles.length < total,
      s"bloom must prune an unclustered point probe: ${pruned.inputFiles.length} of $total")
    // an absent key prunes everything (modulo bloom false positives —
    // with 1000 keys/file in 2^16 bits the FP chance per file is ~0.1%)
    val absent = StatsIndex.prunedReadPoint(spark, dir, stats, "k", 100001L)
    assert(absent.count() == 0L)
  }

  test("bloom sidecar: refresh rebuilds the sidecar only for new files, same geometry") {
    val dir = tmp()
    spark.range(4000).select($"id", ($"id" % 997L).as("k"))
      .repartitionByRange(4, $"id").write.parquet(dir)
    val stats = StatsIndex.build(spark, dir, Seq("id"),
        bloomCols = Seq("k"), bloomBits = 1 << 12)
      .withColumn("rows", col("rows") + 1000000L) // reuse marker
      .localCheckpoint(true)
    // append a file with a key OUTSIDE the original domain
    spark.range(1).select(lit(999999L).as("id"), lit(5000L).as("k"))
      .write.mode("append").parquet(dir)
    val refreshed = StatsIndex.refresh(spark, dir, stats, Seq("id"),
      bloomCols = Seq("k")).localCheckpoint(true)
    // the 4 original rows are reused verbatim (marker intact), the new
    // file's sidecar was built under the index's recorded m
    assert(refreshed.where(col("rows") > 1000000L).count() == 4L)
    assert(refreshed.select(max("bloom_bits")).head().getInt(0) == (1 << 12))
    val hit = StatsIndex.prunedReadPoint(spark, dir, refreshed, "k", 5000L)
    assert(hit.count() == 1L, "new file's key must be findable through the refreshed bloom")
    assert(hit.inputFiles.length < spark.read.parquet(dir).inputFiles.length)
  }

  test("token bloom: term probe prunes files, row-identical to the full token scan") {
    val dir = tmp()
    // 8 id-range files; the term 'needle' lives only in a narrow id band
    // (one file), everything else is common filler vocabulary
    spark.range(4000).select($"id",
        concat(lit("alpha beta gamma "),
          when($"id".between(1000L, 1099L), lit("needle")).otherwise(lit("hay")))
          .as("text"))
      .repartitionByRange(8, $"id").write.parquet(dir)
    val stats = StatsIndex.buildTokenBloom(spark, dir, "text").localCheckpoint(true)
    val pruned = StatsIndex.prunedReadToken(spark, dir, stats, "text", "needle")
    val full = spark.read.parquet(dir)
      .where(array_contains(graft.functions.TextFunctions.tokens($"text"), "needle"))
    assert(pruned.collect().map(_.toString).toSet ==
      full.collect().map(_.toString).toSet)
    assert(pruned.count() == 100L)
    val total = spark.read.parquet(dir).inputFiles.length
    assert(pruned.inputFiles.length < total,
      s"token bloom must prune: ${pruned.inputFiles.length} of $total")
    // common vocabulary prunes nothing (every file holds it) but stays exact
    assert(StatsIndex.prunedReadToken(spark, dir, stats, "text", "alpha")
      .count() == 4000L)
    // absent term prunes everything (modulo the documented FP rate)
    assert(StatsIndex.prunedReadToken(spark, dir, stats, "text", "absentterm")
      .count() == 0L)
  }

  test("point probe without a bloom sidecar is a contract error") {
    val dir = tmp()
    spark.range(100).select($"id", $"id".as("v")).write.parquet(dir)
    val stats = StatsIndex.build(spark, dir, Seq("id"))
    val e = intercept[IllegalArgumentException] {
      StatsIndex.prunedReadPoint(spark, dir, stats, "v", 1L)
    }
    assert(e.getMessage.contains("bloom"))
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

  test("overlapDepth: clustered layout → 1, scattered → n_files, half-overlap exact") {
    def depthOf(rows: Seq[(Long, Long)]): Long = {
      val stats = rows.zipWithIndex
        .map { case ((lo, hi), i) => (s"f$i", "g", lo, hi) }
        .toDF("file", "g", "min_id", "max_id")
      StatsIndex.overlapDepth(stats, "id", "g")
        .select($"max_depth").as[Long].head()
    }
    // disjoint ranges: any point is in exactly one file
    assert(depthOf(Seq((0L, 9L), (10L, 19L), (20L, 29L))) == 1L)
    // identical ranges: every point is in all files
    assert(depthOf(Seq((0L, 9L), (0L, 9L), (0L, 9L), (0L, 9L))) == 4L)
    // staircase: [0,10] [5,15] [10,20] — point 10 is in all three
    assert(depthOf(Seq((0L, 10L), (5L, 15L), (10L, 20L))) == 3L)
    // touching closed intervals: boundary point belongs to both
    assert(depthOf(Seq((0L, 10L), (10L, 20L))) == 2L)
  }
}
