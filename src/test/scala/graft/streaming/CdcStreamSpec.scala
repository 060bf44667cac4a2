package graft.streaming

import graft.SparkSpec
import graft.cdc.TableConfig
import graft.io.CdcPipeline
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

class CdcStreamSpec extends SparkSpec {
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

  test("streaming CDC into a hive-partitioned lake table") {
    val raw = Files.createTempDirectory("rawP").toString + "/db/t"
    val lake = Files.createTempDirectory("lakeP").toString + "/db/t"
    val ckpt = Files.createTempDirectory("ckptP").toString
    val cfg = TableConfig(Seq("id"), Seq("bucket"), active = true)
    writeFile((1 to 20).map(i => ("I", i, s"v$i", i % 2)).toDF("Op", "id", "v", "bucket"),
      raw, "20260812-000001.parquet")
    writeFile(Seq(("U", 2, "NEW", 0), ("D", 3, "v3", 1)).toDF("Op", "id", "v", "bucket"),
      raw, "20260812-000002.parquet")
    val q = CdcStream.start(spark, raw, lake, cfg, ckpt, Trigger.AvailableNow(), maxFilesPerTrigger = 1)
    q.awaitTermination()
    val back = spark.read.parquet(lake)
    assert(back.count() == 19) // 20 - 1 delete
    assert(back.filter($"id" === 2).head().getAs[String]("v") == "NEW")
    val dirs = new java.io.File(lake).listFiles().filter(_.isDirectory).map(_.getName).toSet
    assert(dirs == Set("bucket=0", "bucket=1"))
  }

  test("patchUpdates: streamed partial-column files fold like the batch patchMerge") {
    val raw = Files.createTempDirectory("rawPt").toString + "/db/t"
    val lake = Files.createTempDirectory("lakePt").toString + "/db/t"
    val ckpt = Files.createTempDirectory("ckptPt").toString
    val cfg = TableConfig(Seq("id"), Nil, active = true, patchUpdates = true)
    val nulS = lit(null).cast("string")
    val nulD = lit(null).cast("double")
    val init = (1 to 10).map(i => ("I", i, s"v$i", i * 1.0)).toDF("Op", "id", "v", "price")
    writeFile(init, raw, "20260815-000001.parquet")
    // file 2 patches only v on id 1; file 3 patches only price on id 1
    // (must COMPOSE with file 2's v) and deletes id 2
    writeFile(Seq(("U", 1)).toDF("Op", "id")
      .select($"Op", $"id", lit("patched").as("v"), nulD.as("price")),
      raw, "20260815-000002.parquet")
    writeFile(Seq(("U", 1, 99.0), ("D", 2, 0.0)).toDF("Op", "id", "p0")
      .select($"Op", $"id", nulS.as("v"),
        org.apache.spark.sql.functions.when($"Op" === "U", $"p0").as("price")),
      raw, "20260815-000003.parquet")
    val q = CdcStream.start(spark, raw, lake, cfg, ckpt, Trigger.AvailableNow(),
      maxFilesPerTrigger = 1) // one file per micro-batch: folds must span batches
    q.awaitTermination()
    val back = spark.read.parquet(lake)
    assert(back.count() == 9) // 10 - 1 delete
    val r1 = back.filter($"id" === 1).head()
    assert(r1.getAs[String]("v") == "patched" && r1.getAs[Double]("price") == 99.0)
    // untouched keys keep their full original row
    val r5 = back.filter($"id" === 5).head()
    assert(r5.getAs[String]("v") == "v5" && r5.getAs[Double]("price") == 5.0)

    // stream ≡ batch: the same files through the one-shot batch pipeline
    val lake2 = Files.createTempDirectory("lakePt2").toString + "/db/t"
    CdcPipeline.loadInitial(spark,
      Seq(s"$raw/20260815-000001.parquet"), lake2, cfg)
    CdcPipeline.loadIncremental(spark,
      Seq(s"$raw/20260815-000002.parquet", s"$raw/20260815-000003.parquet"),
      lake2, cfg)
    val a = back.orderBy("id").collect().map(_.toString).toSeq
    val b = spark.read.parquet(lake2).orderBy("id").collect().map(_.toString).toSeq
    assert(a == b)
  }

  test("queue-shaped source: non-file stream drives the same merge") {
    // BASELINE's "S3/Kinesis source" substitution point: a MemoryStream of
    // (Op, id, v, seq) records — no files, provenance synthesized from the
    // queue sequence — must produce the identical latest-wins lake state.
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val lake = Files.createTempDirectory("lakeQ").toString + "/db/t"
    val ckpt = Files.createTempDirectory("ckptQ").toString
    val cfg = TableConfig(Seq("id"), Nil, active = true)
    val input = MemoryStream[(String, Int, String, Long)]

    val stream = input.toDF().toDF("Op", "id", "v", "seq")
    val q = CdcStream.startFromQueue(stream, $"seq", lake, cfg, ckpt,
      Trigger.ProcessingTime(0))
    // batch 1: inserts
    input.addData((1 to 5).map(i => ("I", i, s"v$i", i.toLong)): _*)
    q.processAllAvailable()
    assert(spark.read.parquet(lake).count() == 5)
    // batch 2: two updates to one key in sequence order + a delete —
    // the LAST sequence number must win, like the last file row does.
    input.addData(("U", 1, "mid", 6L), ("U", 1, "final", 7L), ("D", 2, "v2", 8L))
    q.processAllAvailable()
    q.stop()
    val back = spark.read.parquet(lake)
    assert(back.count() == 4) // 5 - 1 delete
    assert(back.filter($"id" === 1).head().getAs[String]("v") == "final")
    assert(back.filter($"id" === 2).count() == 0)
    // synthesized provenance columns never leak into the lake schema (the
    // caller's own `seq` column persists, like a DMS transaction-seq would)
    assert(back.columns.forall(!_.startsWith("__")))
  }

  test("foreachBatch composes merge + incremental aggregate maintenance") {
    // The continuous-rollup shape: each micro-batch merges the CDC rows and
    // refreshes a per-group aggregate table using ONLY the touched groups
    // (graft.ops.IncrementalAgg) — the agg table never sees a full rescan.
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val lake = Files.createTempDirectory("lakeA").toString + "/db/t"
    val aggPath = Files.createTempDirectory("aggA").toString + "/db/t_agg"
    val ckpt = Files.createTempDirectory("ckptA").toString
    val cfg = TableConfig(Seq("id"), Nil, active = true)
    val input = MemoryStream[(String, Int, Long, Int, Long)] // Op, id, grp, v, seq

    val aggs = Seq(count(lit(1)).as("n"), sum(col("v").cast("long")).as("sum_v"))
    val stream = input.toDF().toDF("Op", "id", "grp", "v", "seq")
      .withColumn(graft.io.CdcPipeline.SrcFile, lit("queue"))
      .withColumn(graft.io.CdcPipeline.RowIdx, col("seq"))
    val q = stream.writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime(0))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val s = batch.sparkSession
          val fs = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
          val tgtExists = fs.exists(new org.apache.hadoop.fs.Path(lake))
          // groups whose aggregate can change: old groups of changed keys
          // (pre-merge read) plus the batch rows' own groups
          val oldGroups =
            if (!tgtExists) batch.select("grp").limit(0)
            else s.read.parquet(lake)
              .join(batch.select("id").distinct(), Seq("id"), "left_semi")
              .select("grp")
          val changed = oldGroups.unionByName(batch.select("grp")).persist()
          changed.count()
          // the merge invalidates cached listings itself after its
          // copy-on-write deletes, so the read below is safe
          graft.io.CdcPipeline.mergeTagged(s, batch, lake, cfg)
          val merged = s.read.parquet(lake)
          val prevAgg =
            if (!fs.exists(new org.apache.hadoop.fs.Path(aggPath)))
              merged.groupBy("grp").agg(aggs.head, aggs.tail: _*).limit(0)
            else s.read.parquet(aggPath)
          val refreshed = graft.ops.IncrementalAgg.refresh(
            merged, prevAgg, changed, Seq("grp"), aggs)
          // write-then-swap not needed for the test: collect to break the
          // read-from/write-to same-path cycle, tiny per-group table
          val rows = refreshed.collect()
          changed.unpersist()
          val out = s.createDataFrame(
            new java.util.ArrayList[org.apache.spark.sql.Row](java.util.Arrays.asList(rows: _*)),
            refreshed.schema)
          out.write.mode(SaveMode.Overwrite).parquet(aggPath)
        }
      }
      .start()
    input.addData(("I", 1, 10L, 5, 1L), ("I", 2, 10L, 7, 2L), ("I", 3, 20L, 1, 3L))
    q.processAllAvailable()
    input.addData(("U", 1, 10L, 9, 4L), ("D", 3, 20L, 1, 5L), ("I", 4, 30L, 2, 6L))
    q.processAllAvailable()
    q.stop()
    val got = spark.read.parquet(aggPath)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // full recompute from the final lake state must agree
    val expect = spark.read.parquet(lake).groupBy("grp")
      .agg(aggs.head, aggs.tail: _*)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expect)
    assert(got == Set((10L, 2L, 16L), (30L, 1L, 2L))) // grp 20 fully deleted
  }

  test("restart picks up evolved CDC schema; earlier rows null-fill the new column") {
    val raw = Files.createTempDirectory("rawE").toString + "/db/t"
    val lake = Files.createTempDirectory("lakeE").toString + "/db/t"
    val ckpt = Files.createTempDirectory("ckptE").toString
    val cfg = TableConfig(Seq("id"), Nil, active = true)
    writeFile((1 to 4).map(i => ("I", i, s"v$i")).toDF("Op", "id", "v"),
      raw, "20260812-000001.parquet")
    val q = CdcStream.start(spark, raw, lake, cfg, ckpt, Trigger.AvailableNow())
    q.awaitTermination()
    assert(!spark.read.parquet(lake).columns.contains("note"))

    // the source evolves: a later CDC file carries a new column. The file
    // stream's schema is fixed per run, so the NEW run's inferred schema
    // (merged across CDC footers under the 2* glob) must include it, and
    // the checkpoint must hand the new run only the new file.
    writeFile(Seq(("U", 2, "v2b", "gift"), ("I", 5, "v5", "rush"))
      .toDF("Op", "id", "v", "note"), raw, "20260812-000002.parquet")
    val q2 = CdcStream.start(spark, raw, lake, cfg, ckpt, Trigger.AvailableNow())
    q2.awaitTermination()
    val back = spark.read.option("mergeSchema", "true").parquet(lake)
    assert(back.count() == 5)
    assert(back.filter($"id" === 2).head().getAs[String]("note") == "gift")
    assert(back.filter($"id" === 5).head().getAs[String]("note") == "rush")
    // bystander rows read as null for the evolved column (U1 semantics)
    assert(back.filter($"id" === 1).head().getAs[String]("note") == null)
  }

  test("streaming CDC: AvailableNow catch-up merges files in commit order, checkpoint resumes") {
    val raw = Files.createTempDirectory("rawS").toString + "/db/t"
    val lake = Files.createTempDirectory("lakeS").toString + "/db/t"
    val ckpt = Files.createTempDirectory("ckptS").toString
    val cfg = TableConfig(Seq("id"), Nil, active = true)

    // seed target via an initial snapshot applied as inserts
    writeFile((1 to 5).map(i => ("I", i, s"v$i")).toDF("Op", "id", "v"), raw, "20260812-000001.parquet")
    // then two CDC files: update then delete same key — final state must reflect the later file
    writeFile(Seq(("U", 1, "updated"), ("I", 6, "v6")).toDF("Op", "id", "v"), raw, "20260812-000002.parquet")
    writeFile(Seq(("D", 2, "v2"), ("U", 1, "final")).toDF("Op", "id", "v"), raw, "20260812-000003.parquet")

    val q = CdcStream.start(spark, raw, lake, cfg, ckpt, Trigger.AvailableNow(), maxFilesPerTrigger = 1)
    q.awaitTermination()

    val out = spark.read.parquet(lake)
    assert(out.count() == 5) // 5 + insert 6 - delete 2
    assert(out.filter($"id" === 1).head().getAs[String]("v") == "final")
    assert(out.filter($"id" === 2).count() == 0)
    assert(out.filter($"id" === 6).count() == 1)

    // restart with a new file: checkpoint must process only the new one
    writeFile(Seq(("U", 6, "v6b")).toDF("Op", "id", "v"), raw, "20260812-000004.parquet")
    val q2 = CdcStream.start(spark, raw, lake, cfg, ckpt, Trigger.AvailableNow())
    q2.awaitTermination()
    val out2 = spark.read.parquet(lake)
    assert(out2.count() == 5)
    assert(out2.filter($"id" === 6).head().getAs[String]("v") == "v6b")
  }

  test("change-data-feed sidecar: per-batch pre/post images in the CDF log") {
    val raw = Files.createTempDirectory("rawC").toString + "/db/t"
    val lake = Files.createTempDirectory("lakeC").toString + "/db/t"
    val cdf = Files.createTempDirectory("cdfC").toString + "/db/t_changes"
    val ckpt = Files.createTempDirectory("ckptC").toString
    val cfg = TableConfig(Seq("id"), Nil, active = true)
    // batch 0: first load — a PK table merges against an empty target,
    // so the feed records the initial inserts with NULL pre-images
    writeFile((1 to 5).map(i => ("I", i, s"v$i")).toDF("Op", "id", "v"),
      raw, "20260812-000001.parquet")
    // batch 1: update + delete + brand-new insert -> three feed rows
    writeFile(Seq(("U", 2, "NEW"), ("D", 3, "v3"), ("I", 9, "v9")).toDF("Op", "id", "v"),
      raw, "20260812-000002.parquet")
    val q = CdcStream.startWithChangeFeed(spark, raw, lake, cdf, Seq("v"), cfg, ckpt,
      Trigger.AvailableNow(), maxFilesPerTrigger = 1)
    q.awaitTermination()

    // lake state is the ordinary merge result
    val back = spark.read.parquet(lake)
    assert(back.count() == 5) // 5 + 1 insert - 1 delete
    assert(back.filter($"id" === 2).head().getAs[String]("v") == "NEW")

    // the CDF log holds both batches' operations (batch_id is the hive
    // partition key of the log → cast back from the inferred int)
    val feed = spark.read.parquet(cdf)
      .selectExpr("id", "Op", "v_old", "v_new", "CAST(batch_id AS BIGINT) AS batch_id")
    val rows = feed.collect().map(r => (r.getAs[Int]("id"), r.getAs[String]("Op"),
      r.getAs[String]("v_old"), r.getAs[String]("v_new"), r.getAs[Long]("batch_id"))).toSet
    val batch0 = (1 to 5).map(i => (i, "I", null, s"v$i", 0L)).toSet
    assert(rows == batch0 ++ Set(
      (2, "U", "v2", "NEW", 1L),  // pre-image read from the pre-merge target
      (3, "D", "v3", null, 1L),   // delete: post-image NULL
      (9, "I", null, "v9", 1L)))  // brand-new key: pre-image NULL
  }

  test("change feed replay: re-merging a batch keeps one copy with original pre-images") {
    val lake = Files.createTempDirectory("lakeR").toString + "/db/t"
    val cdf = Files.createTempDirectory("cdfR").toString + "/db/t_changes"
    val cfg = TableConfig(Seq("id"), Nil, active = true)
    CdcPipeline.loadInitial(spark,
      Seq.empty ++ { // seed via a staged LOAD file
        val raw = Files.createTempDirectory("rawR").toString
        writeFile((1 to 3).map(i => ("I", i, s"v$i")).toDF("Op", "id", "v"),
          raw, "LOAD00000001.parquet")
        Seq(s"$raw/LOAD00000001.parquet")
      }, lake, cfg)
    val batch = Seq(("U", 2, "NEW")).toDF("Op", "id", "v")
      .withColumn(CdcPipeline.SrcFile, lit("20260812-000002.parquet"))
      .withColumn(CdcPipeline.RowIdx, lit(0L))
    val sink = CdcPipeline.ChangeFeedSink(cdf, Seq("v"), Some(7L))
    CdcPipeline.mergeTagged(spark, batch, lake, cfg, Some(sink))
    // crash-after-merge scenario: the same batch re-applies against the
    // ALREADY-MERGED target (a recompute would see v_old = "NEW")
    CdcPipeline.mergeTagged(spark, batch, lake, cfg, Some(sink))
    val feed = spark.read.parquet(cdf).collect()
    assert(feed.length == 1, "replay must not append a second feed copy")
    assert(feed.head.getAs[String]("v_old") == "v2",
      "completed batch partition must keep the ORIGINAL pre-image")
    assert(feed.head.getAs[String]("v_new") == "NEW")

    // partial-write healing: strip the _SUCCESS marker (simulated crash
    // mid-feed-write) — the replay overwrites the partition whole
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$cdf/batch_id=7/_SUCCESS"), false)
    CdcPipeline.mergeTagged(spark, batch, lake, cfg, Some(sink))
    val healed = spark.read.parquet(cdf).collect()
    assert(healed.length == 1, "incomplete partition must be rewritten, not appended")
  }
}
