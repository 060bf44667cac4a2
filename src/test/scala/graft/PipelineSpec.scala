package graft

import graft.cdc.TableConfig
import graft.io.{CdcPipeline, Discovery}
import graft.state.{JsonFileStateStore, TableItem}
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** End-to-end pipeline test replicating the reference's manual walkthrough
  * (FIXTURES.md §1): a raw bucket with LOAD snapshots + one incremental CDC
  * batch (1 update + 1 delete + 1 insert + order inserts), run through
  * Controller twice (second run must be a watermark no-op).
  */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private def writeParquetFile(df: DataFrame, dir: String, name: String): Unit = {
    // Write a single parquet file with an exact (DMS-style) name.
    val tmp = Files.createTempDirectory("stage").toString
    df.coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp)
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val part = fs.listStatus(new org.apache.hadoop.fs.Path(tmp))
      .map(_.getPath).find(_.getName.endsWith(".parquet")).get
    fs.mkdirs(new org.apache.hadoop.fs.Path(dir))
    fs.rename(part, new org.apache.hadoop.fs.Path(s"$dir/$name"))
    fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
  }

  private def products = (1001 to 1025).map(i =>
    ("I", i, s"Product $i", s"Dept ${i % 5}", s"Cat ${i % 3}", BigDecimal(i) * 2))
    .toDF("Op", "id", "name", "dept", "category", "price")

  private def stores = (1001 to 1008).map(i =>
    ("I", i, s"$i Main St", "City", "CA", "US", "90210"))
    .toDF("Op", "id", "address1", "city", "state", "countrycode", "postcode")

  test("walkthrough E2E: initial + incremental + watermark no-op rerun") {
    val raw = Files.createTempDirectory("raw").toString
    val lake = Files.createTempDirectory("lake").toString
    val stateDir = Files.createTempDirectory("state").toString

    writeParquetFile(products, s"$raw/sampledb/product", "LOAD00000001.parquet")
    writeParquetFile(stores, s"$raw/sampledb/store", "LOAD00000001.parquet")

    val store = new JsonFileStateStore(stateDir)
    val ctl = new Controller(spark, store, raw, lake, parallelism = 2)

    // Run 1 with inactive tables: everything skipped (C5 gate).
    assert(ctl.runOnce().values.forall(_ == List(Controller.Skipped)))

    // Activate with PKs (the reference's human step, README.md:87).
    Discovery.listTables(raw).foreach { t =>
      val item = store.get(t.dir).get
      store.put(item.copy(config = TableConfig(Seq("id"), Nil, active = true)))
    }

    // Run 2: initial loads.
    val r2 = ctl.runOnce()
    assert(r2("sampledb/product") == List(Controller.FullLoad(25)))
    assert(r2("sampledb/store") == List(Controller.FullLoad(8)))
    assert(spark.read.parquet(s"$lake/sampledb/product").count() == 25)

    // Incremental batch = the reference's exact test vector
    // (DMSCDC_SampleDB_Incremental.sql:3-6).
    val productCdc = Seq(
      ("U", 1001, "Sample Product", "Sample Dept", "Sample Category", BigDecimal(39.00)),
      ("D", 1002, "Product 1002", "Dept 2", "Cat 2", BigDecimal(2004)))
      .toDF("Op", "id", "name", "dept", "category", "price")
    val storeCdc = Seq(("I", 1009, "125 Technology Dr.", "Irvine", "CA", "US", "92618"))
      .toDF("Op", "id", "address1", "city", "state", "countrycode", "postcode")
    writeParquetFile(productCdc, s"$raw/sampledb/product", "20260812-000000001.parquet")
    writeParquetFile(storeCdc, s"$raw/sampledb/store", "20260812-000000001.parquet")

    // Run 3: incremental merges.
    val r3 = ctl.runOnce()
    // rowsWritten counts the merge's output rows: product's two changes hit
    // the single snapshot file (all 25 rows rewritten, minus the delete);
    // store's insert touches no existing file (append of 1 row only).
    assert(r3("sampledb/product") == List(Controller.Incremental(24, 1)))
    assert(r3("sampledb/store") == List(Controller.Incremental(1, 1)))

    val productLake = spark.read.parquet(s"$lake/sampledb/product")
    assert(productLake.count() == 24) // 25 - 1 delete
    assert(productLake.filter($"id" === 1002).count() == 0)
    val p1001 = productLake.filter($"id" === 1001).collect()
    assert(p1001.length == 1 && p1001(0).getAs[String]("name") == "Sample Product")
    assert(spark.read.parquet(s"$lake/sampledb/store").count() == 9)

    // Run 4: nothing new → no-op (C3/C4/C8 watermarks hold).
    assert(ctl.runOnce().values.forall(_ == List(Controller.NoNewData)))
  }

  test("merge-on-read storage mode: same walkthrough end state, append-only commits") {
    val raw = Files.createTempDirectory("rawM").toString
    val lake = Files.createTempDirectory("lakeM").toString
    val stateDir = Files.createTempDirectory("stateM").toString
    writeParquetFile(products, s"$raw/sampledb/product", "LOAD00000001.parquet")
    val store = new JsonFileStateStore(stateDir)
    val ctl = new Controller(spark, store, raw, lake, parallelism = 2)
    ctl.runOnce() // discovers + defaults
    Discovery.listTables(raw).foreach { t =>
      val item = store.get(t.dir).get
      store.put(item.copy(config =
        TableConfig(Seq("id"), Nil, active = true, mergeOnRead = true)))
    }
    assert(ctl.runOnce()("sampledb/product") == List(Controller.FullLoad(25)))
    val path = s"$lake/sampledb/product"
    assert(graft.io.MorTable.read(spark, path).count() == 25)
    val before = graft.io.MorTable.dataFiles(spark, path).toSet

    val productCdc = Seq(
      ("U", 1001, "Sample Product", "Sample Dept", "Sample Category", BigDecimal(39.00)),
      ("D", 1002, "Product 1002", "Dept 2", "Cat 2", BigDecimal(2004)))
      .toDF("Op", "id", "name", "dept", "category", "price")
    writeParquetFile(productCdc, s"$raw/sampledb/product", "20260812-000000001.parquet")
    // MOR rowsWritten counts APPENDED winners (1 update; the delete only
    // supersedes) — not the CoW rewrite volume (24)
    assert(ctl.runOnce()("sampledb/product") == List(Controller.Incremental(1, 1)))

    val merged = graft.io.MorTable.read(spark, path)
    assert(merged.count() == 24)
    assert(merged.filter($"id" === 1002).count() == 0)
    val p1001 = merged.filter($"id" === 1001).collect()
    assert(p1001.length == 1 && p1001(0).getAs[String]("name") == "Sample Product")
    // append-only: every snapshot file survives the merge untouched
    assert(before.subsetOf(graft.io.MorTable.dataFiles(spark, path).toSet))
    // config round-trips through the JSON state store
    val pDir = Discovery.listTables(raw).find(_.key == "sampledb/product").get.dir
    assert(store.get(pDir).get.config.mergeOnRead)
    // watermark no-op rerun holds in MOR mode too
    assert(ctl.runOnce()("sampledb/product") == List(Controller.NoNewData))

    // C3 full RE-load after incrementals (r9 advisor, high): a newer
    // LOAD file must TRUNCATE the previous MOR epoch — before the r10
    // init fix, commits 1+ survived and the re-loaded table read as the
    // new snapshot UNION stale winners
    val reload = Seq(("I", 2001, "Reloaded", "D", "C", BigDecimal(1.0)))
      .toDF("Op", "id", "name", "dept", "category", "price")
    Thread.sleep(1100) // LOAD mtime gates on second-granularity stamps
    writeParquetFile(reload, s"$raw/sampledb/product", "LOAD00000002.parquet")
    val acts = ctl.runOnce()("sampledb/product")
    assert(acts.exists { case Controller.FullLoad(_) => true; case _ => false }, acts.toString)
    val reloaded = graft.io.MorTable.read(spark, path)
    // LOAD files accumulate (reference semantics: a full load reads ALL
    // LOAD* files): 25 original + 1 new row, NO stale post-CDC winners
    assert(reloaded.count() == 26, s"got ${reloaded.count()}")
    assert(reloaded.filter($"id" === 1002).count() == 1,
      "the pre-reload delete must not leak into the new epoch")
    assert(reloaded.filter($"id" === 1001).head().getAs[String]("name") == "Product 1001",
      "the pre-reload update must not leak into the new epoch")
  }

  test("updateWhen guard end-to-end through the Controller (CoW and MOR)") {
    for (mor <- Seq(false, true)) {
      val tag = if (mor) "MOR" else "CoW"
      val raw = Files.createTempDirectory(s"rawG$tag").toString
      val lake = Files.createTempDirectory(s"lakeG$tag").toString
      val stateDir = Files.createTempDirectory(s"stateG$tag").toString
      writeParquetFile(products, s"$raw/sampledb/product", "LOAD00000001.parquet")
      val store = new JsonFileStateStore(stateDir)
      val ctl = new Controller(spark, store, raw, lake, parallelism = 2)
      ctl.runOnce() // discover + defaults
      // the guard in the JSON state: only updates RAISING the price apply
      Discovery.listTables(raw).foreach { t =>
        store.put(store.get(t.dir).get.copy(config = TableConfig(Seq("id"), Nil,
          active = true, mergeOnRead = mor,
          updateWhen = Some("c.price > t.price"))))
      }
      assert(ctl.runOnce()("sampledb/product") == List(Controller.FullLoad(25)),
        s"[$tag] initial load")
      // guard round-trips through the JSON store (discovery → state → merge)
      val pDir = Discovery.listTables(raw).find(_.key == "sampledb/product").get.dir
      assert(store.get(pDir).get.config.updateWhen.contains("c.price > t.price"))

      // batch 1: a guard-PASSING update (price 2002 -> 5000), a
      // guard-FAILING update (price 2006 -> 1), an unconditional delete
      // and an unconditional insert
      val cdc1 = Seq(
        ("U", 1001, "Raised", "D", "C", BigDecimal(5000)),
        ("U", 1003, "Lowered", "D", "C", BigDecimal(1)),
        ("D", 1002, "x", "x", "x", BigDecimal(0)),
        ("I", 2001, "Fresh", "D", "C", BigDecimal(7)))
        .toDF("Op", "id", "name", "dept", "category", "price")
      writeParquetFile(cdc1, s"$raw/sampledb/product", "20260812-000000001.parquet")
      val acts = ctl.runOnce()("sampledb/product")
      assert(acts.forall { case Controller.Incremental(_, _) => true; case _ => false },
        s"[$tag] $acts")
      def lake1 = if (mor) graft.io.MorTable.read(spark, s"$lake/sampledb/product")
                  else spark.read.parquet(s"$lake/sampledb/product")
      val byId = lake1.select($"id", $"name", $"price".cast("double"))
        .collect().map(r => r.getInt(0) -> (r.getString(1), r.getDouble(2))).toMap
      assert(byId(1001) == (("Raised", 5000.0)), s"[$tag] guard-true update must apply")
      assert(byId(1003) == (("Product 1003", 2006.0)),
        s"[$tag] guard-false update must keep the target row across runs")
      assert(!byId.contains(1002), s"[$tag] deletes ride unconditionally")
      assert(byId(2001) == (("Fresh", 7.0)), s"[$tag] inserts ride unconditionally")
      assert(byId.size == 25, s"[$tag] 25 - 1 delete + 1 insert")

      // batch 2: the previously-rejected key now passes the guard — the
      // kept target row (not the rejected image) is what the new guard
      // evaluates against
      val cdc2 = Seq(("U", 1003, "RaisedLate", "D", "C", BigDecimal(9000)))
        .toDF("Op", "id", "name", "dept", "category", "price")
      writeParquetFile(cdc2, s"$raw/sampledb/product", "20260812-000000002.parquet")
      ctl.runOnce()
      val p1003 = lake1.filter($"id" === 1003).collect()
      assert(p1003.length == 1 &&
        p1003(0).getAs[String]("name") == "RaisedLate", s"[$tag] late pass-through")
      // watermark no-op rerun holds for guarded tables too
      assert(ctl.runOnce()("sampledb/product") == List(Controller.NoNewData))
    }
  }

  test("mergeOnRead without a primary key fails the table, not the run") {
    val raw = Files.createTempDirectory("rawM2").toString
    val lake = Files.createTempDirectory("lakeM2").toString
    val store = new JsonFileStateStore(Files.createTempDirectory("stateM2").toString)
    writeParquetFile(products, s"$raw/db/t", "LOAD00000001.parquet")
    writeParquetFile(products.where($"id" === 1001), s"$raw/db/t",
      "20260812-000000001.parquet")
    val ctl = new Controller(spark, store, raw, lake, parallelism = 1)
    ctl.runOnce()
    val tDir = Discovery.listTables(raw).find(_.key == "db/t").get.dir
    val item = store.get(tDir).get
    store.put(item.copy(config = TableConfig(Nil, Nil, active = true, mergeOnRead = true)))
    val r = ctl.runOnce()("db/t")
    assert(r.exists {
      case Controller.Failed(msg) => msg.contains("primary key")
      case _ => false
    }, s"expected a primary-key Failed action, got $r")
  }

  test("partitioned initial load writes hive layout") {
    val raw = Files.createTempDirectory("raw").toString
    val lake = Files.createTempDirectory("lake").toString
    val df = (1 to 100).map(i => ("I", i, s"n$i", i % 4)).toDF("Op", "id", "name", "bucket")
    writeParquetFile(df, s"$raw/db/t", "LOAD00000001.parquet")
    CdcPipeline.loadInitial(spark, Discovery.loadFiles(s"$raw/db/t"), s"$lake/db/t",
      TableConfig(Seq("id"), Seq("bucket"), active = true))
    val dirs = new java.io.File(s"$lake/db/t").listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.toSet == Set("bucket=0", "bucket=1", "bucket=2", "bucket=3"))
    assert(spark.read.parquet(s"$lake/db/t").count() == 100)
  }

  test("copy-on-write: impacted files rewritten, untouched files kept") {
    val lake = Files.createTempDirectory("lake").toString
    val raw = Files.createTempDirectory("raw").toString
    val out = s"$lake/db/t"
    // two target files: keys 1-10 and 11-20
    writeParquetFile((1 to 10).map(i => ("I", i, s"v$i")).toDF("Op", "id", "v"), out, "part-a.parquet")
    writeParquetFile((11 to 20).map(i => ("I", i, s"v$i")).toDF("Op", "id", "v"), out, "part-b.parquet")
    // change touches only key 3 → only part-a should be rewritten
    writeParquetFile(Seq(("U", 3, "NEW")).toDF("Op", "id", "v"), s"$raw/db/t", "20260812-1.parquet")
    val stats = CdcPipeline.loadIncremental(spark,
      Seq(s"$raw/db/t/20260812-1.parquet"), out, TableConfig(Seq("id"), Nil, active = true))
    assert(stats.impactedFiles.map(f => f.substring(f.lastIndexOf('/') + 1)) == Seq("part-a.parquet"))
    val files = new java.io.File(out).listFiles().map(_.getName).filter(_.endsWith(".parquet"))
    assert(files.contains("part-b.parquet") && !files.contains("part-a.parquet"))
    val back = spark.read.parquet(out)
    assert(back.count() == 20)
    assert(back.filter($"id" === 3).head().getAs[String]("v") == "NEW")
  }

  test("partitioned incremental merge: copy-on-write inside hive partitions") {
    val lake = Files.createTempDirectory("lake").toString + "/db/t"
    val raw = Files.createTempDirectory("raw").toString + "/db/t"
    val cfg = TableConfig(Seq("id"), Seq("bucket"), active = true)
    writeParquetFile((1 to 40).map(i => ("I", i, s"v$i", i % 2)).toDF("Op", "id", "v", "bucket"),
      raw, "LOAD00000001.parquet")
    CdcPipeline.loadInitial(spark, Seq(s"$raw/LOAD00000001.parquet"), lake, cfg)
    // update one key in bucket 0 → only bucket 0's file rewritten
    writeParquetFile(Seq(("U", 2, "NEW", 0)).toDF("Op", "id", "v", "bucket"),
      raw, "20260812-1.parquet")
    val b1Before = new java.io.File(s"$lake/bucket=1").listFiles().map(_.getName).toSet
    val stats = CdcPipeline.loadIncremental(spark, Seq(s"$raw/20260812-1.parquet"), lake, cfg)
    assert(stats.impactedFiles.forall(_.contains("bucket=0")))
    val b1After = new java.io.File(s"$lake/bucket=1").listFiles().map(_.getName).toSet
    assert(b1After == b1Before, "untouched partition's files must not change")
    val back = spark.read.parquet(lake)
    assert(back.count() == 40)
    assert(back.filter($"id" === 2).head().getAs[String]("v") == "NEW")
    assert(back.filter($"bucket" === 0).count() == 20)
  }

  test("one failing table does not abort the run; its watermark holds") {
    val raw = Files.createTempDirectory("raw").toString
    val lake = Files.createTempDirectory("lake").toString
    val stateDir = Files.createTempDirectory("state").toString
    writeParquetFile(Seq(("I", 1, "a")).toDF("Op", "id", "v"), s"$raw/db/good", "LOAD00000001.parquet")
    // corrupt "parquet" file in the bad table
    val badDir = new java.io.File(s"$raw/db/bad"); badDir.mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$raw/db/bad/LOAD00000001.parquet"), "not parquet at all")
    val store = new JsonFileStateStore(stateDir)
    val ctl = new Controller(spark, store, raw, lake, parallelism = 2)
    ctl.runOnce() // register defaults
    Discovery.listTables(raw).foreach { t =>
      store.put(store.get(t.dir).get.copy(config = TableConfig(Seq("id"), Nil, active = true)))
    }
    val r = ctl.runOnce()
    assert(r("db/good") == List(Controller.FullLoad(1)))
    assert(r("db/bad").head.isInstanceOf[Controller.Failed])
    // failed table's full-load watermark did not advance → retried next run
    val badState = store.get(Discovery.listTables(raw).find(_.key == "db/bad").get.dir).get
    assert(badState.state.lastFullLoadDate == "1900-01-01 00:00:00")
  }

  test("per-table timeout: slow table fails alone, sibling commits") {
    val raw = Files.createTempDirectory("raw").toString
    val lake = Files.createTempDirectory("lake").toString
    val stateDir = Files.createTempDirectory("state").toString
    writeParquetFile(Seq(("I", 1, "a")).toDF("Op", "id", "v"), s"$raw/db/good", "LOAD00000001.parquet")
    writeParquetFile(Seq(("I", 2, "b")).toDF("Op", "id", "v"), s"$raw/db/slow", "LOAD00000001.parquet")
    val store = new JsonFileStateStore(stateDir)
    // Fault injection: the slow table's load wedges (never completes within
    // its budget); the controller must report Failed(timeout) for it while
    // the sibling's result and watermark commit normally.
    val ctl = new Controller(spark, store, raw, lake, parallelism = 2,
      tableTimeout = scala.concurrent.duration.Duration(2, "s")) {
      override protected def processTable(t: Discovery.TableDir,
                                          item: TableItem): List[Controller.Action] =
        if (t.key == "db/slow") { Thread.sleep(15000); List(Controller.NoNewData) }
        else super.processTable(t, item)
    }
    ctl.runOnce() // register defaults
    Discovery.listTables(raw).foreach { t =>
      store.put(store.get(t.dir).get.copy(config = TableConfig(Seq("id"), Nil, active = true)))
    }
    val r = ctl.runOnce()
    assert(r("db/good") == List(Controller.FullLoad(1)))
    r("db/slow") match {
      case List(Controller.Failed(msg)) => assert(msg.contains("timeout"))
      case other => fail(s"expected timeout failure, got $other")
    }
    // The timed-out table's watermark held (C8); the sibling's advanced.
    val slowState = store.get(Discovery.listTables(raw).find(_.key == "db/slow").get.dir).get
    assert(slowState.state.lastFullLoadDate == "1900-01-01 00:00:00")
    val goodState = store.get(Discovery.listTables(raw).find(_.key == "db/good").get.dir).get
    assert(goodState.state.lastFullLoadDate > "1900-01-01 00:00:00")
  }

  test("a load that outlives its timeout cannot commit watermarks") {
    val raw = Files.createTempDirectory("raw").toString
    val lake = Files.createTempDirectory("lake").toString
    val stateDir = Files.createTempDirectory("state").toString
    writeParquetFile(Seq(("I", 1, "a")).toDF("Op", "id", "v"), s"$raw/db/zombie", "LOAD00000001.parquet")
    val store = new JsonFileStateStore(stateDir)
    val attempted = new java.util.concurrent.CountDownLatch(1)
    // Fault injection: the load wedges past its budget, SURVIVES the
    // interrupt (swallows it), and then tries to commit the way the real
    // pipeline does — the commit gate must hold the watermark.
    val ctl = new Controller(spark, store, raw, lake, parallelism = 1,
      tableTimeout = scala.concurrent.duration.Duration(1, "s")) {
      override protected def processTable(t: Discovery.TableDir,
                                          item: TableItem): List[Controller.Action] = {
        try Thread.sleep(30000) catch { case _: InterruptedException => () }
        commitFullLoad(t, "2026-08-12 00:00:00")
        attempted.countDown()
        List(Controller.FullLoad(1))
      }
    }
    ctl.runOnce() // register defaults
    Discovery.listTables(raw).foreach { t =>
      store.put(store.get(t.dir).get.copy(config = TableConfig(Seq("id"), Nil, active = true)))
    }
    val r = ctl.runOnce()
    r("db/zombie") match {
      case List(Controller.Failed(msg)) => assert(msg.contains("timeout"))
      case other => fail(s"expected timeout failure, got $other")
    }
    assert(attempted.await(20, java.util.concurrent.TimeUnit.SECONDS),
      "zombie never reached its commit attempt")
    val state = store.get(Discovery.listTables(raw).head.dir).get
    assert(state.state.lastFullLoadDate == "1900-01-01 00:00:00",
      "a timed-out load advanced its watermark")
  }

  test("no-PK table: insert-only append semantics") {
    val lake = Files.createTempDirectory("lake").toString
    val raw = Files.createTempDirectory("raw").toString
    writeParquetFile(Seq(("I", 1, "a"), ("U", 2, "b"), ("D", 3, "c"))
      .toDF("Op", "id", "v"), s"$raw/db/t", "20260812-1.parquet")
    val stats = CdcPipeline.loadIncremental(spark,
      Seq(s"$raw/db/t/20260812-1.parquet"), s"$lake/db/t", TableConfig(Nil, Nil, active = true))
    assert(stats.insertOnly && stats.rowsWritten == 1)
    assert(spark.read.parquet(s"$lake/db/t").count() == 1)
    // reference-parity default: replay DUPLICATES (documented caveat)
    CdcPipeline.loadIncremental(spark,
      Seq(s"$raw/db/t/20260812-1.parquet"), s"$lake/db/t", TableConfig(Nil, Nil, active = true))
    assert(spark.read.parquet(s"$lake/db/t").count() == 2)
  }

  test("no-PK replay guard: reprocessing the same file keeps exactly one copy") {
    val lake = Files.createTempDirectory("lake").toString
    val raw = Files.createTempDirectory("raw").toString
    val cfg = TableConfig(Nil, Nil, active = true, replayGuard = true)
    writeParquetFile(Seq(("I", 1, "a"), ("I", 2, "b")).toDF("Op", "id", "v"),
      s"$raw/db/t", "20260812-1.parquet")
    writeParquetFile(Seq(("I", 3, "c")).toDF("Op", "id", "v"),
      s"$raw/db/t", "20260812-2.parquet")
    val files = Seq(s"$raw/db/t/20260812-1.parquet", s"$raw/db/t/20260812-2.parquet")
    val stats = CdcPipeline.loadIncremental(spark, files, s"$lake/db/t", cfg)
    assert(stats.insertOnly && stats.rowsWritten == 3)
    assert(spark.read.parquet(s"$lake/db/t").count() == 3)

    // replay the WHOLE batch → partitions rewritten, still one copy
    CdcPipeline.loadIncremental(spark, files, s"$lake/db/t", cfg)
    assert(spark.read.parquet(s"$lake/db/t").count() == 3)

    // replay with different batch regrouping (one file alone) → same
    CdcPipeline.loadIncremental(spark, files.take(1), s"$lake/db/t", cfg)
    val back = spark.read.parquet(s"$lake/db/t")
    assert(back.count() == 3)
    assert(back.select("id").as[Int].collect().sorted.toSeq == Seq(1, 2, 3))
    // and a genuinely new file still appends
    writeParquetFile(Seq(("I", 4, "d")).toDF("Op", "id", "v"),
      s"$raw/db/t", "20260812-3.parquet")
    CdcPipeline.loadIncremental(spark, Seq(s"$raw/db/t/20260812-3.parquet"), s"$lake/db/t", cfg)
    assert(spark.read.parquet(s"$lake/db/t").count() == 4)
  }
}
