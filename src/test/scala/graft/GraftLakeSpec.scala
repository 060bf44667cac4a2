package graft

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import java.nio.file.Files

class GraftLakeSpec extends SparkSpec {
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

  test("façade: discover → activate → sync → read → compact") {
    val raw = Files.createTempDirectory("raw").toString
    val out = Files.createTempDirectory("lake").toString
    val st = Files.createTempDirectory("state").toString
    writeFile(Seq(("I", 1, "a"), ("I", 2, "b")).toDF("Op", "id", "v"),
      s"$raw/db/t", "LOAD00000001.parquet")

    val lake = GraftLake(spark, raw, out, st)
    assert(lake.tables() == Seq("db/t"))
    assert(lake.sync()("db/t") == List(Controller.Skipped))

    lake.activate("db", "t", primaryKeys = Seq("id"))
    assert(lake.sync()("db/t") == List(Controller.FullLoad(2)))

    writeFile(Seq(("U", 1, "a2"), ("I", 3, "c")).toDF("Op", "id", "v"),
      s"$raw/db/t", "20260812-01.parquet")
    assert(lake.sync()("db/t") == List(Controller.Incremental(3, 1)))

    val df = lake.read("db", "t").orderBy("id")
    assert(df.collect().map(r => (r.getInt(1), r.getString(2))).toSeq ==
      Seq((1, "a2"), (2, "b"), (3, "c")))

    val stats = lake.compact("db", "t")
    assert(stats.rows == 3)
    assert(lake.read("db", "t").count() == 3)

    // SQL functions registered by the factory (fresh read: compaction
    // replaced the files under the pre-compaction DataFrame)
    lake.read("db", "t").createOrReplaceTempView("lake_t")
    assert(spark.sql("SELECT graft_simhash32(v) FROM lake_t").count() == 3)

    // drift pre-flight: no drift yet (Op is filtered as a control column)
    assert(lake.drift("db", "t").isEmpty)
    // a change file adds a column → reported as a compatible addition
    writeFile(Seq(("I", 4, "d", 1.5)).toDF("Op", "id", "v", "score"),
      s"$raw/db/t", "20260812-02.parquet")
    val changes = lake.drift("db", "t")
    assert(changes == Seq(io.SchemaDrift.Added("score", org.apache.spark.sql.types.DoubleType)))
    assert(io.SchemaDrift.isCompatible(changes))
    // and the sync merges it (evolution path), after which drift is clear
    assert(lake.sync()("db/t") == List(Controller.Incremental(1, 1)))
    assert(lake.drift("db", "t").isEmpty)

    // catalog: sync (re-)registered the lake table as a named view over
    // the POST-merge file set — SQL by name sees the evolved snapshot
    assert(spark.sql("SELECT count(*) FROM db_t").head().getLong(0) == 4)
    assert(spark.sql("SELECT v FROM db_t WHERE id = 1").head().getString(0) == "a2")
    assert(spark.sql("SELECT score FROM db_t WHERE id = 4").head().getDouble(0) == 1.5)

    // stats index: persisted build + data-skipping read through the
    // facade equals the plain filter; works unbuilt (fallback) too
    val unindexed = lake.readPruned("db", "t", "id", Some(2), Some(3))
    assert(unindexed.select("id").collect().map(_.getInt(0)).sorted.toSeq == Seq(2, 3))
    assert(lake.buildStatsIndex("db", "t", Seq("id")) >= 1L)
    val pruned = lake.readPruned("db", "t", "id", Some(2), Some(3))
    assert(pruned.select("id").collect().map(_.getInt(0)).sorted.toSeq == Seq(2, 3))
    // stale-safe: another sync rewrites files; the old index still answers
    writeFile(Seq(("I", 9, "z", 0.5)).toDF("Op", "id", "v", "score"),
      s"$raw/db/t", "20260812-03.parquet")
    lake.sync()
    val afterSync = lake.readPruned("db", "t", "id", Some(2), Some(9))
    assert(afterSync.select("id").collect().map(_.getInt(0)).sorted.toSeq ==
      Seq(2, 3, 4, 9))
  }

  test("catalog: registered tables are metastore-backed, visible from a new session") {
    val raw = Files.createTempDirectory("rawC").toString
    val out = Files.createTempDirectory("lakeC").toString
    val st = Files.createTempDirectory("stateC").toString
    writeFile(Seq(("I", 1, "x", "a"), ("I", 2, "y", "b"), ("I", 3, "x", "c"))
      .toDF("Op", "id", "bucket", "v"), s"$raw/db/ct", "LOAD00000001.parquet")
    val lake = GraftLake(spark, raw, out, st)
    lake.tables()
    lake.activate("db", "ct", primaryKeys = Seq("id"), partitionKeys = Seq("bucket"))
    lake.sync()
    assert(spark.sql("SELECT count(*) FROM db_ct").head().getLong(0) == 3)
    // a FRESH session sharing the catalog queries by name with zero
    // re-registration — the property a temp view cannot provide
    val s2 = spark.newSession()
    assert(s2.sql("SELECT v FROM db_ct WHERE id = 2").head().getString(0) == "b")
    // hive partitions were recovered into the catalog entry
    assert(s2.sql("SELECT count(*) FROM db_ct WHERE bucket = 'x'").head().getLong(0) == 2)
    // schema evolution: the next sync re-registers the evolved schema,
    // and new sessions see the new column
    writeFile(Seq(("I", 4, "y", "d", 9.5)).toDF("Op", "id", "bucket", "v", "score"),
      s"$raw/db/ct", "20260812-01.parquet")
    lake.sync()
    assert(spark.newSession().sql("SELECT score FROM db_ct WHERE id = 4")
      .head().getDouble(0) == 9.5)
  }

  test("stats index follows sync and compact automatically") {
    val raw = Files.createTempDirectory("rawS").toString
    val out = Files.createTempDirectory("lakeS").toString
    val st = Files.createTempDirectory("stateS").toString
    writeFile((1 to 8).map(i => ("I", i, s"v$i")).toDF("Op", "id", "v"),
      s"$raw/db/si", "LOAD00000001.parquet")
    val lake = GraftLake(spark, raw, out, st)
    lake.tables()
    lake.activate("db", "si", primaryKeys = Seq("id"))
    lake.sync()
    assert(lake.buildStatsIndex("db", "si", Seq("id")) >= 1L)
    def norm(f: String) = new org.apache.hadoop.fs.Path(f).toUri.getPath
    def indexed = spark.read.parquet(s"$out/_stats/db/si")
      .select("file").collect().map(r => norm(r.getString(0))).toSet
    def current = lake.read("db", "si").inputFiles.map(norm).toSet
    // a merge rewrites files; the next sync refreshes the index to match
    writeFile(Seq(("U", 3, "NEW")).toDF("Op", "id", "v"),
      s"$raw/db/si", "20260812-01.parquet")
    lake.sync()
    assert(indexed == current, "sync must refresh the persisted index")
    assert(lake.readPruned("db", "si", "id", Some(3), Some(3))
      .select("v").collect().map(_.getString(0)).toSeq == Seq("NEW"))
    // compaction rewrites everything; the index follows
    lake.compact("db", "si")
    assert(indexed == current, "compact must refresh the persisted index")
    assert(lake.readPruned("db", "si", "id", Some(2), Some(4)).count() == 3L)
  }

  test("bloom sidecar survives the auto-refresh; point reads prune through the lake API") {
    val raw = Files.createTempDirectory("rawB").toString
    val out = Files.createTempDirectory("lakeB").toString
    val st = Files.createTempDirectory("stateB").toString
    writeFile((1 to 8).map(i => ("I", i, s"k${i * 37 % 11}")).toDF("Op", "id", "v"),
      s"$raw/db/bp", "LOAD00000001.parquet")
    val lake = GraftLake(spark, raw, out, st)
    lake.tables()
    lake.activate("db", "bp", primaryKeys = Seq("id"))
    lake.sync()
    // no index yet: fallback full scan still answers
    assert(lake.readPrunedPoint("db", "bp", "v", "k8").count() == 1L)
    assert(lake.buildStatsIndex("db", "bp", Seq("id"),
      bloomCols = Seq("v"), bloomBits = 1 << 12) >= 1L)
    assert(lake.readPrunedPoint("db", "bp", "v", "k8")
      .select("id").head().getInt(0) == 2) // 2*37 % 11 = 8
    // a merge rewrites files; the auto-refresh must RECOVER the bloom
    // columns from the index schema (not drop them / fail the union)
    writeFile(Seq(("I", 9, "zz9")).toDF("Op", "id", "v"),
      s"$raw/db/bp", "20260812-01.parquet")
    lake.sync()
    val stats = spark.read.parquet(s"$out/_stats/db/bp")
    assert(stats.columns.contains("bloom_v") && stats.columns.contains("bloom_bits"))
    assert(stats.where(org.apache.spark.sql.functions.col("bloom_v").isNull).count() == 0,
      "refreshed rows must carry sidecars")
    assert(lake.readPrunedPoint("db", "bp", "v", "zz9")
      .select("id").head().getInt(0) == 9)
  }

  test("drift reports retypes across mixed-type raw files instead of throwing") {
    val raw = Files.createTempDirectory("raw").toString
    val out = Files.createTempDirectory("lake").toString
    val st = Files.createTempDirectory("state").toString
    writeFile(Seq(("I", 1, 10)).toDF("Op", "id", "qty"), s"$raw/db/r", "LOAD00000001.parquet")
    val lake = GraftLake(spark, raw, out, st)
    lake.activate("db", "r", primaryKeys = Seq("id"))
    assert(lake.sync()("db/r") == List(Controller.FullLoad(1)))
    // source retypes qty int→bigint; the OLD int32 file is still in the raw
    // dir, so Spark's own mergeSchema read of the dir would throw here
    writeFile(Seq(("U", 1, 20L)).toDF("Op", "id", "qty"), s"$raw/db/r", "20260812-01.parquet")
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    // pin mtime order: the retyped file is strictly newest
    fs.setTimes(new org.apache.hadoop.fs.Path(s"$raw/db/r/20260812-01.parquet"),
      System.currentTimeMillis() + 60000, -1)
    val changes = lake.drift("db", "r")
    assert(changes == Seq(io.SchemaDrift.TypeChanged("qty",
      org.apache.spark.sql.types.IntegerType, org.apache.spark.sql.types.LongType)))
    assert(io.SchemaDrift.isCompatible(changes))
  }

  test("façade: streamWithChangeFeed maintains lake + CDF log with inferred track columns") {
    val raw = Files.createTempDirectory("rawF").toString
    val out = Files.createTempDirectory("lakeF").toString
    val st = Files.createTempDirectory("stateF").toString
    val ckpt = Files.createTempDirectory("ckptF").toString
    // CDC files only (2* glob): first file plays the first-load batch
    writeFile((1 to 4).map(i => ("I", i, s"v$i")).toDF("Op", "id", "v"),
      s"$raw/db/t", "20260812-01.parquet")
    writeFile(Seq(("U", 2, "NEW"), ("D", 4, "v4")).toDF("Op", "id", "v"),
      s"$raw/db/t", "20260812-02.parquet")

    val lake = GraftLake(spark, raw, out, st)
    lake.tables()
    lake.activate("db", "t", primaryKeys = Seq("id"))
    val q = lake.streamWithChangeFeed("db", "t", ckpt, maxFilesPerTrigger = 1)
    q.awaitTermination()

    assert(lake.read("db", "t").count() == 3) // 4 - 1 delete
    val feed = lake.readChangeFeed("db", "t")
    // track columns inferred = all non-PK data columns (just "v")
    assert(feed.columns.contains("v_old") && feed.columns.contains("v_new"))
    val rows = feed.collect().map(r => (r.getAs[Int]("id"), r.getAs[String]("Op"),
      r.getAs[String]("v_old"), r.getAs[String]("v_new"))).toSet
    val initial = (1 to 4).map(i => (i, "I", null, s"v$i")).toSet
    assert(rows == initial ++ Set((2, "U", "v2", "NEW"), (4, "D", "v4", null)))

    // TIME TRAVEL from the log alone: state as of the first feed batch
    // is the initial load; as of the last batch it equals the lake's
    // current state (the prefix replay ≡ merge law, at the lake level)
    val batches0 = feed.select("batch_id").distinct()
      .collect().map(_.getLong(0)).sorted
    def asOf(b: Long) = lake.readAsOf("db", "t", b)
      .collect().map(r => (r.getInt(0), r.getString(1))).toSet
    assert(asOf(batches0.head) == (1 to 4).map(i => (i, s"v$i")).toSet)
    assert(asOf(batches0.last) ==
      lake.read("db", "t").select("id", "v")
        .collect().map(r => (r.getInt(0), r.getString(1))).toSet)

    // log-level vacuum: with maxFilesPerTrigger=1 the feed has one
    // batch_id partition per file; expire everything before the last one
    val batches = feed.select("batch_id").distinct()
      .collect().map(_.getLong(0)).sorted
    assert(batches.length >= 2)
    val (deleted, kept) = lake.vacuumChangeFeed("db", "t", batches.last)
    assert(deleted == batches.length - 1 && kept == 1)
    val after = lake.readChangeFeed("db", "t")
    assert(after.select("batch_id").distinct().collect()
      .map(_.getLong(0)).toSeq == Seq(batches.last))
    // idempotent + missing-feed behavior
    assert(lake.vacuumChangeFeed("db", "t", batches.last) == ((0, 1)))
    assert(lake.vacuumChangeFeed("db", "missing", 99L) == ((0, 0)))
    // time travel over a vacuumed (incomplete) feed must REFUSE, not
    // silently drop every key last touched before the cutoff
    val e = intercept[IllegalArgumentException] {
      lake.readAsOf("db", "t", batches.last)
    }
    assert(e.getMessage.contains("vacuum"))
  }

  test("façade: syncStreaming fans out one stream per active table, independent checkpoints") {
    val raw = Files.createTempDirectory("rawM").toString
    val out = Files.createTempDirectory("lakeM").toString
    val st = Files.createTempDirectory("stateM").toString
    val ckpt = Files.createTempDirectory("ckptM").toString
    writeFile(Seq(("I", 1, "a1"), ("I", 2, "a2")).toDF("Op", "id", "v"),
      s"$raw/db/a", "20260812-01.parquet")
    writeFile(Seq(("I", 1, "b1"), ("I", 2, "b2"), ("I", 3, "b3")).toDF("Op", "id", "v"),
      s"$raw/db/b", "20260812-01.parquet")

    val lake = GraftLake(spark, raw, out, st)
    lake.tables()
    lake.activate("db", "a", primaryKeys = Seq("id"))
    lake.activate("db", "b", primaryKeys = Seq("id"))
    val mgr = lake.syncStreaming(ckpt)
    try {
      mgr.awaitAll()
      assert(mgr.queries.keySet == Set("db/a", "db/b"))
      assert(mgr.failures.isEmpty, mgr.failures.toString)
      assert(lake.read("db", "a").count() == 2)
      assert(lake.read("db", "b").count() == 3)
      assert(new java.io.File(s"$ckpt/db/a").isDirectory)
      assert(new java.io.File(s"$ckpt/db/b").isDirectory)

      // per-table metrics land asynchronously on the listener bus
      // (inputRows counts source scans, and the merge re-reads the batch
      // for file-list/impacted/count/write — so >= file rows, not ==)
      val deadline = System.nanoTime() + 10L * 1000000000L
      var ok = false
      while (System.nanoTime() < deadline && !ok) {
        ok = mgr.metricsFor("db/a").exists(s => s.inputRows >= 2 && s.batches >= 1) &&
          mgr.metricsFor("db/b").exists(s => s.inputRows >= 3 && s.batches >= 1)
        if (!ok) Thread.sleep(50)
      }
      assert(ok, s"per-table metrics missing: a=${mgr.metricsFor("db/a")} b=${mgr.metricsFor("db/b")}")

      // a second catch-up after new data: restart the finished queries
      writeFile(Seq(("U", 1, "a1x")).toDF("Op", "id", "v"), s"$raw/db/a", "20260812-02.parquet")
      mgr.startAll().awaitAll()
      assert(lake.read("db", "a").where($"id" === 1).head().getAs[String]("v") == "a1x")
    } finally mgr.stopAll()
  }

  test("façade: syncStreaming with mergeOnRead converges to the batch Controller's lake") {
    // the same raw tree drives three lakes: MOR-streaming, MOR-batch,
    // and CoW-batch — all three must agree table-by-table (manager-level
    // stream ≡ batch ≡ CoW semantics; r9 verdict Next #7)
    val raw = Files.createTempDirectory("rawMor").toString
    def snapA = Seq(("I", 1, "a1"), ("I", 2, "a2"), ("I", 3, "a3")).toDF("Op", "id", "v")
    def snapB = Seq(("I", 1, "b1"), ("I", 2, "b2")).toDF("Op", "id", "v")
    writeFile(snapA, s"$raw/db/a", "LOAD00000001.parquet")
    writeFile(snapB, s"$raw/db/b", "LOAD00000001.parquet")

    def mkLake(mor: Boolean): (GraftLake, String) = {
      val out = Files.createTempDirectory("lakeMor").toString
      val lake = GraftLake(spark, raw, out,
        Files.createTempDirectory("stateMor").toString)
      lake.tables()
      lake.activate("db", "a", primaryKeys = Seq("id"), mergeOnRead = mor)
      lake.activate("db", "b", primaryKeys = Seq("id"), mergeOnRead = mor)
      (lake, out)
    }
    val (lakeS, _) = mkLake(mor = true)
    // batch initial load (C3 → loadInitialMor) before any CDC exists
    lakeS.sync()

    // CDC lands after the snapshot; the streaming manager merges it
    writeFile(Seq(("U", 1, "a1x"), ("D", 2, "x"), ("I", 9, "a9"))
      .toDF("Op", "id", "v"), s"$raw/db/a", "20260815-01.parquet")
    writeFile(Seq(("U", 1, "a1y")).toDF("Op", "id", "v"),
      s"$raw/db/a", "20260815-02.parquet")
    writeFile(Seq(("D", 2, "x"), ("I", 7, "b7")).toDF("Op", "id", "v"),
      s"$raw/db/b", "20260815-01.parquet")
    val mgr = lakeS.syncStreaming(Files.createTempDirectory("ckptMor").toString)
    try { mgr.awaitAll(); assert(mgr.failures.isEmpty, mgr.failures.toString) }
    finally mgr.stopAll()

    // batch MOR and batch CoW lakes process the full tree in one sync
    val (lakeB, _) = mkLake(mor = true)
    lakeB.sync()
    val (lakeC, _) = mkLake(mor = false)
    lakeC.sync()

    def content(l: GraftLake, t: String): Set[String] =
      l.read("db", t).select("Op", "id", "v").collect().map(_.toString).toSet
    for (t <- Seq("a", "b")) {
      assert(content(lakeS, t) == content(lakeB, t),
        s"db/$t: streaming MOR != batch MOR")
      assert(content(lakeB, t) == content(lakeC, t),
        s"db/$t: MOR != CoW semantics")
    }
    assert(content(lakeS, "a") ==
      Set("[U,1,a1y]", "[I,3,a3]", "[I,9,a9]"))

    // lake.compact routes MOR tables through the format's own
    // compact+vacuum (PK-clustered) — content bit-identical after
    val preCompact = content(lakeS, "a")
    lakeS.compact("db", "a")
    assert(content(lakeS, "a") == preCompact, "MOR maintenance changed content")
    // file-level stats indexes stay a CoW surface: fail loud, not wrong
    intercept[IllegalArgumentException](
      lakeS.buildStatsIndex("db", "a", Seq("id")))
  }

  test("auto-maintenance: sync trips compact+vacuum exactly at the amplification threshold") {
    val raw = Files.createTempDirectory("rawMaint").toString
    val out = Files.createTempDirectory("lakeMaint").toString
    val lake = GraftLake(spark, raw, out,
      Files.createTempDirectory("stateMaint").toString)
    writeFile(Seq.tabulate(10)(i => ("I", i + 1, s"v${i + 1}"))
      .toDF("Op", "id", "v"), s"$raw/db/t", "LOAD00000001.parquet")
    lake.tables()
    lake.activate("db", "t", primaryKeys = Seq("id"), mergeOnRead = true)
    lake.sync()

    // small churn: 2 of 10 keys updated → amp = 2 eq keys / 12 data rows
    writeFile(Seq(("U", 1, "v1a"), ("U", 2, "v2a")).toDF("Op", "id", "v"),
      s"$raw/db/t", "20260816-01.parquet")
    lake.sync()
    val h1 = lake.morHealth("db", "t").get
    assert(h1.eqKeys == 2 && h1.dataRows == 12)
    assert(h1.amplification < GraftLake.DefaultMaxAmplification)
    // sync ran the check but the stat is under budget → did NOT fire:
    // the equality sidecar is still physically there
    assert(h1.eqFiles > 0, "healthy table must keep its sidecars untouched")
    assert(lake.maintainIfNeeded("db", "t").isEmpty)

    // churny ingest: 8 of 10 keys updated → amp = 10/20 = 0.5 > 0.3,
    // so THIS sync's own check must fire the compact+vacuum pair
    writeFile(Seq.tabulate(8)(i => ("U", i + 1, s"v${i + 1}b"))
      .toDF("Op", "id", "v"), s"$raw/db/t", "20260816-02.parquet")
    lake.sync()
    val h2 = lake.morHealth("db", "t").get
    assert(h2.eqKeys == 0 && h2.maskRows == 0,
      s"auto-maintenance must re-flatten the mask ledger, got $h2")
    assert(h2.dataRows == 10, s"live rows only after sweep, got $h2")
    assert(h2.amplification == 0.0)
    // content is untouched by maintenance: the 8 churned + 2 older values
    val got = lake.read("db", "t").select("id", "v").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(got == (1 to 8).map(i => i -> s"v${i}b").toMap ++
      Map(9 -> "v9", 10 -> "v10"))

    // an explicit low-threshold call fires exactly when the stat says…
    writeFile(Seq(("U", 9, "v9c"), ("U", 10, "v10c")).toDF("Op", "id", "v"),
      s"$raw/db/t", "20260816-03.parquet")
    lake.sync() // amp = 2/12 < 0.3: auto check leaves it
    val h3 = lake.morHealth("db", "t").get
    assert(h3.eqKeys == 2)
    val fired = lake.maintainIfNeeded("db", "t", maxAmplification = 0.05)
    // …returning the PRE-maintenance readout that justified it
    assert(fired.contains(h3))
    // and an immediate re-check is a no-op (flat again)
    assert(lake.maintainIfNeeded("db", "t", maxAmplification = 0.05).isEmpty)
    assert(lake.morHealth("db", "t").get.maskRows == 0)
  }

  test("conditional merge guard (updateWhen) routes batch and streaming identically") {
    // guard: updates land only when the incoming price is HIGHER; a NULL
    // incoming price is UNKNOWN → keep (the SQL MERGE semantics pinned
    // in MergeSpec); deletes and inserts ride unconditionally
    def mkRaw(): String = {
      val raw = Files.createTempDirectory("rawCond").toString
      writeFile(Seq(("I", 1, Some(10.0)), ("I", 2, Some(20.0)), ("I", 3, Some(30.0)))
        .toDF("Op", "id", "price"), s"$raw/db/t", "LOAD00000001.parquet")
      raw
    }
    // two separate deliveries: the clause fold sees each BATCH's final
    // image, so the batch path syncs per file to match the
    // one-file-per-trigger stream (same granularity → same results)
    def cdc1(raw: String): Unit =
      writeFile(Seq(("U", 1, Some(5.0)), ("U", 2, Some(25.0)), ("I", 4, Some(40.0)))
        .toDF("Op", "id", "price"), s"$raw/db/t", "20260816-01.parquet")
    def cdc2(raw: String): Unit =
      writeFile(Seq(("U", 2, Option.empty[Double]), ("D", 3, Option.empty[Double]))
        .toDF("Op", "id", "price"), s"$raw/db/t", "20260816-02.parquet")
    def content(l: GraftLake): Map[Int, Double] =
      l.read("db", "t").select("id", "price").collect()
        .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val expected = Map(
      1 -> 10.0, // guard false (5 > 10 fails): target kept
      2 -> 25.0, // delivery-1 update applied; delivery-2 NULL price is
                 // UNKNOWN → kept (not lost, not nulled)
      4 -> 40.0) // inserted; 3 deleted unconditionally

    // batch Controller path
    val rawB = mkRaw()
    val lakeB = GraftLake(spark, rawB, Files.createTempDirectory("lakeCondB").toString,
      Files.createTempDirectory("stCondB").toString)
    lakeB.tables()
    lakeB.activate("db", "t", primaryKeys = Seq("id"),
      updateWhen = Some("c.price > t.price"))
    lakeB.sync()
    cdc1(rawB); lakeB.sync()
    cdc2(rawB); lakeB.sync()
    assert(content(lakeB) == expected)

    // streaming path over the same feed, one micro-batch per file
    val rawS = mkRaw()
    val lakeS = GraftLake(spark, rawS, Files.createTempDirectory("lakeCondS").toString,
      Files.createTempDirectory("stCondS").toString)
    lakeS.tables()
    lakeS.activate("db", "t", primaryKeys = Seq("id"),
      updateWhen = Some("c.price > t.price"))
    lakeS.sync() // initial load
    cdc1(rawS); cdc2(rawS)
    val mgr = lakeS.syncStreaming(
      Files.createTempDirectory("ckptCond").toString, maxFilesPerTrigger = 1)
    try { mgr.awaitAll(); assert(mgr.failures.isEmpty, mgr.failures.toString) }
    finally mgr.stopAll()
    assert(content(lakeS) == expected, "stream must equal batch under the guard")
  }

  test("auto-maintenance: streaming maintainEvery re-flattens sidecars mid-stream") {
    val raw = Files.createTempDirectory("rawMaintS").toString
    val out = Files.createTempDirectory("lakeMaintS").toString
    val lake = GraftLake(spark, raw, out,
      Files.createTempDirectory("stateMaintS").toString)
    writeFile(Seq.tabulate(10)(i => ("I", i + 1, s"v${i + 1}"))
      .toDF("Op", "id", "v"), s"$raw/db/t", "LOAD00000001.parquet")
    lake.tables()
    lake.activate("db", "t", primaryKeys = Seq("id"), mergeOnRead = true)
    lake.sync() // MOR initial load

    // churn well past the threshold, delivered by the streaming manager
    // with a check after every micro-batch
    writeFile(Seq.tabulate(9)(i => ("U", i + 1, s"v${i + 1}s"))
      .toDF("Op", "id", "v"), s"$raw/db/t", "20260816-01.parquet")
    val mgr = lake.syncStreaming(
      Files.createTempDirectory("ckptMaintS").toString, maintainEvery = 1)
    try { mgr.awaitAll(); assert(mgr.failures.isEmpty, mgr.failures.toString) }
    finally mgr.stopAll()

    val h = lake.morHealth("db", "t").get
    assert(h.maskRows == 0 && h.dataRows == 10,
      s"stream-side maintenance must have re-flattened, got $h")
    val got = lake.read("db", "t").select("id", "v").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(got == (1 to 9).map(i => i -> s"v${i}s").toMap + (10 -> "v10"))
  }

  test("StreamManager isolates a broken table and restartFailed recovers it") {
    val raw = Files.createTempDirectory("rawB").toString
    val out = Files.createTempDirectory("lakeB").toString
    val st = Files.createTempDirectory("stateB").toString
    val ckpt = Files.createTempDirectory("ckptB").toString
    writeFile(Seq(("I", 1, "g1")).toDF("Op", "id", "v"), s"$raw/db/good", "20260812-01.parquet")
    // corrupt parquet: schema inference at stream start throws
    val badDir = new java.io.File(s"$raw/db/bad"); badDir.mkdirs()
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$raw/db/bad/20260812-01.parquet"),
      "not a parquet file".getBytes)

    val lake = GraftLake(spark, raw, out, st)
    lake.tables()
    lake.activate("db", "good", primaryKeys = Seq("id"))
    lake.activate("db", "bad", primaryKeys = Seq("id"))
    val mgr = lake.syncStreaming(ckpt)
    try {
      mgr.awaitAll()
      // the broken table failed; the good one is untouched by it
      assert(mgr.failures.keySet == Set("db/bad"), mgr.failures.toString)
      assert(lake.read("db", "good").count() == 1)

      // repair the raw file, then restart only the dead stream
      val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(s"$raw/db/bad/20260812-01.parquet"), false)
      writeFile(Seq(("I", 7, "fixed")).toDF("Op", "id", "v"),
        s"$raw/db/bad", "20260812-01.parquet")
      assert(mgr.restartFailed() == Seq("db/bad"))
      mgr.awaitAll()
      assert(mgr.failures.isEmpty, mgr.failures.toString)
      assert(lake.read("db", "bad").head().getAs[String]("v") == "fixed")
    } finally mgr.stopAll()
  }

  test("façade: syncSearchIndex folds the change feed into a BM25 index ≡ fresh index over lake state") {
    import graft.ops.Retrieval
    val raw = Files.createTempDirectory("rawS").toString
    val out = Files.createTempDirectory("lakeS").toString
    val st = Files.createTempDirectory("stateS").toString
    val ckpt = Files.createTempDirectory("ckptS").toString
    writeFile((1 to 4).map(i => ("I", i, s"alpha beta doc$i")).toDF("Op", "id", "v"),
      s"$raw/db/s", "20260812-01.parquet")
    writeFile(Seq(("U", 2, "gamma gamma delta"), ("D", 4, "alpha beta doc4"))
      .toDF("Op", "id", "v"), s"$raw/db/s", "20260812-02.parquet")

    val lake = GraftLake(spark, raw, out, st)
    lake.tables()
    lake.activate("db", "s", primaryKeys = Seq("id"))
    lake.streamWithChangeFeed("db", "s", ckpt, maxFilesPerTrigger = 1)
      .awaitTermination()

    val idx = lake.searchIndexName("db", "s")
    try {
      val applied = lake.syncSearchIndex("db", "s", "v", buckets = 2)
      assert(applied.nonEmpty)
      // re-sync: everything already applied (ledger-gated)
      assert(lake.syncSearchIndex("db", "s", "v", buckets = 2).isEmpty)

      val q = Seq((0L, "alpha gamma"), (1L, "beta delta")).toDF("qid", "qtext")
      def key(df: DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.get(1).toString, r.getDouble(2), r.getLong(3))).toSet
      val probe = Retrieval.bm25AgainstIndex(spark, idx, q, "qid", "qtext", k = 10)
      val fresh = Retrieval.bm25TopK(lake.read("db", "s").select(col("id"), col("v")),
        q, "id", "v", "qid", "qtext", k = 10)
      assert(key(probe) == key(fresh) && key(probe).nonEmpty)
      // the deleted doc is gone, the updated doc scores on its NEW text
      val ids = probe.select(col("id")).distinct().collect().map(_.get(0).toString).toSet
      assert(!ids.contains("4"))
    } finally Seq(idx, idx + "_docs", idx + "_segments", idx + "_tombstones")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }
}
