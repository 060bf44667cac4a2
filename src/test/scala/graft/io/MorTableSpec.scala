package graft.io

import graft.SparkSpec
import graft.cdc.{Merge, Op}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Merge-on-read table format: read ≡ copy-on-write merge on the same
  * change sequence; commit-marker visibility; compaction/vacuum
  * invariants; the no-target-shuffle read plan. */
class MorTableSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("mor").toString + "/t"

  /** 20-key snapshot + two change batches (same shape as the shared CDC
    * fixture, small enough to reason about exactly). */
  private def snapshot: DataFrame =
    spark.range(20).select(
      lit(Op.Insert).as(Op.column), $"id".as("k"),
      concat(lit("v"), $"id").as("v"))

  private def batch(seq: Long, rows: Seq[(String, Long, String)]): DataFrame =
    rows.toDF(Op.column, "k", "v").withColumn(Merge.FileSeq, lit(seq))

  private def asSet(df: DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("two merges reconstruct exactly the CoW latest-wins result") {
    val base = tmp()
    MorTable.init(spark, snapshot, base)
    val b1 = batch(1L, Seq(("U", 0L, "u0"), ("D", 1L, "x"), ("I", 100L, "n100"),
      ("U", 2L, "u2")))
    val b2 = batch(2L, Seq(("U", 0L, "w0"), ("D", 100L, "x"), ("I", 101L, "n101")))
    MorTable.merge(spark, b1, base, Seq("k"))
    MorTable.merge(spark, b2, base, Seq("k"))

    val cow = Merge.mergeCdc(snapshot,
      b1.unionByName(b2), Seq("k"), Nil)
    assert(asSet(MorTable.read(spark, base)) == asSet(cow))
    // delete-of-insert across commits: 100 gone, 101 present
    val ks = MorTable.read(spark, base).select("k").as[Long].collect().toSet
    assert(!ks.contains(100L) && ks.contains(101L) && !ks.contains(1L))
  }

  test("merge never rewrites stored files; only appends batch dirs") {
    val base = tmp()
    MorTable.init(spark, snapshot, base)
    val before = MorTable.dataFiles(spark, base).toSet
    MorTable.merge(spark, batch(1L, Seq(("U", 0L, "u0"))), base, Seq("k"))
    val after = MorTable.dataFiles(spark, base).toSet
    assert(before.subsetOf(after), "stored files must survive a merge untouched")
    assert((after -- before).forall(_.contains("batch=1")))
  }

  test("uncommitted batch dirs are invisible to readers") {
    val base = tmp()
    MorTable.init(spark, snapshot, base)
    // simulate a crashed merge: data + delete dirs written, no commit
    Seq(("I", 999L, "ghost")).toDF(Op.column, "k", "v")
      .write.parquet(s"$base/data/batch=7")
    Seq(("file:///nowhere", 0L)).toDF(MorTable.DelFile, MorTable.DelPos)
      .write.parquet(s"$base/deletes/batch=7")
    assert(asSet(MorTable.read(spark, base)) == asSet(snapshot))
    // vacuum reclaims the orphans
    MorTable.vacuum(spark, base)
    val fs = new Path(base).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new Path(s"$base/data/batch=7")))
    assert(!fs.exists(new Path(s"$base/deletes/batch=7")))
  }

  test("compact + vacuum: content identical, dead files physically gone") {
    val base = tmp()
    MorTable.init(spark, snapshot, base)
    // supersede 3 of every 5-row batch-0 file (range partitions hold
    // contiguous keys) → each file 60% dead but none fully dead
    val upd = (0L until 20L).filter(_ % 5 < 3).map(i => ("U", i, s"u$i"))
    MorTable.merge(spark, batch(1L, upd), base, Seq("k"))
    val expected = asSet(MorTable.read(spark, base))

    val victims = MorTable.compact(spark, base, minDeadFraction = 0.5)
    assert(victims.nonEmpty, "60%-dead batch-0 files must be compaction victims")
    assert(asSet(MorTable.read(spark, base)) == expected)

    // compact left a lowering receipt: vacuum's step-1 scan is skipped
    val fs2 = new Path(base).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs2.listStatus(new Path(s"$base/commits")).toSeq
      .exists(_.getPath.getName.endsWith(".lowered")),
      "compact must write a lowering receipt")

    val (removed, shrunk) = MorTable.vacuum(spark, base)
    assert(removed >= 1L, "fully-dead victim file must be physically deleted")
    assert(shrunk > 0L, "sidecar entries for removed files must re-baseline away")
    assert(asSet(MorTable.read(spark, base)) == expected)
    assert(!fs2.listStatus(new Path(s"$base/commits")).toSeq
      .exists(_.getPath.getName.endsWith(".lowered")),
      "vacuum sweeps vacuous receipts with the equality dirs")
    // victims no longer on disk
    val left = MorTable.dataFiles(spark, base).toSet
    assert(victims.forall(v => !left.contains(v)))
  }

  test("clustered compaction restores zone-map prunability (overlap depth 1)") {
    val base = tmp()
    // interleaved layout: hash repartition scatters keys across files
    MorTable.init(spark, spark.range(200).select(
      lit("I").as(Op.column), $"id".as("k"), concat(lit("v"), $"id").as("v"))
      .repartition(4), base)
    val upd = (0L until 200L).filter(_ % 2 == 0L).map(i => ("U", i, s"u$i"))
    MorTable.merge(spark, batch(1L, upd), base, Seq("k"))
    val expected = asSet(MorTable.read(spark, base))

    // maxRecordsPerFile splits each (sorted) range partition into
    // several files — sequential splits of a sorted run stay contiguous
    val victims = MorTable.compact(spark, base, minDeadFraction = 0.4,
      maxRecordsPerFile = 30L, clusterBy = Seq("k"))
    assert(victims.nonEmpty)
    MorTable.vacuum(spark, base)
    assert(asSet(MorTable.read(spark, base)) == expected)

    // the compaction batch's files each own a contiguous k range
    val compactDir = MorTable.dataFiles(spark, base)
      .filter(_.contains(s"batch=${2}")) // init=0, merge=1, compact=2
    assert(compactDir.size > 1, "range repartition should emit several files")
    val stats = StatsIndex.buildFiles(spark, base, compactDir, Seq("k"))
      .withColumn("g", lit("c"))
    val depth = StatsIndex.overlapDepth(stats, "k", "g")
      .select($"max_depth").as[Long].head()
    assert(depth == 1L, s"clustered compaction must yield depth 1, got $depth")
  }

  test("schema evolution: later batches carry new columns, old rows null-fill") {
    val base = tmp()
    MorTable.init(spark, snapshot, base)
    val evolved = batch(1L, Seq(("U", 0L, "u0"), ("I", 50L, "n50")))
      .withColumn("channel", lit("online"))
    MorTable.merge(spark, evolved, base, Seq("k"))
    val out = MorTable.read(spark, base)
    assert(out.columns.contains("channel"))
    val m = out.select("k", "channel").as[(Long, Option[String])].collect().toMap
    assert(m(0L).contains("online") && m(50L).contains("online"))
    assert(m(5L).isEmpty, "pre-evolution rows null-fill the new column")
  }

  test("read plan: no exchange on the data side (broadcast anti-join)") {
    val base = tmp()
    MorTable.init(spark, snapshot, base)
    MorTable.merge(spark, batch(1L, Seq(("D", 3L, "x"))), base, Seq("k"))
    val plan = MorTable.read(spark, base).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoop"),
      s"delete sidecar should broadcast:\n$plan")
  }

  test("readAsOf: every commit prefix reconstructs its historical state") {
    val base = tmp()
    MorTable.init(spark, snapshot, base)
    val b1 = batch(1L, Seq(("U", 0L, "u0"), ("D", 1L, "x"), ("I", 100L, "n100")))
    val b2 = batch(2L, Seq(("U", 0L, "w0"), ("D", 100L, "x")))
    MorTable.merge(spark, b1, base, Seq("k"))
    MorTable.merge(spark, b2, base, Seq("k"))
    assert(asSet(MorTable.readAsOf(spark, base, 0L)) == asSet(snapshot))
    assert(asSet(MorTable.readAsOf(spark, base, 1L)) ==
      asSet(Merge.mergeCdc(snapshot, b1, Seq("k"), Nil)))
    assert(asSet(MorTable.readAsOf(spark, base, 2L)) ==
      asSet(MorTable.read(spark, base)))
    intercept[IllegalArgumentException](MorTable.readAsOf(spark, base, -1L))
  }

  test("time travel survives compaction (equality dirs retained until vacuum)") {
    val base = tmp()
    MorTable.init(spark, snapshot, base)
    val b1 = batch(1L, Seq(("U", 0L, "u0"), ("D", 1L, "x"), ("I", 100L, "n100")))
    val b2 = batch(2L, Seq(("U", 0L, "w0"), ("D", 100L, "x")))
    MorTable.merge(spark, b1, base, Seq("k"))
    MorTable.merge(spark, b2, base, Seq("k"))
    val asOf1 = asSet(MorTable.readAsOf(spark, base, 1L))
    val current = asSet(MorTable.read(spark, base))

    // compact lowers eq deletes to positions but RETAINS the eq dirs,
    // so every pre-compact prefix still reconstructs exactly
    assert(MorTable.compact(spark, base, minDeadFraction = 0.01).nonEmpty)
    assert(asSet(MorTable.readAsOf(spark, base, 0L)) == asSet(snapshot))
    assert(asSet(MorTable.readAsOf(spark, base, 1L)) == asOf1)
    assert(asSet(MorTable.read(spark, base)) == current)

    // vacuum is the history barrier: current state still exact
    MorTable.vacuum(spark, base)
    assert(asSet(MorTable.read(spark, base)) == current)
  }

  test("commitDiff: I/U/D classified from commit structure; moves are silent") {
    val base = tmp()
    MorTable.init(spark, snapshot, base)
    MorTable.merge(spark, batch(1L, Seq(
      ("U", 0L, "u0"),          // value update → U
      ("U", 1L, "v1"),          // same-value rewrite → silent
      ("D", 2L, "x"),           // delete → D
      ("I", 100L, "n100"))),    // insert → I
      base, Seq("k"))
    val feed = MorTable.commitDiff(spark, base, 1L, Seq("k"), Seq("v"))
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), Option(r.getString(2)), Option(r.getString(3)))).toMap
    assert(feed(0L) == (("U", Some("v0"), Some("u0"))))
    assert(feed(2L) == (("D", Some("v2"), None)))
    assert(feed(100L) == (("I", None, Some("n100"))))
    assert(!feed.contains(1L), "same-value rewrite must be silent")

    // compaction commits only MOVE rows → empty feed
    val upd = (0L until 20L).filter(_ % 5 < 3).map(i => ("U", i, s"w$i"))
    MorTable.merge(spark, batch(2L, upd), base, Seq("k"))
    val victims = MorTable.compact(spark, base, minDeadFraction = 0.4)
    assert(victims.nonEmpty)
    val compactBatch = MorTable.committedBatches(spark, base).last
    assert(MorTable.commitDiff(spark, base, compactBatch, Seq("k"), Seq("v")).count() == 0L,
      "a compaction commit must emit no feed rows")

    // an ALL-DELETE commit (partless data dir) still diffs: pure D rows
    MorTable.merge(spark, batch(3L, Seq(("D", 19L, "x"))), base, Seq("k"))
    val delOnly = MorTable.committedBatches(spark, base).last
    val dFeed = MorTable.commitDiff(spark, base, delOnly, Seq("k"), Seq("v")).collect()
    assert(dFeed.length == 1 && dFeed.head.getString(1) == "D" &&
      dFeed.head.getLong(0) == 19L)

    // vacuum's sidecar-consolidation commit (no data dir, old delete
    // dirs swept) must also be silent — not fabricate deletes
    MorTable.vacuum(spark, base)
    val vacBatch = MorTable.committedBatches(spark, base).last
    assert(vacBatch > compactBatch)
    assert(MorTable.commitDiff(spark, base, vacBatch, Seq("k"), Seq("v")).count() == 0L,
      "a vacuum consolidation commit must emit no feed rows")
  }

  test("conditional merge (updateWhen): guard semantics identical to the CoW clause; stream ≡ batch") {
    import org.apache.spark.sql.SaveMode
    import org.apache.spark.sql.streaming.Trigger
    val guard = col("t.v") =!= "v0" // key 0's row is immutable until first changed
    val b1 = batch(1L, Seq(("U", 0L, "u0"), ("U", 2L, "u2"), ("D", 1L, "x"),
      ("I", 100L, "n100")))
    val b2 = batch(2L, Seq(("U", 0L, "w0"), ("U", 2L, "w2")))

    // batch path: one guarded MOR merge per delivery == sequential CoW
    // conditional merges over the same deliveries
    val base = tmp()
    MorTable.init(spark, snapshot, base)
    MorTable.merge(spark, b1, base, Seq("k"), updateWhen = Some(guard))
    val cow1 = Merge.mergeConditional(snapshot, b1, Seq("k"), Nil, guard)
    assert(asSet(MorTable.read(spark, base)) == asSet(cow1))
    // key 0 kept its target row (guard false), key 2 took the update,
    // the delete and insert rode unconditionally
    val st1 = MorTable.read(spark, base).select("k", "v").as[(Long, String)]
      .collect().toMap
    assert(st1(0L) == "v0" && st1(2L) == "u2" && !st1.contains(1L) &&
      st1(100L) == "n100")
    MorTable.merge(spark, b2, base, Seq("k"), updateWhen = Some(guard))
    val cow2 = Merge.mergeConditional(cow1, b2, Seq("k"), Nil, guard)
    assert(asSet(MorTable.read(spark, base)) == asSet(cow2))
    // key 0 still guarded; key 2's second update passes (t.v = u2 now)
    val st2 = MorTable.read(spark, base).select("k", "v").as[(Long, String)]
      .collect().toMap
    assert(st2(0L) == "v0" && st2(2L) == "w2")

    // streaming twin: the same two deliveries through startMor's
    // updateWhen reach the identical state
    val raw = Files.createTempDirectory("morCondRaw").toString + "/db/t"
    val sBase = tmp()
    val ckpt = Files.createTempDirectory("morCondCkpt").toString
    MorTable.init(spark, snapshot, sBase)
    def writeFile(df: DataFrame, name: String): Unit = {
      val stage = Files.createTempDirectory("stage").toString
      df.coalesce(1).write.mode(SaveMode.Overwrite).parquet(stage)
      val fs = new Path(raw).getFileSystem(spark.sparkContext.hadoopConfiguration)
      val part = fs.listStatus(new Path(stage))
        .map(_.getPath).find(_.getName.endsWith(".parquet")).get
      fs.mkdirs(new Path(raw))
      fs.rename(part, new Path(s"$raw/$name"))
      fs.delete(new Path(stage), true)
    }
    writeFile(b1.drop(Merge.FileSeq), "20260815-000001.parquet")
    writeFile(b2.drop(Merge.FileSeq), "20260815-000002.parquet")
    graft.streaming.CdcStream.startMor(spark, raw, sBase, Seq("k"), ckpt,
      Trigger.AvailableNow(), maxFilesPerTrigger = 1,
      updateWhen = Some("t.v <> 'v0'"))
      .awaitTermination()
    assert(asSet(MorTable.read(spark, sBase)) == asSet(cow2),
      "stream with updateWhen must converge to the sequential guarded batch state")
  }

  test("streaming MOR: file-stream deliveries ≡ the CoW batch merge") {
    import org.apache.spark.sql.SaveMode
    import org.apache.spark.sql.streaming.Trigger
    val raw = Files.createTempDirectory("morRaw").toString + "/db/t"
    val base = tmp()
    val ckpt = Files.createTempDirectory("morCkpt").toString
    MorTable.init(spark, snapshot, base)
    // two CDC files delivered one per micro-batch (maxFilesPerTrigger=1)
    def writeFile(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val stage = Files.createTempDirectory("stage").toString
      df.coalesce(1).write.mode(SaveMode.Overwrite).parquet(stage)
      val fs = new Path(raw).getFileSystem(spark.sparkContext.hadoopConfiguration)
      val part = fs.listStatus(new Path(stage))
        .map(_.getPath).find(_.getName.endsWith(".parquet")).get
      fs.mkdirs(new Path(raw))
      fs.rename(part, new Path(s"$raw/$name"))
      fs.delete(new Path(stage), true)
    }
    writeFile(Seq(("U", 0L, "u0"), ("D", 1L, "x"), ("I", 100L, "n100"))
      .toDF(Op.column, "k", "v"), "20260815-000001.parquet")
    writeFile(Seq(("U", 0L, "w0"), ("D", 100L, "x"))
      .toDF(Op.column, "k", "v"), "20260815-000002.parquet")
    val q = graft.streaming.CdcStream.startMor(spark, raw, base, Seq("k"),
      ckpt, Trigger.AvailableNow(), maxFilesPerTrigger = 1)
    q.awaitTermination()
    val cow = Merge.mergeCdc(snapshot,
      batch(1L, Seq(("U", 0L, "u0"), ("D", 1L, "x"), ("I", 100L, "n100")))
        .unionByName(batch(2L, Seq(("U", 0L, "w0"), ("D", 100L, "x")))),
      Seq("k"), Nil)
    assert(asSet(MorTable.read(spark, base)) == asSet(cow))
    // provenance columns never leak into the lake schema
    assert(MorTable.read(spark, base).columns.forall(!_.startsWith("__")))
  }

  test("merge commit plans scan ZERO target data files (O(batch) commit)") {
    import scala.jdk.CollectionConverters._
    val base = tmp()
    MorTable.init(spark, snapshot, base)
    MorTable.merge(spark, batch(1L, Seq(("U", 0L, "u0"))), base, Seq("k"))
    // the change batch comes from a parquet FILE so its scan is the
    // listener-drained sentinel (an in-memory batch would leave the
    // zero-scan assert vacuously passing on undelivered events)
    val chgDir = Files.createTempDirectory("morChg").toString
    batch(2L, Seq(("U", 5L, "u5"), ("D", 6L, "x"), ("I", 300L, "n300")))
      .write.mode("overwrite").parquet(chgDir)
    val scanned = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      private def walk(p: SparkPlan): Unit = p.foreach {
        case f: FileSourceScanExec => f.relation.location.inputFiles.foreach(scanned.add)
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: QueryStageExec => walk(q.plan)
        case _ =>
      }
      override def onSuccess(fn: String, qe: org.apache.spark.sql.execution.QueryExecution,
                             ns: Long): Unit = walk(qe.executedPlan)
      override def onFailure(fn: String, qe: org.apache.spark.sql.execution.QueryExecution,
                             e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      MorTable.merge(spark, spark.read.parquet(chgDir), base, Seq("k"))
      // QueryExecutionListener delivery is async: drain until the change
      // scan shows up (proves events for this merge were delivered)
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (!scanned.asScala.exists(_.contains(chgDir.stripPrefix("file:"))) &&
             System.nanoTime() < deadline) Thread.sleep(50)
    } finally spark.listenerManager.unregister(listener)
    val files = scanned.asScala.toSet
    assert(files.exists(_.contains(chgDir.stripPrefix("file:"))),
      s"listener never saw the change-batch scan: $files")
    val target = files.filter(f => f.contains(base) && f.contains("/data/batch="))
    assert(target.isEmpty,
      s"a MOR merge commit must not read the stored table, but scanned: $target")
    // and the commit is real: latest-wins content holds
    val ks = MorTable.read(spark, base).select("k").as[Long].collect().toSet
    assert(ks.contains(300L) && !ks.contains(6L))
  }

  test("a GUARDED merge's target probe reads strictly fewer base files than the table") {
    import scala.jdk.CollectionConverters._
    // the fixture is a handful of files — drop the big-table gate so the
    // pruning machinery itself is under test
    spark.conf.set(MorTable.MinPruneFilesConf, "1")
    val base = tmp()
    // range-disjoint multi-file layout: sorted single-partition writes
    // split at 25 records -> 4 files per commit, each owning a
    // contiguous key range (zone-map-prunable, the compact(clusterBy)
    // shape)
    val snap = spark.range(100).orderBy("id").coalesce(1).select(
      lit(Op.Insert).as(Op.column), $"id".as("k"), concat(lit("v"), $"id").as("v"))
    MorTable.init(spark, snap, base, maxRecordsPerFile = 25L)
    val b1 = spark.range(200, 300).orderBy("id").coalesce(1).select(
      lit(Op.Insert).as(Op.column), $"id".as("k"), concat(lit("w"), $"id").as("v"))
      .withColumn(Merge.FileSeq, lit(1L))
    MorTable.merge(spark, b1, base, Seq("k"), maxRecordsPerFile = 25L)
    // guarded merge #1 backfills the PK stats sidecar (the one full
    // stats scan of the lifecycle — the id-map backfill precedent)
    val g = col("c.v") =!= col("t.v")
    MorTable.merge(spark,
      batch(2L, Seq(("U", 10L, "g10"))), base, Seq("k"),
      maxRecordsPerFile = 25L, updateWhen = Some(g))
    val allFiles = MorTable.dataFiles(spark, base)
    assert(allFiles.size >= 8, s"fixture must be multi-file, got ${allFiles.size}")
    Thread.sleep(2000) // drain the async listener bus of the backfill's events

    // guarded merge #2: keys confined to ONE key range — the probe must
    // open strictly fewer committed data files than the table holds
    val scanned = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      private def walk(p: SparkPlan): Unit = p.foreach {
        case f: FileSourceScanExec => f.relation.location.inputFiles.foreach(scanned.add)
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: QueryStageExec => walk(q.plan)
        case _ =>
      }
      override def onSuccess(fn: String, qe: org.apache.spark.sql.execution.QueryExecution,
                             ns: Long): Unit = walk(qe.executedPlan)
      override def onFailure(fn: String, qe: org.apache.spark.sql.execution.QueryExecution,
                             e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      MorTable.merge(spark,
        batch(3L, Seq(("U", 210L, "g210"), ("U", 211L, "w211"))), base, Seq("k"),
        maxRecordsPerFile = 25L, updateWhen = Some(g))
      // drain: wait until the probe's target scan shows up
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (!scanned.asScala.exists(_.contains("/data/batch=")) &&
             System.nanoTime() < deadline) Thread.sleep(50)
      Thread.sleep(1000) // settle remaining async deliveries
    } finally spark.listenerManager.unregister(listener)
    val norm = (s: String) => s.stripPrefix("file:").replaceAll("^/+", "/")
    val target = scanned.asScala.toSet.filter(_.contains("/data/batch=")).map(norm)
    val all = allFiles.map(norm).toSet
    assert(target.nonEmpty, "sentinel: the guarded probe must read some target data")
    assert((target -- all).forall(_.contains("batch=3")),
      s"unexpected scans outside the committed set: ${target -- all}")
    val committedScanned = target.intersect(all)
    assert(committedScanned.size < all.size,
      s"guarded probe must open strictly fewer files: ${committedScanned.size} vs ${all.size}")
    // and it pruned to the probed key range: no snapshot (batch=0) file opened
    assert(!committedScanned.exists(_.contains("batch=0")),
      s"keys 210/211 must not open the 0-99 snapshot files: $committedScanned")

    // semantics unchanged by pruning: 210's guard holds (g210 != w210 ->
    // update), 211's fails (w211 == w211 -> keep target); re-check the
    // whole sequence against the unpruned CoW conditional fold
    val s1 = Merge.mergeCdc(snap, b1, Seq("k"), Nil)
    val s2 = Merge.mergeConditional(s1,
      batch(2L, Seq(("U", 10L, "g10"))), Seq("k"), Nil, g)
    val want = Merge.mergeConditional(s2,
      batch(3L, Seq(("U", 210L, "g210"), ("U", 211L, "w211"))), Seq("k"), Nil, g)
    assert(asSet(MorTable.read(spark, base)) == asSet(want))
    spark.conf.unset(MorTable.MinPruneFilesConf)
  }

  test("commitDiff pre-image scans are pruned: eq commits via PK stats, pos commits via the sidecar's own file list") {
    import scala.jdk.CollectionConverters._
    spark.conf.set(MorTable.MinPruneFilesConf, "1")
    val base = tmp()
    // same range-disjoint multi-file layout as the guarded-probe test
    val snap = spark.range(100).orderBy("id").coalesce(1).select(
      lit(Op.Insert).as(Op.column), $"id".as("k"), concat(lit("v"), $"id").as("v"))
    MorTable.init(spark, snap, base, maxRecordsPerFile = 25L)
    // a guarded merge leaves the PK stats sidecar behind (read-only
    // consumers only ever exploit it, never build it)
    MorTable.merge(spark, batch(1L, Seq(("U", 10L, "g10"))), base, Seq("k"),
      maxRecordsPerFile = 25L, updateWhen = Some(col("c.v") =!= col("t.v")))
    // an UNGUARDED merge whose keys live in one 25-row range
    MorTable.merge(spark, batch(2L, Seq(("U", 30L, "u30"), ("D", 31L, "x"))),
      base, Seq("k"), maxRecordsPerFile = 25L)
    val all = MorTable.dataFiles(spark, base)
    assert(all.size >= 5, s"fixture must be multi-file, got ${all.size}")
    Thread.sleep(2000) // drain the async listener bus

    val scanned = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      private def walk(p: SparkPlan): Unit = p.foreach {
        case fe: FileSourceScanExec => fe.relation.location.inputFiles.foreach(scanned.add)
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: QueryStageExec => walk(q.plan)
        case _ =>
      }
      override def onSuccess(fn: String, qe: org.apache.spark.sql.execution.QueryExecution,
                             ns: Long): Unit = walk(qe.executedPlan)
      override def onFailure(fn: String, qe: org.apache.spark.sql.execution.QueryExecution,
                             e: Exception): Unit = ()
    }
    val norm = (s: String) => s.stripPrefix("file:").replaceAll("^/+", "/")
    def drainScans(body: => Unit): Set[String] = {
      scanned.clear()
      spark.listenerManager.register(listener)
      try {
        body
        val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
        while (!scanned.asScala.exists(_.contains("/data/batch=")) &&
               System.nanoTime() < deadline) Thread.sleep(50)
        Thread.sleep(1000)
      } finally spark.listenerManager.unregister(listener)
      scanned.asScala.toSet.filter(_.contains("/data/batch=")).map(norm)
    }

    // EQ-commit diff (batch 2, keys 30/31): candidate pruning through
    // the stats the guarded merge left — must not open every data file
    val feed = drainScans {
      val rows = MorTable.commitDiff(spark, base, 2L, Seq("k"), Seq("v"))
        .collect()
      val byOp = rows.groupBy(_.getAs[String]("change_op"))
      assert(byOp(Op.Update).map(_.getAs[Long]("k")).toSet == Set(30L))
      assert(byOp(Op.Delete).map(_.getAs[Long]("k")).toSet == Set(31L))
    }
    val allN = all.map(norm).toSet
    assert(feed.intersect(allN).size < allN.size,
      s"eq-commit diff must scan fewer files: ${feed.intersect(allN).size} of ${allN.size}")

    // POS-commit diff (a compaction): pre-images come from exactly the
    // files the position sidecar names
    val victims = MorTable.compact(spark, base, minDeadFraction = 0.01)
    assert(victims.nonEmpty, "compaction must rewrite something")
    Thread.sleep(2000) // drain compaction's own scan events first
    val cb = MorTable.committedBatches(spark, base).last
    val posScans = drainScans {
      assert(MorTable.commitDiff(spark, base, cb, Seq("k"), Seq("v")).isEmpty,
        "a compaction commit moves rows; its value feed is empty")
    }
    val allNow = MorTable.dataFiles(spark, base).map(norm).toSet ++ allN
    val preSide = posScans.intersect(allN) -- victims.map(norm).toSet
    assert(preSide.isEmpty,
      s"pos-commit pre-images must read only sidecar-named files, extra: $preSide")
    assert(posScans.intersect(allNow).nonEmpty, "sentinel: some data was scanned")
    spark.conf.unset(MorTable.MinPruneFilesConf)
  }

  test("re-init truncates the previous epoch (reference C3 full reload)") {
    val base = tmp()
    MorTable.init(spark, snapshot, base)
    MorTable.merge(spark, batch(1L, Seq(("U", 0L, "u0"), ("I", 100L, "n100"))),
      base, Seq("k"))
    MorTable.merge(spark, batch(2L, Seq(("D", 3L, "x"))), base, Seq("k"))
    // a newer LOAD file arrives: the fresh snapshot must be the WHOLE
    // table — no stale winners or masks from commits 1-2 may survive
    val snap2 = spark.range(5).select(
      lit(Op.Insert).as(Op.column), ($"id" + 1000L).as("k"),
      concat(lit("s"), $"id").as("v"))
    MorTable.init(spark, snap2, base)
    assert(MorTable.committedBatches(spark, base) == Seq(0L),
      "re-init must truncate the prior commit ledger")
    assert(asSet(MorTable.read(spark, base)) == asSet(snap2))
    // and the table keeps working: a post-reload merge applies cleanly
    MorTable.merge(spark, batch(1L, Seq(("U", 1000L, "w"))), base, Seq("k"))
    val m = MorTable.read(spark, base).select("k", "v")
      .as[(Long, String)].collect().toMap
    assert(m(1000L) == "w" && m(1004L) == "s4" && m.size == 5)
  }

  test("NULL primary keys: the NULL group keeps exactly one survivor (CoW parity)") {
    val base = tmp()
    val snap = Seq((Op.Insert, Some(1L), "a"), (Op.Insert, Option.empty[Long], "n0"))
      .toDF(Op.column, "k", "v")
    MorTable.init(spark, snap, base)
    def one(op: String, v: String, seq: Long) =
      Seq((op, Option.empty[Long], v)).toDF(Op.column, "k", "v")
        .withColumn(Merge.FileSeq, lit(seq))
    MorTable.merge(spark, one("U", "n1", 1L), base, Seq("k"))
    MorTable.merge(spark, one("U", "n2", 2L), base, Seq("k"))
    val nulls = MorTable.read(spark, base).where($"k".isNull)
      .select("v").as[String].collect().toSeq
    assert(nulls == Seq("n2"),
      s"repeated NULL-key changes must converge to one survivor, got $nulls")
    // parity with the CoW window merge on the same sequence
    val cow = Merge.mergeCdc(snap, one("U", "n1", 1L).unionByName(one("U", "n2", 2L)),
      Seq("k"), Nil)
    assert(asSet(MorTable.read(spark, base)) == asSet(cow))
    // a winning NULL-key delete removes the group
    MorTable.merge(spark, one("D", "x", 3L), base, Seq("k"))
    assert(MorTable.read(spark, base).where($"k".isNull).count() == 0L)
  }

  test("file-list filters gate to broadcast joins above the In-list cap") {
    val df = spark.range(100).select(
      concat(lit("f"), $"id" % 10).as("p"), $"id".as("x"))
    val paths = Seq("f0", "f1", "f2")
    val keepJ = MorTable.keepInPaths(df, "p", paths, cap = 2)
    val keepI = MorTable.keepInPaths(df, "p", paths, cap = 10)
    assert(keepJ.queryExecution.executedPlan.toString.contains("Join"),
      "above the cap the keep filter must be a join")
    assert(!keepI.queryExecution.executedPlan.toString.contains("Join"),
      "below the cap the keep filter must stay a literal In")
    assert(asSet(keepJ) == asSet(keepI))
    val dropJ = MorTable.dropInPaths(df, "p", paths, cap = 2)
    val dropI = MorTable.dropInPaths(df, "p", paths, cap = 10)
    assert(dropJ.queryExecution.executedPlan.toString.contains("Join"))
    assert(!dropI.queryExecution.executedPlan.toString.contains("Join"))
    assert(asSet(dropJ) == asSet(dropI))
    assert(asSet(keepJ) ++ asSet(dropJ) == asSet(df))
  }

  test("writer lock: held blocks mutations, stale is stolen, success releases") {
    val base = tmp()
    MorTable.init(spark, snapshot, base)
    val fs = new Path(base).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val lock = MorTable.lockPath(base)
    // a FRESH foreign lock: the merge must fail loud, not corrupt
    fs.create(lock, false).close()
    val t0 = System.nanoTime()
    intercept[IllegalStateException](
      MorTable.merge(spark, batch(1L, Seq(("U", 0L, "u0"))), base, Seq("k")))
    assert((System.nanoTime() - t0) / 1e6 >= MorTable.LockWaitMs - 500,
      "acquirer must wait out the contention window before failing")
    // a STALE lock (crashed writer): stolen, mutation proceeds
    fs.setTimes(lock, System.currentTimeMillis() - MorTable.LockStaleMs - 1000, -1)
    MorTable.merge(spark, batch(1L, Seq(("U", 0L, "u0"))), base, Seq("k"))
    assert(!fs.exists(lock), "successful mutation must release the lock")
    val m = MorTable.read(spark, base).where($"k" === 0L)
      .select("v").as[String].collect().toSeq
    assert(m == Seq("u0"))
  }

  test("replayed batch id converges to one copy (overwrite-then-commit)") {
    val base = tmp()
    MorTable.init(spark, snapshot, base)
    MorTable.merge(spark, batch(1L, Seq(("I", 200L, "a"))), base, Seq("k"))
    val expected = asSet(MorTable.read(spark, base))
    // at-least-once retry of the same logical batch: rewrite batch dir 1
    // manually (what a replayed merge with the same id does) — content
    // converges, no duplicate key
    val replay = Seq((Op.Insert, 200L, "a")).toDF(Op.column, "k", "v")
    replay.write.mode("overwrite").parquet(s"$base/data/batch=1")
    assert(asSet(MorTable.read(spark, base)) == expected)
  }
}
