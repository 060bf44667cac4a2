package graft.io

import graft.cdc.{Merge, Op}
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Merge-on-read lake table: the write-cheap dual of the copy-on-write
  * path ([[CdcPipeline]] + [[CowWriter]], reference C6 —
  * /root/reference/DMSCDC_LoadIncremental.py:84-87).
  *
  * Copy-on-write rewrites every file a batch touches: a 10-row change
  * hitting 10 distinct files rewrites 10 × maxRecordsPerFile rows. At
  * 100 TB with point deletes that write amplification dominates the load
  * job. Merge-on-read instead makes every commit APPEND-ONLY:
  *
  *   - `data/batch=<b>/`    — immutable data files; a merge appends only
  *     the batch's per-key winners (never rewrites the target);
  *   - `deletes/batch=<b>/` — position-delete sidecar rows
  *     `(df_file, df_pos)`: target positions superseded by batch `b`;
  *   - `commits/<b>.commit` — zero-byte marker, created LAST. Readers see
  *     exactly the committed batches: a crash mid-merge leaves invisible
  *     garbage dirs (reclaimed by [[vacuum]]), never a torn table.
  *
  * The read path reconstructs current state: committed data minus
  * committed delete positions, an anti-join on `(_metadata.file_path,
  * _metadata.row_index)`. The sidecar is ≪ data (bounded by cumulative
  * changed rows, and compaction re-baselines it), so AQE builds the
  * anti-join hash table on the delete side — the target itself is never
  * shuffled, on write OR read.
  *
  * Merge cost model vs CoW (the reason both exist): MOR writes
  * O(batch) rows + O(superseded positions) sidecar rows per commit and
  * pays one small anti-join per read; CoW writes O(impacted files ×
  * file size) per commit and reads free. High-churn / point-delete
  * tables want MOR with periodic [[compact]]; scan-heavy tables want
  * CoW. Semantics are identical (MorTableSpec proves read ≡
  * [[graft.cdc.Merge.applySequenced]] on the shared fixture; the
  * `cdc_mor_merge` / `cdc_mor_compact` queries pin it against the SAME
  * DuckDB oracle as `cdc_merge`).
  *
  * Same latest-wins contract as [[graft.cdc.Merge]]: within a batch the
  * (file_seq, rownum) winner per key survives; any change beats the
  * stored version (stored rows are sentinel generation 0); a winning
  * delete removes the key. Schema evolution via mergeSchema on the data
  * read (mixed footers across batches read with null-fill, the MOR
  * analog of the CoW path's unionByName — reference U1).
  */
object MorTable {

  /** Delete-sidecar schema: absolute data-file path + row position. */
  val DelFile = "df_file"
  val DelPos = "df_pos"
  private val F = "__mor_file"
  private val P = "__mor_pos"

  private def dataDir(path: String) = s"$path/data"
  private def delDir(path: String) = s"$path/deletes"
  private def commitDir(path: String) = s"$path/commits"
  private def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Committed batch ids, from the marker ledger (one listing of a dir
    * with one zero-byte file per commit — bounded by commit count, never
    * by data size). */
  def committedBatches(spark: SparkSession, path: String): Seq[Long] = {
    val f = fs(spark, path)
    val dir = new Path(commitDir(path))
    if (!f.exists(dir)) Nil
    else f.listStatus(dir).toSeq
      .map(_.getPath.getName).filter(_.endsWith(".commit"))
      .map(_.stripSuffix(".commit").toLong).sorted
  }

  /** Paths of committed batch subdirs that physically exist under
    * `base` — explicit-path reads (never partition discovery) so a torn
    * uncommitted write can't perturb listing or schema inference. */
  private def committedDirs(spark: SparkSession, path: String, base: String,
                            batches: Seq[Long]): Seq[String] = {
    val f = fs(spark, path)
    batches.map(b => s"$base/batch=$b").filter(d => f.exists(new Path(d)))
  }

  /** Live state as of the commit prefix ≤ `upTo` (all commits when
    * None). `withProvenance=true` keeps the `(file, pos)` identity
    * columns the merge path needs for supersession. */
  private def readTagged(spark: SparkSession, path: String,
                         withProvenance: Boolean,
                         upTo: Option[Long] = None): DataFrame = {
    val batches = upTo match {
      case Some(b) =>
        val pre = committedBatches(spark, path).filter(_ <= b)
        require(pre.nonEmpty, s"no commit <= $b in $path")
        pre
      case None => committedBatches(spark, path)
    }
    val dirs = committedDirs(spark, path, dataDir(path), batches)
    require(dirs.nonEmpty, s"MOR table has no committed data: $path")
    val data = spark.read.option("mergeSchema", "true")
      .option("basePath", dataDir(path)).parquet(dirs: _*)
      .withColumn(F, col("_metadata.file_path"))
      .withColumn(P, col("_metadata.row_index"))
      .drop("batch")
    val delDirs = committedDirs(spark, path, delDir(path), batches)
    val live =
      if (delDirs.isEmpty) data
      else {
        val dels = spark.read.option("basePath", delDir(path)).parquet(delDirs: _*)
        // Sidecar ≪ data → AQE plans a broadcast anti-join; the stored
        // data never crosses an exchange.
        data.join(dels,
          data(F) === dels(DelFile) && data(P) === dels(DelPos), "left_anti")
      }
    if (withProvenance) live else live.drop(F, P)
  }

  /** Read the table's current state (committed data minus committed
    * delete positions). */
  def read(spark: SparkSession, path: String): DataFrame =
    readTagged(spark, path, withProvenance = false)

  /** Time travel: the table exactly as of commit `batch` — data and
    * delete batches ≤ `batch`, same anti-join. Free by construction:
    * commits are immutable and append-only, so history IS the commit
    * prefix; no log replay, no snapshot copies. (Vacuum trades history
    * for space: it physically drops fully-dead files and re-baselines
    * the sidecar under a NEW commit, so states older than the last
    * vacuum are no longer reconstructable — the standard lakehouse
    * retention trade, surfaced here as "readAsOf after vacuum may
    * error on missing files".) */
  def readAsOf(spark: SparkSession, path: String, batch: Long): DataFrame =
    readTagged(spark, path, withProvenance = false, upTo = Some(batch))

  /** Batch 0: initial snapshot commit. */
  def init(spark: SparkSession, snapshot: DataFrame, path: String,
           maxRecordsPerFile: Long = CowWriter.DefaultMaxRecordsPerFile): Unit = {
    writeBatchData(snapshot, path, 0L, maxRecordsPerFile)
    commit(spark, path, 0L)
  }

  /** Latest-wins merge of a change batch (rows carry `Op` and `file_seq`
    * like [[graft.cdc.Merge.mergeCdc]]; `intraFileOrder` breaks
    * intra-file ties). Appends one data batch (the per-key winners that
    * survive) and one delete batch (live positions of every key the
    * batch touches), then commits.
    *
    * The stored table is scanned ONCE, filtered by a broadcast semi-join
    * on the batch's keys — no target shuffle, no target rewrite. Write
    * volume is O(batch), not O(impacted files).
    */
  def merge(spark: SparkSession, changes: DataFrame, path: String, pks: Seq[String],
            intraFileOrder: Seq[Column] = Nil,
            maxRecordsPerFile: Long = CowWriter.DefaultMaxRecordsPerFile,
            provenanceCols: Seq[String] = Nil): Long = {
    require(pks.nonEmpty, "merge-on-read requires primary keys")
    val b = committedBatches(spark, path).lastOption
      .getOrElse(sys.error(s"MOR table not initialized: $path")) + 1L

    val sequenced = Merge.sequenceBatch(changes, pks, intraFileOrder)
    // Batch winner per key: highest (file_seq, rownum). Shuffles only the
    // change batch (window over pks).
    val w = Window.partitionBy(pks.map(col): _*)
      .orderBy(col(Merge.FileSeq).desc, col(Merge.RowNum).desc)
    val winners = sequenced.withColumn("__rnk", row_number().over(w))
      .where(col("__rnk") === 1)
      .drop("__rnk", Merge.FileSeq, Merge.RowNum)
    // Surviving winners are appended (minus any ordering-only provenance
    // columns — they must never reach the lake); a winning delete only
    // supersedes.
    val appended = winners.where(col(Op.column) =!= Op.Delete)
      .drop(provenanceCols: _*)

    // Every live position holding a batch key is superseded (update,
    // delete, or re-insert alike — any change beats generation 0).
    val live = readTagged(spark, path, withProvenance = true)
    val keys = sequenced.select(pks.map(col): _*).distinct()
    val superseded = live
      .join(broadcast(keys), pks, "left_semi")
      .select(col(F).as(DelFile), col(P).as(DelPos))

    writeBatchData(appended, path, b, maxRecordsPerFile)
    superseded.write.mode("overwrite").parquet(s"${delDir(path)}/batch=$b")
    commit(spark, path, b)
    b
  }

  /** Value-level change feed of one commit, derived from the commit
    * structure alone — no sidecar log: pre-images are the LIVE rows (as
    * of `batch − 1`) at positions this batch's delete sidecar
    * supersedes; post-images are the batch's appended winners. A full
    * outer join on the PKs classifies I/U/D, and same-value row moves
    * are filtered out — so compaction commits (which only move rows)
    * and vacuum's sidecar re-baseline (whose delete entries point at
    * already-dead positions) emit NOTHING, exactly as a semantic feed
    * should. Contract: a VALUE diff over `trackCols`, not an operation
    * log — an update writing identical tracked values is silent (the
    * operation-log surface is the CoW path's [[graft.cdc.ChangeFeed]]).
    *
    * Output: (pks…, change_op, pre_<c>, post_<c> per tracked column). */
  def commitDiff(spark: SparkSession, path: String, batch: Long,
                 pks: Seq[String], trackCols: Seq[String]): DataFrame = {
    require(batch > 0, s"batch 0 is the initial snapshot, not a change: $batch")
    require(committedBatches(spark, path).contains(batch),
      s"commit $batch does not exist in $path")
    val f = fs(spark, path)

    val pre0 = readTagged(spark, path, withProvenance = true, upTo = Some(batch - 1))
    val delDir_b = s"${delDir(path)}/batch=$batch"
    val dataDir_b = s"${dataDir(path)}/batch=$batch"
    // A commit with NO data dir is vacuum's sidecar consolidation (every
    // merge/compact writes its data dir, even when empty). Its entries
    // re-state existing masks AND the old delete dirs that would
    // reconstruct the ≤ batch−1 state are already swept — diffing it
    // would fabricate deletes. A consolidation never changes content:
    // empty feed, by early pre-emptying both sides.
    val isConsolidation = !f.exists(new Path(dataDir_b))
    val pre =
      if (isConsolidation || !f.exists(new Path(delDir_b))) pre0.limit(0)
      else {
        val dels = spark.read.parquet(delDir_b)
        pre0.join(dels,
          pre0(F) === dels(DelFile) && pre0(P) === dels(DelPos), "left_semi")
      }
    // an all-delete merge batch leaves a partless data dir (nothing
    // appended) that schema inference would reject
    val hasDataFiles = !isConsolidation &&
      f.listStatus(new Path(dataDir_b)).exists(_.getPath.getName.endsWith(".parquet"))
    val post =
      if (!hasDataFiles) pre.drop(F, P).limit(0)
      else spark.read.option("mergeSchema", "true").parquet(dataDir_b)

    val preSel = pre.select((pks.map(col) :+ lit(true).as("__pre")) ++
      trackCols.map(c => col(c).as(s"pre_$c")): _*)
    val postSel = post.select((pks.map(col) :+ lit(true).as("__post")) ++
      trackCols.map(c => col(c).as(s"post_$c")): _*)
    val joined = preSel.join(postSel, pks, "full_outer")
    val op = when(col("__pre").isNull, lit(Op.Insert))
      .when(col("__post").isNull, lit(Op.Delete))
      .otherwise(lit(Op.Update))
    val changed = trackCols
      .map(c => !(col(s"pre_$c") <=> col(s"post_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    joined
      .where(col("__pre").isNull || col("__post").isNull || changed)
      .select(pks.map(col) ++ (op.as("change_op") +:
        trackCols.flatMap(c => Seq(col(s"pre_$c"), col(s"post_$c")))): _*)
  }

  /** Merge a change batch carrying ([[CdcPipeline.SrcFile]],
    * [[CdcPipeline.RowIdx]]) provenance (the streaming `foreachBatch`
    * shape): `file_seq` derives from the batch's sorted file names —
    * the same total order as the CoW path — then delegates to [[merge]].
    *
    * Replay note (crash between merge and checkpoint commit): the
    * retried micro-batch commits under a NEW batch id, so the re-merge
    * re-applies the same changes — latest-wins makes the re-application
    * CONTENT-idempotent (identical read state), at the cost of
    * physically duplicated rows that are fully superseded and swept by
    * the next [[vacuum]]. */
  def mergeTagged(spark: SparkSession, tagged: DataFrame, path: String,
                  pks: Seq[String]): Long = {
    import spark.implicits._
    val files = tagged.select(CdcPipeline.SrcFile).distinct()
      .as[String].collect().sorted.toSeq
    require(files.nonEmpty, "empty tagged batch")
    val seqDf = files.zipWithIndex.map { case (f, i) => (f, (i + 1).toLong) }
      .toDF(CdcPipeline.SrcFile, Merge.FileSeq)
    val changes = tagged.join(broadcast(seqDf), CdcPipeline.SrcFile)
    merge(spark, changes, path, pks,
      intraFileOrder = Seq(col(CdcPipeline.RowIdx)),
      provenanceCols = Seq(CdcPipeline.SrcFile, CdcPipeline.RowIdx))
  }

  /** Rewrite data files whose dead (deleted-position) fraction reached
    * `minDeadFraction`, expressed AS a commit: live rows of the victim
    * files re-append under a new batch and their old positions join the
    * delete sidecar. Visibility flips atomically with the commit marker
    * — no new metadata concept, no reader-visible window. The old files
    * become fully dead; [[vacuum]] reclaims them.
    *
    * `clusterBy` additionally range-partitions + sorts the re-appended
    * rows, restoring zone-map prunability (each rewritten file owns a
    * contiguous key range — [[StatsIndex.overlapDepth]] of the new
    * files is 1): the remediation the `dq_overlap_depth` advisor points
    * at when accumulated merges have interleaved the key space. */
  def compact(spark: SparkSession, path: String, minDeadFraction: Double = 0.3,
              maxRecordsPerFile: Long = CowWriter.DefaultMaxRecordsPerFile,
              clusterBy: Seq[String] = Nil): Seq[String] = {
    import spark.implicits._
    val batches = committedBatches(spark, path)
    val dataDirs = committedDirs(spark, path, dataDir(path), batches)
    if (dataDirs.isEmpty) return Nil
    val delDirs = committedDirs(spark, path, delDir(path), batches)
    if (delDirs.isEmpty) return Nil

    // Per-file row totals from parquet footer counts (metadata-only
    // count(*) per dir would lose the per-file split — this scan is
    // column-pruned to the virtual _metadata struct, no data pages).
    val totals = spark.read.option("basePath", dataDir(path)).parquet(dataDirs: _*)
      .groupBy(col("_metadata.file_path").as("f")).agg(count(lit(1)).as("n"))
    // DISTINCT positions: a vacuum crash between its commit and the
    // old-dir sweep leaves duplicate sidecar entries, which a raw count
    // would double — inflating d past n.
    val dead = spark.read.option("basePath", delDir(path)).parquet(delDirs: _*)
      .select(DelFile, DelPos).distinct()
      .groupBy(col(DelFile).as("f")).agg(count(lit(1)).as("d"))
    val victims = totals.join(dead, "f")
      .where(col("d") >= col("n") * minDeadFraction && col("d") < col("n"))
      .select("f").as[String].collect().toSeq.sorted
    if (victims.isEmpty) return Nil

    val b = batches.last + 1L
    val live = readTagged(spark, path, withProvenance = true)
      .where(col(F).isin(victims: _*))
      .localCheckpoint(true) // two consumers (data + sidecar); and the
                             // range shuffle below must see a stable set
    val out0 = live.drop(F, P)
    val out =
      if (clusterBy.isEmpty) out0
      else out0.repartitionByRange(clusterBy.map(col): _*)
        .sortWithinPartitions(clusterBy.map(col): _*)
    writeBatchData(out, path, b, maxRecordsPerFile)
    live.select(col(F).as(DelFile), col(P).as(DelPos))
      .write.mode("overwrite").parquet(s"${delDir(path)}/batch=$b")
    commit(spark, path, b)
    victims
  }

  /** GC pass, driver-side and bounded by file/commit counts:
    *  1. physically delete fully-dead data files (total rows == deleted
    *     positions — compaction victims and fully-superseded batches);
    *  2. re-baseline the delete sidecar: surviving entries (those whose
    *     file still exists) consolidate into a fresh committed batch and
    *     the old delete dirs drop. Crash between the new commit and the
    *     old-dir sweep leaves duplicate delete entries — harmless to the
    *     anti-join, swept by the next vacuum.
    *  3. remove uncommitted orphan batch dirs (crashed merges).
    *
    * Same non-atomic reader window as the reference's CoW delete
    * (README.md:274): an in-flight read that already listed a
    * fully-dead file races its physical delete. */
  def vacuum(spark: SparkSession, path: String): (Long, Long) = {
    import spark.implicits._
    val f = fs(spark, path)
    val batches = committedBatches(spark, path)
    val dataDirs = committedDirs(spark, path, dataDir(path), batches)
    val delDirs = committedDirs(spark, path, delDir(path), batches)
    if (dataDirs.isEmpty) return (0L, 0L)

    // 3) uncommitted orphans (both data and delete sides).
    val committed = batches.toSet
    Seq(dataDir(path), delDir(path)).foreach { base =>
      val bp = new Path(base)
      if (f.exists(bp)) f.listStatus(bp).toSeq
        .filter(_.getPath.getName.startsWith("batch="))
        .filterNot(s => committed.contains(s.getPath.getName.stripPrefix("batch=").toLong))
        .foreach(s => f.delete(s.getPath, true))
    }

    if (delDirs.isEmpty) return (0L, 0L)
    val totals = spark.read.option("basePath", dataDir(path)).parquet(dataDirs: _*)
      .groupBy(col("_metadata.file_path").as("f")).agg(count(lit(1)).as("n"))
    val dels = spark.read.option("basePath", delDir(path)).parquet(delDirs: _*)
    // DISTINCT positions, or post-crash duplicate entries make d exceed
    // n and the fully-dead file is never detected (a silent disk leak).
    val dead = dels.select(DelFile, DelPos).distinct()
      .groupBy(col(DelFile).as("f")).agg(count(lit(1)).as("d"))
    val fullyDead0 = totals.join(dead, "f").where(col("d") === col("n"))
      .select("f").as[String].collect().toSeq.sorted
    // A table whose every row is deleted would lose its LAST data file
    // here, leaving nothing to infer a schema from — readers of an empty
    // table must still get a typed empty frame. Keep one (fully-masked)
    // file as the schema anchor; its sidecar entries survive the
    // consolidation below because the file still exists.
    val nAllFiles = dataFiles(spark, path).size
    val fullyDead =
      if (fullyDead0.size == nAllFiles) fullyDead0.drop(1) else fullyDead0
    fullyDead.foreach(p => f.delete(new Path(new java.net.URI(p)), false))

    // 2) consolidate surviving entries into one fresh delete batch.
    val survivors =
      if (fullyDead.isEmpty) dels
      else dels.where(!col(DelFile).isin(fullyDead: _*))
    val nBefore = dels.count()
    val b = batches.last + 1L
    survivors.select(DelFile, DelPos).distinct()
      .write.mode("overwrite").parquet(s"${delDir(path)}/batch=$b")
    commit(spark, path, b)
    val nAfter = spark.read.parquet(s"${delDir(path)}/batch=$b").count()
    // old delete dirs are superseded by the consolidated batch
    delDirs.foreach(d => f.delete(new Path(d), true))
    (fullyDead.size.toLong, nBefore - nAfter)
  }

  /** Live data files (for specs / ops visibility). */
  def dataFiles(spark: SparkSession, path: String): Seq[String] = {
    val f = fs(spark, path)
    val batches = committedBatches(spark, path)
    committedDirs(spark, path, dataDir(path), batches).flatMap { d =>
      f.listStatus(new Path(d)).toSeq.map(_.getPath.toString)
        .filter(_.endsWith(".parquet"))
    }
  }

  private def writeBatchData(df: DataFrame, path: String, b: Long,
                             maxRecordsPerFile: Long): Unit = {
    // `batch` is the partition-dir column readers re-derive and drop —
    // a user column of that name would collide at read time
    require(!df.columns.contains("batch"),
      "MOR tables reserve the column name 'batch' (commit partition)")
    df.write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile.toString)
      .parquet(s"${dataDir(path)}/batch=$b")
  }

  /** Commit marker creation — the visibility flip. A replayed batch id
    * rewrote its dirs (mode=overwrite) before this, so at-least-once
    * retries converge to one copy. */
  private def commit(spark: SparkSession, path: String, b: Long): Unit = {
    val f = fs(spark, path)
    val dir = new Path(commitDir(path))
    if (!f.exists(dir)) f.mkdirs(dir)
    f.create(new Path(dir, s"$b.commit"), true).close()
  }
}
