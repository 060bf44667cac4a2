package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Lake-table compaction: every incremental merge appends files (the
  * reference's `coalesce(1)` bounds per-merge output but the file count
  * still grows one-plus per batch — README.md:274 acknowledges the
  * fragmentation). Periodic compaction rewrites a table directory into
  * bounded-size files, hash-clustered by primary key so future merges
  * touch few files per changed key.
  *
  * Safe against the pipeline's own crash semantics: the rewrite goes to a
  * temp dir first, then swaps — a crash mid-compaction leaves the original
  * table intact (same atomicity caveat as the reference's copy-on-write
  * delete window, applied to a maintenance op instead of the hot path).
  *
  * Concurrency contract: concurrent APPENDS survive — the input file set
  * is pinned before the rewrite, files appended after the snapshot (even
  * into a racer-recreated table dir mid-swap) are carried across, and
  * appended-only tables (no-PK insert-only) can compact under load. A
  * concurrent copy-on-write REWRITE (update/delete merge) is NOT safe to
  * interleave: its deletes can target files the compaction already copied,
  * which would resurrect superseded rows — serializing that needs a table
  * format with a commit log (Delta/Iceberg). Schedule compaction between
  * merge runs (the Controller's structure makes that natural), as the
  * reference implicitly does with its maintenance windows.
  */
object Compaction {

  final case class Stats(filesBefore: Long, filesAfter: Long, rows: Long)

  /** @param beforeSwap fault-injection hook for tests: runs after the
    *   rewrite, immediately before the directory swap — the window where a
    *   concurrent merge's append must survive.
    * @param afterMoveAside second fault-injection hook: runs between the
    *   two swap renames — the window where an append can RECREATE the
    *   table dir. */
  def compact(spark: SparkSession, tableDir: String, primaryKeys: Seq[String],
              partitionKeys: Seq[String] = Nil,
              maxRecordsPerFile: Long = CowWriter.DefaultMaxRecordsPerFile,
              beforeSwap: () => Unit = () => (),
              afterMoveAside: () => Unit = () => ()): Stats = {
    val conf = spark.sparkContext.hadoopConfiguration
    val dir = new Path(tableDir)
    val fs = dir.getFileSystem(conf)

    def countFiles(p: Path): Long = {
      val it = fs.listFiles(p, true)
      var n = 0L
      while (it.hasNext) { if (it.next().getPath.getName.endsWith(".parquet")) n += 1 }
      n
    }

    val before = countFiles(dir)
    val df = spark.read.option("mergeSchema", "true").parquet(tableDir)
    // Pin the input file set NOW: a concurrent merge can append files while
    // the rewrite runs, and anything not in this set must survive the swap.
    val dirPath = fs.makeQualified(dir).toUri.getPath
    val plannedRel = df.inputFiles.map { u =>
      new Path(new java.net.URI(u)).toUri.getPath.stripPrefix(dirPath).stripPrefix("/")
    }.toSet
    val rows = df.count()
    val targetFiles = math.max(1L, (rows + maxRecordsPerFile - 1) / maxRecordsPerFile).toInt
    val clustered =
      if (partitionKeys.nonEmpty) df.repartition(partitionKeys.map(col): _*)
      else if (primaryKeys.nonEmpty) df.repartition(targetFiles, primaryKeys.map(col): _*)
      else df.repartition(targetFiles)

    val tmp = new Path(dir.getParent, s".compact-${dir.getName}-${System.nanoTime()}")
    val writer =
      if (partitionKeys.nonEmpty) clustered.write.partitionBy(partitionKeys: _*)
      else clustered.write
    writer
      .option("maxRecordsPerFile", maxRecordsPerFile.toString)
      .mode("overwrite").parquet(tmp.toString)
    beforeSwap()
    // swap: move original aside, promote the compacted dir, drop original
    val old = new Path(dir.getParent, s".old-${dir.getName}-${System.nanoTime()}")
    if (!fs.rename(dir, old)) throw new java.io.IOException(s"rename $dir -> $old failed")
    afterMoveAside()
    // A racing append can RECREATE `dir` between the two renames (append
    // writes mkdir their destination). Hadoop rename onto an existing
    // directory does NOT fail — it moves the source INSIDE it, where a
    // dot-prefixed dir is invisible to readers and the table would show
    // only the racer's rows. Absorb any recreated dir as one more rescue
    // source, undo a nested move if one slipped in, and retry.
    var absorbed = List.empty[Path]
    var promoted = false
    var attempts = 0
    while (!promoted && attempts < 6) {
      if (fs.exists(dir)) {
        val racer = new Path(dir.getParent, s".racer-${dir.getName}-${System.nanoTime()}")
        if (fs.rename(dir, racer)) absorbed ::= racer
      }
      if (fs.rename(tmp, dir)) {
        val nested = new Path(dir, tmp.getName)
        if (fs.exists(nested)) fs.rename(nested, tmp) // dst raced back in; undo
        else promoted = true
      }
      attempts += 1
    }
    // Rescue concurrent appends: any parquet file under a rescue source
    // that the compaction input did NOT include was committed by a writer
    // racing this compaction — deleting it would silently lose those rows.
    // Move them (preserving hive-partition subpaths) into `dest`.
    def rescueInto(dest: Path, src: Path): Unit = {
      val srcPath = fs.makeQualified(src).toUri.getPath
      val survivors = fs.listFiles(src, true)
      while (survivors.hasNext) {
        val f = survivors.next().getPath
        val rel = f.toUri.getPath.stripPrefix(srcPath).stripPrefix("/")
        if (f.getName.endsWith(".parquet") && !plannedRel.contains(rel)) {
          val dest0 = new Path(dest, rel)
          fs.mkdirs(dest0.getParent)
          if (!fs.rename(f, dest0))
            throw new java.io.IOException(s"rescue of concurrent append $f failed")
        }
      }
    }
    if (!promoted) {
      // promotion kept failing for a non-recreation reason: restore the
      // original table (plus anything absorbed) and abort
      if (!fs.rename(old, dir)) throw new java.io.IOException(
        s"rename $tmp -> $dir failed AND rollback failed; data intact at $old")
      absorbed.foreach(r => { rescueInto(dir, r); fs.delete(r, true) })
      throw new java.io.IOException(s"rename $tmp -> $dir failed; rolled back")
    }
    (old :: absorbed).foreach { src => rescueInto(dir, src); fs.delete(src, true) }
    // Drop cached file listings for the path — pre-compaction DataFrames
    // would otherwise resolve to deleted files.
    spark.catalog.refreshByPath(tableDir)
    Stats(before, countFiles(dir), rows)
  }
}
