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
  * Safe against CONCURRENT merges too: the input file set is pinned before
  * the rewrite, and files appended after the snapshot are carried across
  * the swap instead of being dropped with the old directory.
  */
object Compaction {

  final case class Stats(filesBefore: Long, filesAfter: Long, rows: Long)

  /** @param beforeSwap fault-injection hook for tests: runs after the
    *   rewrite, immediately before the directory swap — the window where a
    *   concurrent merge's append must survive. */
  def compact(spark: SparkSession, tableDir: String, primaryKeys: Seq[String],
              partitionKeys: Seq[String] = Nil,
              maxRecordsPerFile: Long = CowWriter.DefaultMaxRecordsPerFile,
              beforeSwap: () => Unit = () => ()): Stats = {
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
    if (!fs.rename(tmp, dir)) {
      fs.rename(old, dir) // roll back
      throw new java.io.IOException(s"rename $tmp -> $dir failed")
    }
    // Rescue concurrent appends: any parquet file under `old` that the
    // compaction input did NOT include was committed by a merge racing this
    // compaction — deleting it with `old` would silently lose those rows.
    // Move them (preserving hive-partition subpaths) into the new dir.
    val oldPath = fs.makeQualified(old).toUri.getPath
    val survivors = fs.listFiles(old, true)
    while (survivors.hasNext) {
      val f = survivors.next().getPath
      val rel = f.toUri.getPath.stripPrefix(oldPath).stripPrefix("/")
      if (f.getName.endsWith(".parquet") && !plannedRel.contains(rel)) {
        val dest = new Path(dir, rel)
        fs.mkdirs(dest.getParent)
        if (!fs.rename(f, dest))
          throw new java.io.IOException(s"rescue of concurrent append $f failed")
      }
    }
    fs.delete(old, true)
    // Drop cached file listings for the path — pre-compaction DataFrames
    // would otherwise resolve to deleted files.
    spark.catalog.refreshByPath(tableDir)
    Stats(before, countFiles(dir), rows)
  }
}
