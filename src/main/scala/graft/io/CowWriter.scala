package graft.io

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Parquet lake writer with the reference's layout policies, made
  * scale-aware.
  *
  * Reference policies re-expressed:
  *  - S5 initial overwrite (/root/reference/DMSCDC_LoadInitial.py:34-36);
  *  - S6/S7 merge-output append, optionally Hive-partitioned
  *    (DMSCDC_LoadIncremental.py:76-81);
  *  - Y2 `repartition(countDistinct(partitionKeys), partitionKeys)` →
  *    exactly one file per Hive partition (DMSCDC_LoadInitial.py:33-34);
  *  - Y1 `coalesce(1)` → one file per unpartitioned merge
  *    (DMSCDC_LoadIncremental.py:73);
  *  - C6 copy-on-write delete of superseded files
  *    (DMSCDC_LoadIncremental.py:84-87).
  *
  * Scale delta (documented, SURVEY.md §7.6): one file per merge/partition
  * collapses write parallelism and produces multi-GB files at 100 TB. We
  * bound file size instead with `maxRecordsPerFile` and shuffle to
  * `max(requestedUnits, rows / maxRecordsPerFile)` partitions, keeping the
  * reference's "each key lives in few files" property (hash-partitioned by
  * key) without the single-file bottleneck.
  */
object CowWriter {

  /** Rows per output file bound. Small-SF tests produce one file, matching
    * the reference exactly; at scale this splits instead of coalescing. */
  val DefaultMaxRecordsPerFile = 5000000L

  /** S5/S7: full-snapshot overwrite. */
  def writeInitial(df: DataFrame, outPath: String, partitionKeys: Seq[String],
                   maxRecordsPerFile: Long = DefaultMaxRecordsPerFile): Unit =
    write(df, outPath, partitionKeys, overwrite = true, maxRecordsPerFile)

  /** S6/S7: merge-output append. */
  def appendMerged(df: DataFrame, outPath: String, partitionKeys: Seq[String],
                   maxRecordsPerFile: Long = DefaultMaxRecordsPerFile): Unit =
    write(df, outPath, partitionKeys, overwrite = false, maxRecordsPerFile)

  private def write(df: DataFrame, outPath: String, partitionKeys: Seq[String],
                    overwrite: Boolean, maxRecordsPerFile: Long): Unit = {
    val mode = if (overwrite) "overwrite" else "append"
    val writer =
      if (partitionKeys.nonEmpty) {
        // Y2: co-locate each Hive partition's rows (one task → one file per
        // partition at small scale); maxRecordsPerFile splits oversized ones.
        df.repartition(partitionKeys.map(col): _*)
          .write.partitionBy(partitionKeys: _*)
      } else {
        // Y1 analog: AQE coalesces the final exchange at small scale;
        // maxRecordsPerFile bounds file size at large scale.
        df.write
      }
    writer
      .option("maxRecordsPerFile", maxRecordsPerFile.toString)
      .mode(mode).parquet(outPath)
  }

  /** C6: copy-on-write delete of superseded files, driver-side. The caller
    * guarantees `files` is exactly the set that was unioned into the merge
    * output (collect-then-reuse, SURVEY.md §3.3 note).
    *
    * Deletes run concurrently: the append-committed-but-not-yet-deleted
    * window (the same non-atomic window the reference has,
    * /root/reference/README.md:274) is N/parallelism round-trips instead of
    * N — at 100k impacted S3 files that is the difference between seconds
    * and hours of readers seeing duplicate rows. */
  def deleteFiles(files: Seq[String], conf: Configuration = new Configuration()): Unit = {
    import scala.collection.parallel.CollectionConverters._
    files.par.foreach { f =>
      val p = new Path(f)
      // FileSystem.get is cached per (scheme, authority) and thread-safe.
      val fs: FileSystem = p.getFileSystem(conf)
      fs.delete(p, false)
    }
  }
}
