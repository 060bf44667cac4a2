package graft.io

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level min/max statistics index + data-skipping reads — the scan
  * path that makes [[graft.ops.ZOrder]] clustering (and any sorted write)
  * pay off: a predicate on an indexed column prunes whole files BEFORE
  * the scan, so selective queries over a 100 TB table touch only the
  * files whose value range can match.
  *
  * Parquet footers already carry per-column min/max, but Spark's
  * vectorized reader consults them per ROW GROUP after planning has
  * listed and opened every file; at 100k+ files the listing/open cost
  * dominates selective queries. A persisted stats table (one row per
  * file, built with one aggregation scan) moves that decision into a
  * driver-side anti-listing — the same design as Delta/Iceberg file
  * statistics, expressed over plain parquet directories.
  *
  * Scale notes:
  *  - `build` is one scan with map-side partial aggregation keyed by
  *    `input_file_name()` — no shuffle wider than one row per file, and
  *    only the indexed columns are read (column pruning holds: the scan
  *    schema is exactly `cols`).
  *  - The stats table is ~one row per file (a 100 TB table at 1 GB
  *    files is 100k rows) — driver-side collection of the surviving
  *    file list is the same documented file-list collect the CDC
  *    pipeline performs (SURVEY §3.3), NOT a data collect.
  *  - Rebuild after compaction/merge rewrites (file names change); for
  *    append-only tables, `build` over the appended files unions with
  *    the existing index (same one-row-per-file shape).
  */
object StatsIndex {

  /** Per-file stats for `cols` over a parquet directory: row count plus
    * min/max/null-count per column, one output row per physical file. */
  def build(spark: SparkSession, tableDir: String, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "stats index needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls_$c"))
    }
    spark.read.parquet(tableDir)
      .select(input_file_name().as("file") +: cols.map(col): _*)
      .groupBy("file")
      .agg(count(lit(1)).as("rows"), aggs: _*)
  }

  /** The file subset whose [min, max] interval can intersect
    * [lower, upper] on `column` (null bounds = unbounded side). A file of
    * all-null values has null min/max and cannot match a range predicate,
    * so it is pruned too. */
  def candidateFiles(stats: DataFrame, column: String,
                     lower: Option[Any], upper: Option[Any]): Seq[String] = {
    val lo = lower.map(v => col(s"max_$column") >= lit(v)).getOrElse(lit(true))
    val hi = upper.map(v => col(s"min_$column") <= lit(v)).getOrElse(lit(true))
    stats.where(lo && hi).select("file").collect().map(_.getString(0)).toSeq
  }

  /** Range-predicate read through the index: scan ONLY the files whose
    * stats interval intersects [lower, upper], then apply the exact
    * predicate to the survivors. Row-identical to
    * `spark.read.parquet(dir).where(between)` — the index changes which
    * files are OPENED, never the answer. Returns an empty (correctly
    * typed) frame when every file prunes away.
    *
    * STALE-INDEX SAFE: the decision is reconciled against the table's
    * CURRENT file listing — files the index has never seen (appended
    * since `build`) are always scanned, and indexed files that no longer
    * exist (compacted/deleted) are skipped. A stale index can only
    * degrade pruning, never the answer; rebuild after rewrites to regain
    * skipping. */
  def prunedRead(spark: SparkSession, tableDir: String, stats: DataFrame,
                 column: String, lower: Option[Any], upper: Option[Any]): DataFrame = {
    val base = spark.read.parquet(tableDir)
    val current = base.inputFiles.toSet
    val known = stats.select("file").collect().map(_.getString(0)).toSet
    val files = candidateFiles(stats, column, lower, upper).filter(current) ++
      (current -- known)
    val exact: Column => Column = c => (lower, upper) match {
      case (Some(l), Some(u)) => c.between(lit(l), lit(u))
      case (Some(l), None)    => c >= lit(l)
      case (None, Some(u))    => c <= lit(u)
      case (None, None)       => lit(true)
    }
    if (files.isEmpty) base.limit(0)
    // basePath keeps hive-partition columns resolvable from an explicit
    // file list (the S2 scan shape, CdcPipeline.scala:75-94).
    else spark.read.schema(base.schema).option("basePath", tableDir)
      .parquet(files.toSeq: _*)
      .where(exact(col(column)))
  }
}
