package graft.io

import org.apache.hadoop.fs.Path
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
  *  - After a copy-on-write merge or compaction rewrites files, [[refresh]]
  *    maintains the index INCREMENTALLY: stats rows of vanished files are
  *    dropped and only never-seen files are scanned — the reference analog
  *    is the scheduled re-crawl (DMSCDC_CloudTemplate_Source.yaml:210-232),
  *    done as a delta instead of a full rebuild.
  */
object StatsIndex {

  /** Canonical file identity for index reconciliation: the decoded URI
    * path. `input_file_name()` (stored in the index) and
    * `DataFrame.inputFiles` (the live listing) render the same file with
    * different scheme/percent-encoding conventions — an exact-string
    * compare can empty `known ∩ current` and silently defeat pruning
    * (answers stay correct; every file reads as "unseen"). */
  private[io] def normFile(s: String): String = new Path(s).toUri.getPath

  private def statAggs(cols: Seq[String]) = cols.flatMap { c =>
    Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"),
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls_$c"))
  }

  /** Per-file stats for `cols` over a parquet directory: row count plus
    * min/max/null-count per column, one output row per physical file. */
  def build(spark: SparkSession, tableDir: String, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "stats index needs at least one column")
    spark.read.parquet(tableDir)
      .select(input_file_name().as("file") +: cols.map(col): _*)
      .groupBy("file")
      .agg(count(lit(1)).as("rows"), statAggs(cols): _*)
  }

  /** [[build]] over an explicit file subset of `tableDir` — the
    * incremental unit [[refresh]] uses so maintenance cost scales with
    * the delta, not the table. `basePath` keeps hive-partition columns
    * resolvable from the explicit list (the S2 scan shape). */
  def buildFiles(spark: SparkSession, tableDir: String, files: Seq[String],
                 cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "stats index needs at least one column")
    spark.read.option("basePath", tableDir).parquet(files: _*)
      .select(input_file_name().as("file") +: cols.map(col): _*)
      .groupBy("file")
      .agg(count(lit(1)).as("rows"), statAggs(cols): _*)
  }

  /** Incremental index maintenance after ANY rewrite (copy-on-write
    * merge, compaction, plain append): reconcile against the table's
    * current listing — keep stats rows whose file still exists, scan ONLY
    * files the index has never seen, drop rows for vanished files. The
    * index row for an unchanged file is reused verbatim (no re-scan), so
    * maintenance cost is proportional to the rewrite delta. `cols` must
    * match the columns the index was built with. */
  def refresh(spark: SparkSession, tableDir: String, stats: DataFrame,
              cols: Seq[String]): DataFrame = {
    val currentByNorm = spark.read.parquet(tableDir).inputFiles
      .map(f => normFile(f) -> f).toMap
    // One row per file — the same bounded driver-side file-list collect
    // as candidateFiles/prunedRead (SURVEY §3.3), not a data collect.
    val knownRaw = stats.select("file").collect().map(_.getString(0))
    val knownNorm = knownRaw.map(normFile).toSet
    val keptRaw = knownRaw.filter(f => currentByNorm.contains(normFile(f)))
    val newFiles = currentByNorm.collect {
      case (n, raw) if !knownNorm.contains(n) => raw
    }.toSeq
    val kept = stats.where(col("file").isin(keptRaw: _*))
    if (newFiles.isEmpty) kept
    else {
      // Materialized once (eager, cleaner-reclaimed — ≤ one row per new
      // file): the zero-row probe below AND the caller's write both read
      // it; an unmaterialized plan would re-run the delta scan twice.
      val built = buildFiles(spark, tableDir, newFiles.sorted, cols)
        .localCheckpoint(true)
      // ZERO-ROW files produce no aggregation row (Spark routinely writes
      // an empty partition-0 file on small rewrites) — synthesize their
      // stats so the index converges to covering every current file.
      // Null min/max excludes them from every range candidate set, which
      // is exact for a rowless file.
      val builtNorm = built.select("file").collect()
        .map(r => normFile(r.getString(0))).toSet
      val missing = newFiles.filterNot(f => builtNorm.contains(normFile(f)))
      val withZero =
        if (missing.isEmpty) built
        else {
          val schema = stats.schema
          val rows = missing.sorted.map { f =>
            org.apache.spark.sql.Row.fromSeq(schema.fields.toSeq.map { fld =>
              fld.name match {
                case "file" => f
                case "rows" => 0L
                case n if n.startsWith("nulls_") => 0L
                case _ => null
              }
            })
          }
          import scala.jdk.CollectionConverters._
          built.unionByName(spark.createDataFrame(rows.asJava, schema))
        }
      kept.unionByName(withZero)
    }
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
    * degrade pruning, never the answer; [[refresh]] after rewrites to
    * regain skipping at delta cost. */
  def prunedRead(spark: SparkSession, tableDir: String, stats: DataFrame,
                 column: String, lower: Option[Any], upper: Option[Any]): DataFrame = {
    val base = spark.read.parquet(tableDir)
    // Reconcile on NORMALIZED identity ([[normFile]]): the index stores
    // input_file_name() strings while inputFiles renders URIs — an exact
    // compare could classify every indexed file as unseen and silently
    // defeat pruning. Scan paths are taken from the live listing. One
    // collect serves both the known set and the candidate set (the stats
    // table is one row per file — two jobs over it would double the
    // fixed per-job latency that dominates this driver-side decision).
    val lo = lower.map(v => col(s"max_$column") >= lit(v)).getOrElse(lit(true))
    val hi = upper.map(v => col(s"min_$column") <= lit(v)).getOrElse(lit(true))
    val idx = stats
      .select(col("file"), coalesce(lo && hi, lit(false)).as("__cand"))
      .collect().map(r => normFile(r.getString(0)) -> r.getBoolean(1))
    val known = idx.map(_._1).toSet
    val cand = idx.collect { case (f, true) => f }.toSet
    val files = base.inputFiles.toSeq.filter { f =>
      val n = normFile(f)
      cand.contains(n) || !known.contains(n)
    }
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
