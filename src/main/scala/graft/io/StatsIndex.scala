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

  /** The two bloom bit positions of a value: disjoint 16-bit-capable
    * slices of ONE [[graft.functions.TextFunctions.hash60]] (low bits,
    * and bits 30+), mod `m` — the CMS slicing idea applied to bloom
    * hashing (one md5 per value, not one per hash function). Probe-side
    * values must carry the SAME type as the indexed column (both hash
    * through `cast("string")`). `m` ≤ 2^30. */
  private def bloomPositions(c: Column, m: Column): (Column, Column) = {
    val h = graft.functions.TextFunctions.hash60(concat(lit("bf:"), c.cast("string")))
    (pmod(h, m), pmod(shiftrightunsigned(h, 30), m))
  }

  /** Per-file bloom sidecar of `c`: the SORTED DISTINCT set-bit
    * positions (≤ min(2·distinct, m) longs — sorted ints delta-encode
    * tightly in parquet). A positions array, not a packed bitmask, so
    * membership is two `array_contains` probes inside the same stats
    * scan the min/max decision already runs — no bit arithmetic in the
    * pruning plan and no fixed m/64-word cost for sparse files. */
  private def bloomAggs(bloomCols: Seq[String], m: Int) = bloomCols.map { c =>
    val (p1, p2) = bloomPositions(col(c), lit(m.toLong))
    array_sort(array_union(collect_set(p1), collect_set(p2))).as(s"bloom_$c")
  }

  /** Per-file stats for `cols` over a parquet directory: row count plus
    * min/max/null-count per column, one output row per physical file.
    * `bloomCols` additionally get a per-file bloom sidecar (built in
    * the SAME aggregation scan — no extra pass) for equality-probe
    * skipping on high-cardinality unclustered keys, where min/max
    * covers the whole domain in every file and prunes nothing (the
    * id-probe access path the CDC engine itself uses). `bloomBits` (m)
    * sizes the filter: with j = 2 hash slices the false-positive rate
    * is (1 − e^(−2n/m))² per file of n distinct keys — the default 2^16
    * holds ~7% at n = 10k; size m ≥ 6·n for big files. m is recorded in
    * the index (`bloom_bits`), so probes can never use a mismatched m. */
  def build(spark: SparkSession, tableDir: String, cols: Seq[String],
            bloomCols: Seq[String] = Nil, bloomBits: Int = 1 << 16): DataFrame = {
    require(cols.nonEmpty, "stats index needs at least one column")
    require(bloomBits >= 64 && bloomBits <= (1 << 30), s"bloomBits out of range: $bloomBits")
    val out = spark.read.parquet(tableDir)
      .select(input_file_name().as("file") +: (cols ++ bloomCols).distinct.map(col): _*)
      .groupBy("file")
      .agg(count(lit(1)).as("rows"), statAggs(cols) ++ bloomAggs(bloomCols, bloomBits): _*)
    if (bloomCols.isEmpty) out else out.withColumn("bloom_bits", lit(bloomBits))
  }

  /** [[build]] over an explicit file subset of `tableDir` — the
    * incremental unit [[refresh]] uses so maintenance cost scales with
    * the delta, not the table. `basePath` keeps hive-partition columns
    * resolvable from the explicit list (the S2 scan shape). */
  def buildFiles(spark: SparkSession, tableDir: String, files: Seq[String],
                 cols: Seq[String], bloomCols: Seq[String] = Nil,
                 bloomBits: Int = 1 << 16): DataFrame = {
    require(cols.nonEmpty, "stats index needs at least one column")
    val out = spark.read.option("basePath", tableDir).parquet(files: _*)
      .select(input_file_name().as("file") +: (cols ++ bloomCols).distinct.map(col): _*)
      .groupBy("file")
      .agg(count(lit(1)).as("rows"), statAggs(cols) ++ bloomAggs(bloomCols, bloomBits): _*)
    if (bloomCols.isEmpty) out else out.withColumn("bloom_bits", lit(bloomBits))
  }

  /** Incremental index maintenance after ANY rewrite (copy-on-write
    * merge, compaction, plain append): reconcile against the table's
    * current listing — keep stats rows whose file still exists, scan ONLY
    * files the index has never seen, drop rows for vanished files. The
    * index row for an unchanged file is reused verbatim (no re-scan), so
    * maintenance cost is proportional to the rewrite delta. `cols` must
    * match the columns the index was built with. */
  def refresh(spark: SparkSession, tableDir: String, stats: DataFrame,
              cols: Seq[String], bloomCols: Seq[String] = Nil,
              currentFiles: Option[Seq[String]] = None): DataFrame = {
    // `currentFiles` overrides the directory listing for tables whose
    // live file set is NOT "everything under tableDir" — e.g. a MOR
    // table's committed data files (uncommitted crash debris must never
    // be scanned into the index).
    val currentByNorm = currentFiles
      .getOrElse(spark.read.parquet(tableDir).inputFiles.toSeq)
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
    else kept.unionByName(
      buildDelta(spark, tableDir, stats, newFiles, cols, bloomCols))
  }

  /** Stats rows for `newFiles` alone — the incremental unit of
    * [[refresh]], exposed so an APPEND-maintained index (e.g. the MOR
    * PK-stats sidecar) can land just the delta instead of rewriting the
    * whole table per maintenance pass. Bloom geometry is read off the
    * existing index (delta rows MUST build under the same m or merged
    * sidecars would probe wrong; an empty index falls back to the
    * default — nothing to mismatch). Zero-row files (Spark routinely
    * writes an empty partition-0 file on small rewrites) produce no
    * aggregation row, so their stats are synthesized: null min/max and
    * an empty bloom exclude them from every candidate set, exact for a
    * rowless file. Returned frame is eagerly materialized. */
  def buildDelta(spark: SparkSession, tableDir: String, stats: DataFrame,
                 newFiles: Seq[String], cols: Seq[String],
                 bloomCols: Seq[String] = Nil): DataFrame = {
    require(newFiles.nonEmpty, "buildDelta needs at least one new file")
    val bloomBits =
      if (bloomCols.isEmpty) 1 << 16
      else {
        val r = stats.agg(max("bloom_bits")).head()
        if (r.isNullAt(0)) 1 << 16 else r.getInt(0)
      }
    // Materialized once (eager, cleaner-reclaimed — ≤ one row per new
    // file): the zero-row probe below AND the caller's write both read
    // it; an unmaterialized plan would re-run the delta scan twice.
    val built = buildFiles(spark, tableDir, newFiles.sorted, cols,
        bloomCols, bloomBits)
      .localCheckpoint(true)
    val builtNorm = built.select("file").collect()
      .map(r => normFile(r.getString(0))).toSet
    val missing = newFiles.filterNot(f => builtNorm.contains(normFile(f)))
    if (missing.isEmpty) built
    else {
      val schema = stats.schema
      val rows = missing.sorted.map { f =>
        org.apache.spark.sql.Row.fromSeq(schema.fields.toSeq.map { fld =>
          fld.name match {
            case "file" => f
            case "rows" => 0L
            case "bloom_bits" => bloomBits
            case n if n.startsWith("nulls_") => 0L
            // empty bit set (the agg schema is non-nullable): no
            // probe position matches → non-candidate, exact for a
            // rowless file
            case n if n.startsWith("bloom_") => Seq.empty[Long]
            case _ => null
          }
        })
      }
      import scala.jdk.CollectionConverters._
      built.unionByName(spark.createDataFrame(rows.asJava, schema))
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

  /** Multi-key equality-probe candidate set over the CONJUNCTION of
    * `columns` (a composite-key point-set lookup — the batch-probe
    * generalization of [[prunedReadPoint]]): a file survives when, for
    * EVERY column, the key set's value span intersects the file's
    * [min, max] — an O(files) decision against one bounding box — and,
    * when the key set is small enough to broadcast (`maxBloomKeys`),
    * when at least one key passes every column's bloom. The bloom pass
    * is O(files x keys) membership probes, which the cap bounds; above
    * it the range decision alone stands (still sound, prunes best on
    * key-clustered layouts). False negatives impossible either way;
    * per-column conjunction can false-positive a file holding the key
    * parts in DIFFERENT rows — read-and-filter corrects it, like every
    * skipping decision here.
    *
    * Keys must be NULL-FREE on `columns` (min/max and blooms do not
    * index nulls — callers probing null keys must fall back to a full
    * scan) and must carry the indexed columns' exact types. */
  def candidateFilesForKeys(stats: DataFrame, keys: DataFrame,
                            columns: Seq[String],
                            maxBloomKeys: Int = 1024): Seq[String] = {
    require(columns.nonEmpty, "key-probe needs at least one column")
    columns.foreach(c => require(stats.columns.contains(s"bloom_$c"),
      s"stats index has no bloom sidecar for $c (build with bloomCols)"))
    val distinctKeys = keys.select(columns.map(col): _*).distinct()
      .localCheckpoint(true)
    val kCount = distinctKeys.count()
    if (kCount == 0) return Nil
    val aggs = columns.flatMap(c =>
      Seq(min(col(c)).as(s"__lo_$c"), max(col(c)).as(s"__hi_$c")))
    val box = distinctKeys.agg(aggs.head, aggs.tail: _*).head()
    val rangeCond = columns.map { c =>
      col(s"max_$c") >= lit(box.getAs[Any](s"__lo_$c")) &&
        col(s"min_$c") <= lit(box.getAs[Any](s"__hi_$c"))
    }.reduce(_ && _)
    val ranged = stats.where(rangeCond)
    val out =
      if (kCount > maxBloomKeys) ranged
      else {
        val k = broadcast(
          distinctKeys.select(columns.map(c => col(c).as(s"__k_$c")): _*))
        val bloomCond = columns.map { c =>
          val (p1, p2) =
            bloomPositions(col(s"__k_$c"), col("bloom_bits").cast("long"))
          array_contains(col(s"bloom_$c"), p1) &&
            array_contains(col(s"bloom_$c"), p2)
        }.reduce(_ && _)
        ranged.join(k, bloomCond, "left_semi")
      }
    out.select("file").collect().map(_.getString(0)).toSeq
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
    val lo = lower.map(v => col(s"max_$column") >= lit(v)).getOrElse(lit(true))
    val hi = upper.map(v => col(s"min_$column") <= lit(v)).getOrElse(lit(true))
    val exact: Column => Column = c => (lower, upper) match {
      case (Some(l), Some(u)) => c.between(lit(l), lit(u))
      case (Some(l), None)    => c >= lit(l)
      case (None, Some(u))    => c <= lit(u)
      case (None, None)       => lit(true)
    }
    reconciledRead(spark, tableDir, stats, lo && hi, exact(col(column)))
  }

  /** Equality-probe read through the bloom sidecar: scan ONLY the files
    * whose bloom for `column` may contain `value` (false positives read
    * and filtered; false negatives impossible), then apply the exact
    * equality. The access path min/max cannot serve: a point lookup on
    * a high-cardinality key in an UNCLUSTERED table intersects every
    * file's [min, max], but each file's bloom holds only the keys it
    * actually has. Same stale-index reconciliation as [[prunedRead]]
    * (unseen files always scan, vanished files skip), so a stale index
    * degrades pruning, never the answer. `value` must carry the indexed
    * column's type (hashing goes through `cast("string")` — an INT
    * probe of a LONG column would hash identically, but a DOUBLE
    * rendering would not). m comes from the index itself (`bloom_bits`),
    * so a probe can never use mismatched geometry. */
  def prunedReadPoint(spark: SparkSession, tableDir: String, stats: DataFrame,
                      column: String, value: Any): DataFrame = {
    require(stats.columns.contains(s"bloom_$column"),
      s"stats index has no bloom sidecar for $column (build with bloomCols)")
    // The probe positions use each ROW's recorded `bloom_bits` — no
    // separate driver job to fetch m (the candidate decision stays ONE
    // collect, like the range path), no NPE on an empty index, and rows
    // written under different geometries each probe correctly.
    val (p1, p2) = bloomPositions(lit(value), col("bloom_bits").cast("long"))
    val member = array_contains(col(s"bloom_$column"), p1) &&
      array_contains(col(s"bloom_$column"), p2)
    reconciledRead(spark, tableDir, stats, member, col(column) === lit(value))
  }

  /** Per-file TOKEN bloom sidecar over a TEXT column — "grep the lake"
    * data skipping: each file records the bloom positions of its
    * DISTINCT whitespace tokens ([[graft.functions.TextFunctions
    * .tokens]] — the same tokenizer every text operator uses), so a
    * full-text token probe opens only files that may contain the term.
    * Token granularity needs its own explode scan (unlike the value
    * blooms it cannot ride the per-row stats aggregation), but the scan
    * is one pass with per-row `array_distinct` map-side dedup and
    * sketch-sized output (≤ min(2·distinct tokens, m) positions per
    * file). Sizing: m ≥ 6·(distinct tokens per file) for the usual
    * bloom math; vocabulary is sublinear in file size (Heaps), so 2^16
    * holds far longer than for id keys. Geometry is recorded
    * (`bloom_bits`), like [[build]]. */
  def buildTokenBloom(spark: SparkSession, tableDir: String, textCol: String,
                      bloomBits: Int = 1 << 16): DataFrame = {
    require(bloomBits >= 64 && bloomBits <= (1 << 30), s"bloomBits out of range: $bloomBits")
    val toks = spark.read.parquet(tableDir)
      .select(input_file_name().as("file"),
        explode_outer(array_distinct(
          graft.functions.TextFunctions.tokens(col(textCol)))).as("__t"))
    val (p1, p2) = bloomPositions(col("__t"), lit(bloomBits.toLong))
    // explode_outer keeps empty/NULL-text files present (their NULL
    // token yields NULL positions, which collect_set drops → empty
    // bloom → every probe prunes the file, correctly).
    toks.groupBy("file")
      .agg(array_sort(array_union(collect_set(p1), collect_set(p2)))
        .as(s"tokbloom_$textCol"))
      .withColumn("bloom_bits", lit(bloomBits))
  }

  /** Token-probe read through the token bloom: scan ONLY the files
    * whose sidecar may contain `token`, then apply the exact
    * `array_contains(tokens(textCol), token)` predicate — row-identical
    * to the full scan (false positives read and filtered, false
    * negatives impossible). Same stale-index reconciliation as
    * [[prunedRead]]: unseen files always scan, vanished files skip. The
    * access path nothing else serves: min/max is meaningless on prose,
    * and the BM25/phrase indexes answer RANKED queries over their own
    * posting layout — this is the cheap "which raw files mention X at
    * all" primitive (PII incident response, trigger-phrase audits)
    * straight over the lake files. */
  def prunedReadToken(spark: SparkSession, tableDir: String,
                      tokenStats: DataFrame, textCol: String,
                      token: String): DataFrame = {
    require(tokenStats.columns.contains(s"tokbloom_$textCol"),
      s"stats index has no token bloom for $textCol (buildTokenBloom)")
    val (p1, p2) = bloomPositions(lit(token), col("bloom_bits").cast("long"))
    val member = array_contains(col(s"tokbloom_$textCol"), p1) &&
      array_contains(col(s"tokbloom_$textCol"), p2)
    reconciledRead(spark, tableDir, tokenStats, member,
      array_contains(graft.functions.TextFunctions.tokens(col(textCol)), token))
  }

  /** Shared skeleton of the index-pruned reads: evaluate `cand` over
    * the stats table, reconcile against the live listing, scan the
    * survivors, apply `exact`.
    *
    * Reconciles on NORMALIZED identity ([[normFile]]): the index stores
    * input_file_name() strings while inputFiles renders URIs — an exact
    * compare could classify every indexed file as unseen and silently
    * defeat pruning. Scan paths are taken from the live listing. One
    * collect serves both the known set and the candidate set (the stats
    * table is one row per file — two jobs over it would double the
    * fixed per-job latency that dominates this driver-side decision). */
  private def reconciledRead(spark: SparkSession, tableDir: String,
                             stats: DataFrame, cand: Column,
                             exact: Column): DataFrame = {
    val base = spark.read.parquet(tableDir)
    val idx = stats
      .select(col("file"), coalesce(cand, lit(false)).as("__cand"))
      .collect().map(r => normFile(r.getString(0)) -> r.getBoolean(1))
    val known = idx.map(_._1).toSet
    val candSet = idx.collect { case (f, true) => f }.toSet
    val files = base.inputFiles.toSeq.filter { f =>
      val n = normFile(f)
      candSet.contains(n) || !known.contains(n)
    }
    if (files.isEmpty) base.limit(0)
    // basePath keeps hive-partition columns resolvable from an explicit
    // file list (the S2 scan shape, CdcPipeline.scala:75-94).
    else spark.read.schema(base.schema).option("basePath", tableDir)
      .parquet(files: _*)
      .where(exact)
  }

  /** Clustering-quality audit over the index's own [min, max] intervals:
    * per `groupCol` slice, the file count and the MAX number of files
    * whose interval covers any single key point — the worst-case file
    * fan-in a point probe pays, i.e. the "should this table be
    * re-clustered" advisor (depth 1 ⇒ perfectly range-clustered; depth ≈
    * n_files ⇒ every probe opens everything, zone maps prune nothing).
    *
    * Metadata-sized end to end: a sweep over 2·n_files integer endpoints
    * (+1 at min, −1 at max+1 — closed intervals on an integral key),
    * collapsed per point first so coincident endpoints cannot order-race,
    * then one running sum per group (`dq_overlap_depth` pins it against
    * a layout formula DuckDB re-derives). At 100k files this is 200k
    * rows through one window — nothing touches the data. */
  def overlapDepth(stats: DataFrame, keyCol: String,
                   groupCol: String): DataFrame = {
    val lo = col(s"min_$keyCol").cast("long")
    val hi = col(s"max_$keyCol").cast("long")
    val ev = stats.select(col(groupCol), lo.as("p"), lit(1L).as("d"))
      .unionByName(stats.select(col(groupCol), (hi + 1L).as("p"), lit(-1L).as("d")))
    val byPoint = ev.groupBy(groupCol, "p").agg(sum("d").as("dd"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy("p")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val depths = byPoint.withColumn("depth", sum("dd").over(w))
    val nf = stats.groupBy(groupCol).agg(count(lit(1)).as("n_files"))
    nf.join(depths.groupBy(groupCol).agg(max("depth").as("max_depth")), Seq(groupCol))
  }
}
