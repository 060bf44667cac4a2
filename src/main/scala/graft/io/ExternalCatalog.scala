package graft.io

import org.apache.spark.sql.SparkSession

/** Metastore registration for PATH-based datasets (hive-partitioned
  * parquet directories that are not `saveAsTable` tables — e.g. the IVF
  * vector index). The registration makes a directory discoverable by
  * NAME from any session sharing the catalog — the same durability
  * [[graft.GraftLake.register]] gives lake tables (the reference's
  * Glue-crawler analog, DMSCDC_CloudTemplate_Source.yaml:210-232) —
  * while keeping the write paths plain directory writes (no metastore
  * round-trip per maintenance batch).
  */
object ExternalCatalog {

  /** Register `dir` as a metastore-backed EXTERNAL parquet table.
    * Idempotent and cheap to re-call: an unchanged entry (same location,
    * columns, partitioning) is kept as-is — no DROP/CREATE window for
    * concurrent catalog-sharing readers — and every call re-syncs
    * partitions (`MSCK ... SYNC PARTITIONS`: recovers directories a
    * maintenance append created AND drops entries whose directories a
    * partition-level rewrite deleted) and refreshes cached file
    * listings. Call again after any out-of-band directory maintenance.
    *
    * Never replaces an entry it did not create: a MANAGED table at the
    * name would be dropped WITH its data, and a VIEW is someone's
    * definition — both refuse loudly. */
  def registerParquetDir(spark: SparkSession, name: String, dir: String,
                         partitionCols: Seq[String]): String = {
    import org.apache.spark.sql.catalyst.TableIdentifier
    import org.apache.spark.sql.catalyst.catalog.CatalogTableType
    val df = spark.read.parquet(dir)
    val missing = partitionCols.filterNot(df.columns.contains)
    require(missing.isEmpty,
      s"partition columns ${missing.mkString(", ")} absent from $dir schema")
    spark.catalog.dropTempView(name): Unit
    val catalog = spark.sessionState.catalog
    val ident = TableIdentifier(name)
    val existing =
      if (catalog.tableExists(ident)) Some(catalog.getTableMetadata(ident)) else None
    existing.foreach { meta =>
      require(meta.tableType == CatalogTableType.EXTERNAL,
        s"catalog already holds a ${meta.tableType.name} table `$name` — " +
          "refusing to replace it (rename one side)")
    }
    def cols(s: org.apache.spark.sql.types.StructType) =
      s.fields.map(f => (f.name, f.dataType)).toSet
    val unchanged = existing.exists { meta =>
      new org.apache.hadoop.fs.Path(meta.location).toUri.getPath ==
        new org.apache.hadoop.fs.Path(dir).toUri.getPath &&
        cols(meta.schema) == cols(df.schema) &&
        meta.partitionColumnNames == partitionCols
    }
    if (!unchanged) {
      spark.sql(s"DROP TABLE IF EXISTS `$name`")
      val partClause =
        if (partitionCols.isEmpty) ""
        else partitionCols.map(p => s"`$p`").mkString("PARTITIONED BY (", ", ", ")")
      spark.sql(
        s"CREATE TABLE `$name` (${df.schema.toDDL}) USING parquet $partClause LOCATION '$dir'")
    }
    if (partitionCols.nonEmpty)
      spark.sql(s"MSCK REPAIR TABLE `$name` SYNC PARTITIONS")
    spark.catalog.refreshTable(name)
    name
  }

  // ---- registration marker (path -> name reverse lookup) ----
  //
  // A probe that only holds the DIRECTORY cannot know a registration
  // exists without scanning the whole catalog. The marker — one tiny
  // sibling file, `<dir>_catalog` — records the registered name, so
  // readers route through the metastore (partition pruning from catalog
  // metadata: no directory listing, no parallelPartitionDiscovery job
  // above the threshold) whenever a registration exists, and fall back
  // to the path read otherwise. Sibling suffix, not an underscore
  // subdirectory, for the same reason as the ledger: Spark's source
  // path filter must not see it.

  private def markerPath(dir: String) =
    new org.apache.hadoop.fs.Path(dir.stripSuffix("/") + "_catalog")

  private[graft] def writeMarker(spark: SparkSession, dir: String,
                                 name: String): Unit = {
    val p = markerPath(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(name.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** The registered table name of `dir`, when a registration marker
    * exists AND the catalog entry is live AND still points at this
    * directory (a reused name routes back to the path read instead of
    * answering from someone else's data). One FS stat on the common
    * path; used by every probe-side read. */
  def registeredName(spark: SparkSession, dir: String): Option[String] = {
    val p = markerPath(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val name =
      try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
        java.nio.charset.StandardCharsets.UTF_8).trim
      finally in.close()
    import org.apache.spark.sql.catalyst.TableIdentifier
    val catalog = spark.sessionState.catalog
    if (name.isEmpty || !catalog.tableExists(TableIdentifier(name))) None
    else {
      val meta = catalog.getTableMetadata(TableIdentifier(name))
      val same = new org.apache.hadoop.fs.Path(meta.location).toUri.getPath ==
        new org.apache.hadoop.fs.Path(dir).toUri.getPath
      if (same) Some(name) else None
    }
  }

  /** Drop `dir`'s registration — catalog entry and marker — when one
    * exists. Used when the directory itself is being wiped (a rebuild)
    * so no stale catalog entry can answer from vanished data; the
    * rebuilder re-registers after the new build lands. No-op when
    * unregistered. */
  def unregister(spark: SparkSession, dir: String): Unit = {
    registeredName(spark, dir).foreach { name =>
      spark.sql(s"DROP TABLE IF EXISTS `$name`"): Unit
    }
    val p = markerPath(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, false): Unit
  }

  /** Precise partition sync after a maintenance batch — the O(impacted)
    * alternative to a full MSCK: ADD the partitions the batch created,
    * DROP the ones it emptied, refresh cached listings. No-op when the
    * directory has no live registration. */
  def syncPartitions(spark: SparkSession, dir: String, partCol: String,
                     added: Iterable[Long], dropped: Iterable[Long]): Unit =
    registeredName(spark, dir).foreach { name =>
      if (added.nonEmpty)
        spark.sql(added.map(v => s"PARTITION (`$partCol`=$v)")
          .mkString(s"ALTER TABLE `$name` ADD IF NOT EXISTS ", " ", ""))
      dropped.foreach(v =>
        spark.sql(s"ALTER TABLE `$name` DROP IF EXISTS PARTITION (`$partCol`=$v)"))
      spark.catalog.refreshTable(name)
    }
}
