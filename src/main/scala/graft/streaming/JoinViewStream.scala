package graft.streaming

import graft.cdc.{Op, TableConfig}
import graft.io.{CdcPipeline, MorTable}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** CDC-maintained JOIN view as a stream — the persisted, exactly-once
  * form of [[graft.ops.IncrementalJoin]].
  *
  * Each fact micro-batch (1) merges into the fact lake exactly as
  * [[CdcStream]] would, then (2) maintains the fact⋈dim view — ITSELF a
  * lake table — by synthesizing the view's OWN CDC batch: batch keys
  * still alive after the merge become recomputed upsert rows (a
  * semi-join-pruned fact scan joined to the dim), keys the merge removed
  * become delete rows. The synthesized batch rides the SAME CoW/MOR
  * merge machinery as any table ([[CdcPipeline.mergeTagged]] — the
  * `viewCfg.mergeOnRead` switch picks the format), so view maintenance
  * inherits the lake's crash/replay idempotence: a replayed micro-batch
  * recomputes the same winners from the (idempotently merged) fact and
  * merges the view to the same state.
  *
  * 100 TB shape, per micro-batch: the fact recompute reads only files
  * that can hold batch keys (PK-clustered pruning), the dim lookup
  * touches pruned rows (broadcast under AQE when it fits), and the view
  * write is impacted-file CoW or an O(batch) MOR commit — never a full
  * re-join of the fact table.
  */
object JoinViewStream {

  /** Start the fact file stream; every micro-batch merges the fact lake
    * at `factPath` and maintains the fact⋈dim view at `viewPath`.
    *
    * @param pkCols    fact primary key (the view's row grain)
    * @param usingCols fact→dim equi-join columns (dim unique on them)
    * @param viewCfg   view-table format config; its primary key must be
    *                  `pkCols` so the synthesized upserts/deletes merge
    *                  by fact key */
  def start(spark: SparkSession, tableDir: String, factPath: String,
            viewPath: String, dim: DataFrame, pkCols: Seq[String],
            usingCols: Seq[String], factCfg: TableConfig, viewCfg: TableConfig,
            checkpoint: String, trigger: Trigger = Trigger.AvailableNow(),
            maxFilesPerTrigger: Int = 100): StreamingQuery = {
    require(factCfg.hasPrimaryKey, "join-view maintenance requires fact primary keys")
    require(viewCfg.primaryKeys == pkCols,
      s"view config must merge on the fact key: ${viewCfg.primaryKeys} vs $pkCols")
    val schema = CdcStream.sourceSchema(spark, tableDir)
    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .option("pathGlobFilter", "2*")
      .option("latestFirst", "false")
      .parquet(tableDir)
      .select(col("*"), col("_metadata.file_path").as(CdcPipeline.SrcFile),
        col("_metadata.row_index").as(CdcPipeline.RowIdx))
    stream.writeStream
      .queryName(s"join-view-${new org.apache.hadoop.fs.Path(viewPath).getName}")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        ingestBatch(batch, factPath, viewPath, dim, pkCols, usingCols,
          factCfg, viewCfg, id)
      }
      .start()
  }

  /** One micro-batch: fact merge, then the synthesized view-CDC merge.
    * Public as the BATCH ingest entry (the DetectorStream.ingestBatch
    * convention): lifecycle queries and backfills deliver tagged batches
    * directly; [[start]] routes the file stream through it. */
  def ingestBatch(batch: DataFrame, factPath: String,
      viewPath: String, dim: DataFrame, pkCols: Seq[String],
      usingCols: Seq[String], factCfg: TableConfig, viewCfg: TableConfig,
      batchId: Long): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession

    // The view's own CDC batch, synthesized from the post-merge fact
    // rows (`fact0` — with the Op column still attached) and merged into
    // the view lake. Reads ONLY `fact0`, the dim, the batch, and the
    // VIEW table — never the fact lake — so the retained path below can
    // run it concurrently with the fact lake's own write+delete tail.
    def maintainView(fact0: DataFrame): Unit = {
      val fact = fact0.drop(Op.column)
      val keys = batch.select(pkCols.map(col): _*).distinct()
      // keys still alive after the merge → recomputed view rows (upserts);
      // keys the merge removed → view deletes (typed-NULL non-key columns)
      val live = fact.join(keys, pkCols, "left_semi")
        .join(dim, usingCols, "left")
        .withColumn(Op.column, lit(Op.Update))
      val nonKey = live.schema
        .filterNot(f => pkCols.contains(f.name) || f.name == Op.column)
      val dead = keys.join(fact.select(pkCols.map(col): _*), pkCols, "left_anti")
        .select(pkCols.map(col) ++
          nonKey.map(f => lit(null).cast(f.dataType).as(f.name)): _*)
        .withColumn(Op.column, lit(Op.Delete))
      // Materialize the synthesized batch ONCE (batch-sized): mergeTagged
      // evaluates its input more than once (file-list distinct, then the
      // merge itself), and this input is a join tree, not a parquet scan —
      // without the checkpoint every evaluation would re-run the pruned
      // fact read and the dim join.
      // ... tagged AFTER the checkpoint: the literal SrcFile then stays
      // visible in the analyzed plan, so the view merge derives file_seq
      // without a scan (CdcPipeline.literalSrcFile fast path).
      // Unpersist in finally: a failure in the view merge must not leak
      // the eager localCheckpoint blocks across streaming retries.
      val ckpt = live.unionByName(dead).localCheckpoint(true)
      try {
        val viewBatch = ckpt
          .withColumn(CdcPipeline.SrcFile, lit(f"view-batch-$batchId%012d"))
          .withColumn(CdcPipeline.RowIdx, lit(0L)) // ≤ 1 row per key per batch
        CdcPipeline.mergeTagged(spark, viewBatch, viewPath, viewCfg): Unit
      } finally ckpt.unpersist(blocking = false): Unit
    }

    // Copy-on-write facts hand back the merge's own output (the
    // post-merge rows of every impacted file — a SUPERSET of the batch
    // keys' live rows, since impacted = files holding batch keys), so
    // the view recompute probes a batch-sized cached frame instead of
    // re-scanning the whole fact lake per micro-batch: O(batch +
    // bystanders), not O(target) — the PK-pruned read the class doc
    // promises. The view maintenance rides the merge's `onRetained`
    // hook, so it runs CONCURRENTLY with the fact lake's write+delete
    // tail (guide §2.6 — the two halves touch disjoint tables; a crash
    // on either side is the same torn-between-tables state the
    // sequential order had, and the streaming replay converges both).
    // MOR facts keep the sequential merged-view read (their commit is
    // already O(batch); the live view resolves base∖deletes lazily).
    if (!factCfg.mergeOnRead && factCfg.hasPrimaryKey) {
      val stats = CdcPipeline.mergeTagged(spark, batch, factPath, factCfg,
        retainOutput = true, onRetained = Some(maintainView))
      // the view batch's own eager checkpoint consumed the retained
      // output inside the hook; release its blocks
      stats.mergedOutput.foreach(_.unpersist(blocking = false))
    } else {
      CdcPipeline.mergeTagged(spark, batch, factPath, factCfg): Unit
      maintainView(readLake(spark, factPath, factCfg))
    }
  }

  /** Format-dispatched lake read (plain parquet for CoW, merged view of
    * commits + delete sidecars for MOR). */
  private def readLake(spark: SparkSession, path: String, cfg: TableConfig): DataFrame =
    if (cfg.mergeOnRead) MorTable.read(spark, path)
    // mergeSchema, matching CdcPipeline.mergeTagged's own target read: an
    // evolving CoW lake has mixed footers, and a footer-sampled schema
    // would silently drop evolved-column values from untouched files.
    else spark.read.option("mergeSchema", "true").parquet(path)
}
