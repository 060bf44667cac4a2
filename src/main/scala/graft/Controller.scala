package graft

import graft.cdc.TableConfig
import graft.io.{CdcPipeline, Discovery}
import graft.state.{StateStore, TableItem}
import org.apache.spark.sql.SparkSession
import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset}
import java.util.concurrent.Executors
import scala.concurrent.duration.Duration
import scala.concurrent.{Await, ExecutionContext, Future}

/** In-process pipeline controller: collapses the reference's four Glue
  * process boundaries (Controller → ProcessTable → LoadInitial/
  * LoadIncremental, /root/reference/DMSCDC_Controller.py:107-112,
  * DMSCDC_ProcessTable.py:60-122) into one driver program.
  *
  * Per run: discover `{schema}/{table}` dirs (C1), upsert default state
  * (C2), gate on the active flag (C5), decide initial vs incremental by
  * comparing file metadata to watermarks (C3/C4), run the load, and advance
  * watermarks only on success (C8). Tables run in parallel (reference
  * MaxConcurrentRuns=50 fan-out) on the Spark scheduler's thread-safe
  * driver — each table's job occupies its own thread, Spark interleaves
  * stages across the 32 local cores.
  */
object Controller {
  sealed trait Action
  case object Skipped extends Action
  final case class FullLoad(rows: Long) extends Action
  final case class Incremental(rows: Long, files: Int) extends Action
  case object NoNewData extends Action
  /** A table's load failed; its watermarks did NOT advance (C8) and the
    * other tables' loads proceed — per-table isolation like the
    * reference's independent Glue job runs. */
  final case class Failed(error: String) extends Action
}

class Controller(spark: SparkSession, store: StateStore,
                 rawRoot: String, lakeRoot: String,
                 parallelism: Int = 8,
                 tableTimeout: Duration = Duration(900, "s")) {
  import Controller._

  private val mtimeFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss").withZone(ZoneOffset.UTC)

  /** One scheduled run over every discovered table; returns per-table
    * actions in execution order (a table can do a full load AND an
    * incremental merge in the same run, like the reference's ProcessTable).
    *
    * Each table gets its OWN `tableTimeout` budget, measured from when its
    * load starts (reference parity: ProcessTable polls each Glue job for at
    * most 900 s from job start, DMSCDC_ProcessTable.py:41-42). A table that
    * exceeds it reports `Failed(timeout)` and has its Spark jobs cancelled
    * via its job group, while every other table's result is returned
    * normally — one hung table no longer discards the whole run. Watermarks
    * stay safe under cancellation: they commit inside [[processTable]] only
    * after the load action completed (C8). */
  def runOnce(): Map[String, List[Action]] = {
    val tables = Discovery.listTables(rawRoot, spark.sparkContext.hadoopConfiguration)
    tables.foreach(t => store.upsertDefaults(t.dir))
    val active = tables.filter(t => store.get(t.dir).exists(_.config.active))
    val n = math.max(1, math.min(parallelism, math.max(1, active.size)))
    // Two pools: workers run the Spark loads, waiters arm each table's
    // budget when its worker slot frees (so queue time behind other tables
    // is not charged against the table's own 900 s).
    val workPool = Executors.newFixedThreadPool(n)
    val waitPool = Executors.newFixedThreadPool(n)
    val workEc = ExecutionContext.fromExecutor(workPool)
    implicit val waitEc: ExecutionContext = ExecutionContext.fromExecutor(waitPool)
    try {
      val futures = active.map { t =>
        Future {
          val group = s"graft-cdc-${t.key}"
          val work = Future {
            spark.sparkContext.setJobGroup(group, s"CDC load ${t.key}", interruptOnCancel = true)
            try processTable(t, store.get(t.dir).get)
            finally spark.sparkContext.clearJobGroup()
          }(workEc)
          t.key -> (scala.util.Try(Await.result(work, tableTimeout)) match {
            case scala.util.Success(actions) => actions
            case scala.util.Failure(_: java.util.concurrent.TimeoutException) =>
              // Cancel the table's in-flight Spark jobs so a wedged load
              // cannot keep writing (or advancing watermarks) after the
              // run reported it failed.
              spark.sparkContext.cancelJobGroup(group)
              List[Action](Failed(s"timeout after $tableTimeout"))
            case scala.util.Failure(e) =>
              List[Action](Failed(s"${e.getClass.getSimpleName}: ${e.getMessage}"))
          })
        }
      }
      // Bounded: every waiter's inner await is capped by tableTimeout, so
      // the run takes at most ceil(active/n) * tableTimeout.
      val done = futures.map(f => Await.result(f, Duration.Inf)).toMap
      tables.filterNot(active.contains).map(_.key -> List[Action](Skipped)).toMap ++ done
    } finally { workPool.shutdown(); waitPool.shutdown() }
  }

  /** ProcessTable logic for one table (DMSCDC_ProcessTable.py:60-122).
    * Overridable for fault-injection in tests. */
  protected def processTable(t: Discovery.TableDir, item: TableItem): List[Action] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val outPath = s"${lakeRoot.stripSuffix("/")}/${t.schema}/${t.table}"
    val cfg: TableConfig = item.config

    // C3: full (re)load if any LOAD* file is newer than the watermark.
    val fullLoad = Discovery.latestFullLoadMtime(t.dir, conf).flatMap { mtime =>
      val stamp = mtimeFmt.format(Instant.ofEpochMilli(mtime))
      if (stamp > item.state.lastFullLoadDate) {
        val rows = CdcPipeline.loadInitial(spark, Discovery.loadFiles(t.dir, conf), outPath, cfg)
        store.commitFullLoad(t.dir, stamp)
        Some(FullLoad(rows))
      } else None
    }

    // C4: then apply any CDC files past the incremental watermark.
    val incr = Discovery.cdcFilesAfter(t.dir, item.state.lastIncrementalFile, conf).map { batch =>
      val stats = CdcPipeline.loadIncremental(spark, batch.files, outPath, cfg)
      store.commitIncremental(t.dir, batch.newWatermark)
      Incremental(stats.rowsWritten, batch.files.size)
    }

    val actions = fullLoad.toList ++ incr.toList
    if (actions.isEmpty) List(NoNewData) else actions
  }
}
