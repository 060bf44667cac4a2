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

final class Controller(spark: SparkSession, store: StateStore,
                       rawRoot: String, lakeRoot: String,
                       parallelism: Int = 8,
                       runTimeout: Duration = Duration(900, "s")) {
  import Controller._

  private val mtimeFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss").withZone(ZoneOffset.UTC)

  /** One scheduled run over every discovered table; returns per-table
    * actions in execution order (a table can do a full load AND an
    * incremental merge in the same run, like the reference's ProcessTable). */
  def runOnce(): Map[String, List[Action]] = {
    val tables = Discovery.listTables(rawRoot, spark.sparkContext.hadoopConfiguration)
    tables.foreach(t => store.upsertDefaults(t.dir))
    val active = tables.filter(t => store.get(t.dir).exists(_.config.active))
    val pool = Executors.newFixedThreadPool(math.max(1, math.min(parallelism, math.max(1, active.size))))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val futures = active.map { t =>
        Future(t.key -> (scala.util.Try(processTable(t, store.get(t.dir).get)) match {
          case scala.util.Success(actions) => actions
          case scala.util.Failure(e) =>
            List[Action](Failed(s"${e.getClass.getSimpleName}: ${e.getMessage}"))
        }))
      }
      // Reference parity: ProcessTable polls each load for at most 900 s
      // (DMSCDC_ProcessTable.py:41-42); a hung table fails the run instead
      // of wedging the scheduler.
      val done = Await.result(Future.sequence(futures), runTimeout).toMap
      tables.filterNot(active.contains).map(_.key -> List[Action](Skipped)).toMap ++ done
    } finally pool.shutdown()
  }

  /** ProcessTable logic for one table (DMSCDC_ProcessTable.py:60-122). */
  private def processTable(t: Discovery.TableDir, item: TableItem): List[Action] = {
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
