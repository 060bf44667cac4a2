package graft

import graft.cdc.TableConfig
import graft.io.{CdcPipeline, Discovery}
import graft.state.{StateStore, TableItem}
import org.apache.spark.sql.SparkSession
import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset}
import java.util.concurrent.{Callable, ConcurrentHashMap, ExecutionException, Executors, TimeUnit, Future => JFuture, TimeoutException => JTimeoutException}
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

  // Timed-out tables: their zombie loads (if the interrupt didn't take) are
  // barred from committing watermarks; cleared when the table is next
  // scheduled cleanly. Keyed by table key; lives across runOnce calls.
  private val timedOut = ConcurrentHashMap.newKeySet[String]()
  // Last submitted work per table, so a later runOnce can refuse to start a
  // concurrent merge while a zombie is still on its thread.
  private val inFlight = new ConcurrentHashMap[String, JFuture[List[Action]]]()

  /** C8 commit gate: a load that outlived its timeout must not advance
    * watermarks — the run already reported it Failed, and the next clean
    * run will redo the work idempotently. */
  protected final def commitFullLoad(t: Discovery.TableDir, stamp: String): Unit =
    if (!timedOut.contains(t.key)) store.commitFullLoad(t.dir, stamp)
  protected final def commitIncremental(t: Discovery.TableDir, watermark: String): Unit =
    if (!timedOut.contains(t.key)) store.commitIncremental(t.dir, watermark)

  /** One scheduled run over every discovered table; returns per-table
    * actions in execution order (a table can do a full load AND an
    * incremental merge in the same run, like the reference's ProcessTable).
    *
    * Each table gets its OWN `tableTimeout` budget, measured from when its
    * load starts (reference parity: ProcessTable polls each Glue job for at
    * most 900 s from job start, DMSCDC_ProcessTable.py:41-42). A table that
    * exceeds it reports `Failed(timeout)` and is cancelled on three fronts:
    * its in-flight Spark jobs via the job group, its worker THREAD via
    * interrupt (so a load wedged driver-side — a stalled S3 listing, not a
    * Spark job — frees its pool slot instead of starving later tables),
    * and its watermark commits via a per-table timed-out flag (so a zombie
    * that survives the interrupt cannot commit after the run already
    * reported it Failed). If a zombie is STILL running when the table
    * comes up in a later `runOnce`, that run skips the table with
    * `Failed(previous load still running)` rather than race two concurrent
    * merges over the same files. Watermarks stay safe under cancellation:
    * they commit inside [[processTable]] only after the load action
    * completed (C8), and only while the table is not flagged. */
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
    implicit val waitEc: ExecutionContext = ExecutionContext.fromExecutor(waitPool)
    try {
      val futures = active.map { t =>
        Future {
          val group = s"graft-cdc-${t.key}"
          val prior = inFlight.get(t.key)
          if (prior != null && !prior.isDone)
            t.key -> List[Action](Failed(
              "previous load still running (timed out earlier; refusing a concurrent merge)"))
          else {
            timedOut.remove(t.key)
            val work: JFuture[List[Action]] = workPool.submit(new Callable[List[Action]] {
              override def call(): List[Action] = {
                spark.sparkContext.setJobGroup(group, s"CDC load ${t.key}", interruptOnCancel = true)
                try processTable(t, store.get(t.dir).get)
                finally spark.sparkContext.clearJobGroup()
              }
            })
            inFlight.put(t.key, work)
            t.key -> (scala.util.Try(work.get(tableTimeout.toMillis, TimeUnit.MILLISECONDS)) match {
              case scala.util.Success(actions) => actions
              case scala.util.Failure(_: JTimeoutException) =>
                // Three-front cancellation (see scaladoc): flag first so a
                // load that races past the interrupt still cannot commit.
                timedOut.add(t.key)
                spark.sparkContext.cancelJobGroup(group)
                work.cancel(true)
                List[Action](Failed(s"timeout after $tableTimeout"))
              case scala.util.Failure(e: ExecutionException) =>
                val c = if (e.getCause != null) e.getCause else e
                List[Action](Failed(s"${c.getClass.getSimpleName}: ${c.getMessage}"))
              case scala.util.Failure(e) =>
                List[Action](Failed(s"${e.getClass.getSimpleName}: ${e.getMessage}"))
            })
          }
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

    // Storage mode: copy-on-write (reference parity, default) or
    // merge-on-read (config opt-in; requires a PK — validated in the
    // MOR load itself so a misconfigured table reports Failed).
    val mor = cfg.mergeOnRead

    // C3: full (re)load if any LOAD* file is newer than the watermark.
    val fullLoad = Discovery.latestFullLoadMtime(t.dir, conf).flatMap { mtime =>
      val stamp = mtimeFmt.format(Instant.ofEpochMilli(mtime))
      if (stamp > item.state.lastFullLoadDate) {
        val files = Discovery.loadFiles(t.dir, conf)
        val rows =
          if (mor) CdcPipeline.loadInitialMor(spark, files, outPath)
          else CdcPipeline.loadInitial(spark, files, outPath, cfg)
        commitFullLoad(t, stamp)
        Some(FullLoad(rows))
      } else None
    }

    // C4: then apply any CDC files past the incremental watermark.
    val incr = Discovery.cdcFilesAfter(t.dir, item.state.lastIncrementalFile, conf).map { batch =>
      val stats =
        if (mor) CdcPipeline.loadIncrementalMor(spark, batch.files, outPath, cfg)
        else CdcPipeline.loadIncremental(spark, batch.files, outPath, cfg)
      commitIncremental(t, batch.newWatermark)
      Incremental(stats.rowsWritten, batch.files.size)
    }

    val actions = fullLoad.toList ++ incr.toList
    if (actions.isEmpty) List(NoNewData) else actions
  }
}
