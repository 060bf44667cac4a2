package graft.streaming

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryException}
import scala.jdk.CollectionConverters._
import scala.util.control.NonFatal

/** Multi-table streaming orchestration: one CDC stream per table, started,
  * monitored and restarted from one place — the streaming twin of
  * [[graft.Controller]]'s batch fan-out (reference parity: the controller
  * launches up to 50 concurrent per-table loads,
  * /root/reference/DMSCDC_Controller.py:107-110,
  * DMSCDC_CloudTemplate_Reusable.yaml:512 `MaxConcurrentRuns: 50`).
  *
  * Each table's query has its own checkpoint, so tables are isolated
  * exactly like the reference's independent Glue job runs: one table's
  * failure (bad file, schema clash) never stops the others, and
  * [[restartFailed]] relaunches dead queries from their checkpoints —
  * at-least-once replay made effectively exactly-once by the idempotent
  * PK merge. A [[StreamMetrics]] listener is attached for the lifetime of
  * the manager; [[metricsFor]] surfaces per-table batches/rows/state.
  *
  * Scale: queries share the session's scheduler pools; N tables = N
  * concurrent micro-batch queries on the driver, the same shape
  * `spark.streams` is built for. Starters are invoked lazily so a table
  * whose START fails (e.g. schema inference on a corrupt dir) is recorded
  * as a failure rather than aborting the fan-out.
  */
final class StreamManager private[graft] (
    spark: SparkSession, starters: Map[String, () => StreamingQuery]) {

  /** Per-query operational counters, fed by the listener bus. */
  val metrics = new StreamMetrics
  spark.streams.addListener(metrics)

  private val queriesMap = new ConcurrentHashMap[String, StreamingQuery]()
  private val startErrors = new ConcurrentHashMap[String, Throwable]()

  /** Launch every table's stream. Idempotent per table: a table with a
    * live query keeps it. */
  def startAll(): this.type = {
    starters.foreach { case (k, f) =>
      if (!Option(queriesMap.get(k)).exists(_.isActive)) launch(k, f)
    }
    this
  }

  private def launch(k: String, f: () => StreamingQuery): Unit =
    try { queriesMap.put(k, f()); startErrors.remove(k): Unit }
    catch { case NonFatal(e) => startErrors.put(k, e): Unit }

  /** Live view of the per-table queries (absent = start failed). */
  def queries: Map[String, StreamingQuery] = queriesMap.asScala.toMap

  /** Dead tables → reason: the start threw, or the query terminated with
    * an exception. A query that terminated cleanly (AvailableNow catch-up
    * finished) is NOT a failure. */
  def failures: Map[String, String] = {
    val startFailed = startErrors.asScala.toMap.map { case (k, e) =>
      k -> s"start failed: ${e.getMessage}"
    }
    val died = queriesMap.asScala.toMap.collect {
      case (k, q) if !q.isActive && q.exception.isDefined =>
        k -> s"query failed: ${q.exception.get.getMessage}"
    }
    startFailed ++ died
  }

  /** Relaunch every dead table from its checkpoint; returns the restarted
    * table keys (sorted). */
  def restartFailed(): Seq[String] = {
    val dead = failures.keys.toSeq.sorted.filter(starters.contains)
    dead.foreach(k => launch(k, starters(k)))
    dead
  }

  /** Block until every live query terminates (the `AvailableNow` catch-up
    * pattern). Per-table failures are recorded in [[failures]], not
    * thrown — one table's bad batch must not mask the others' progress. */
  def awaitAll(): this.type = {
    queriesMap.values.asScala.foreach { q =>
      try q.awaitTermination()
      catch { case _: StreamingQueryException => () }
    }
    this
  }

  /** Operational summary for one table (None until its first progress
    * event lands — listener delivery is asynchronous). */
  def metricsFor(table: String): Option[metrics.QuerySummary] =
    Option(queriesMap.get(table)).flatMap(q => metrics.summary(q.name))

  /** Stop every live query and detach the metrics listener. */
  def stopAll(): Unit = {
    queriesMap.values.asScala.foreach(q => if (q.isActive) q.stop())
    spark.streams.removeListener(metrics)
  }
}
