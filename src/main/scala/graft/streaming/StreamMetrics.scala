package graft.streaming

import java.util.UUID
import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** Operational counters for Structured Streaming queries, accumulated
  * from progress events: batches run, rows ingested, state-store rows,
  * last watermark — the numbers a pipeline operator alerts on (stalled
  * ingestion, unbounded state, watermark lag).
  *
  * Listener callbacks run on the driver's listener bus off the query
  * thread; state here is one small summary per query (ConcurrentHashMap),
  * so attaching it to an application with hundreds of queries costs
  * nothing measurable. Register via `spark.streams.addListener(m)`.
  */
final class StreamMetrics extends StreamingQueryListener {

  final case class QuerySummary(name: String, batches: Long, inputRows: Long,
                                stateRows: Long, lastWatermark: String)

  private val byQuery = new ConcurrentHashMap[UUID, QuerySummary]()

  override def onQueryStarted(event: QueryStartedEvent): Unit = ()

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val p = event.progress
    val prev = Option(byQuery.get(p.id))
    val stateRows =
      if (p.stateOperators == null) 0L else p.stateOperators.map(_.numRowsTotal).sum
    val wm = Option(p.eventTime).flatMap(m => Option(m.get("watermark"))).getOrElse("")
    byQuery.put(p.id, QuerySummary(
      Option(p.name).getOrElse(p.id.toString),
      prev.map(_.batches).getOrElse(0L) + 1L,
      prev.map(_.inputRows).getOrElse(0L) + p.numInputRows,
      stateRows, wm))
  }

  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = ()

  /** Summary for a query by its assigned name (None until its first
    * progress event lands on the bus — delivery is asynchronous). */
  def summary(queryName: String): Option[QuerySummary] = {
    val it = byQuery.values().iterator()
    var found: Option[QuerySummary] = None
    while (it.hasNext && found.isEmpty) {
      val s = it.next()
      if (s.name == queryName) found = Some(s)
    }
    found
  }

  def all(): Seq[QuerySummary] = {
    val b = Seq.newBuilder[QuerySummary]
    byQuery.values().forEach(s => b += s)
    b.result()
  }
}
