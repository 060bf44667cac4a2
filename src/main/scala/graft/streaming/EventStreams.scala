package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming analytics over the event stream: the streaming
  * twins of the batch `events_*` queries plus a stateful sessionizer.
  *
  * The reference has no event-time operators (SURVEY.md §2.11) — these
  * cover the streaming surface a training-data/event pipeline needs:
  * watermarked tumbling-window aggregation (late data dropped after the
  * watermark) and custom per-key session state via
  * `flatMapGroupsWithState` (the `KeyValueGroupedDataset` path).
  *
  * Scale: both operators shuffle once on their grouping key; state size
  * is O(open windows + open sessions), bounded by the watermark /
  * session-gap timeout, and lives in the state store (RocksDB on a real
  * cluster).
  */
object EventStreams {

  /** Input row: `ts_us` = event time in micros since epoch (the events
    * table's nano timestamps truncate to micros; see Tables.events). */
  final case class Event(event_id: Long, ts_us: Long, user_id: Long,
                         event_type: String, value: Double)

  /** A closed user session. */
  final case class Session(user_id: Long, start_us: Long, end_us: Long,
                           n_events: Int, total_value: Double)

  final case class OpenSession(start_us: Long, last_us: Long,
                                       n: Int, total: Double)

  /** Watermarked tumbling-window counts per event type (streaming twin of
    * the batch `events_window_hourly` query). Works on a batch DataFrame
    * too (watermark is a no-op in batch). */
  def windowedCounts(events: DataFrame, window: String = "1 hour",
                     watermark: String = "2 hours"): DataFrame =
    events
      .withColumn("ts_utc", timestamp_micros(col("ts_us")))
      .withWatermark("ts_utc", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts_utc"), window),
        col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Gap-based sessionization with explicit state: events more than
    * `gapUs` apart start a new session; closed sessions are emitted, the
    * open one is carried in state across micro-batches.
    *
    * The open session is NOT held forever: an event-time timeout is armed
    * at `last event + gap`, so once the watermark passes it the session is
    * emitted and its state evicted — a user going quiet still produces
    * their final session, and state stays bounded by the watermark (the
    * round-1 advisory finding). In a one-shot batch execution Spark never
    * fires group-state timeouts (there is no watermark progression), so
    * batch runs emit only gap-closed sessions — use the streaming path
    * when trailing sessions matter. */
  def sessionize(events: Dataset[Event], gapUs: Long,
                 watermarkDelay: String = "10 seconds"): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withColumn("ts_utc", timestamp_micros(col("ts_us")))
      .withWatermark("ts_utc", watermarkDelay)
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            // Watermark passed last_us + gap with no new events: the open
            // session can never be extended — emit and evict.
            val s = state.get
            state.remove()
            Iterator.single(Session(userId, s.start_us, s.last_us, s.n, s.total))
          } else {
            val sorted = batch.toSeq.sortBy(e => (e.ts_us, e.event_id))
            val closed = Seq.newBuilder[Session]
            var open = state.getOption
            // Stragglers older than the open session by more than the gap
            // belong to sessions that already closed. They still obey the
            // gap rule among THEMSELVES (two stragglers 0.5s apart are one
            // session), so accumulate them separately and flush at batch
            // end; they never enter persistent state (their deadline is
            // already past).
            var straggler: Option[OpenSession] = None
            def emitStraggler(): Unit = straggler.foreach { st =>
              closed += Session(userId, st.start_us, st.last_us, st.n, st.total)
              straggler = None
            }
            sorted.foreach { e =>
              open match {
                // A late-but-in-watermark event can arrive BEHIND the open
                // session (e.ts_us < last_us, even < start_us): extend with
                // min/max so boundaries never regress — OpenSession(.., e.ts_us)
                // here would move last_us backward, mis-splitting on the next
                // event and re-arming the timeout too early.
                case Some(s) if e.ts_us >= s.start_us - gapUs && e.ts_us - s.last_us <= gapUs =>
                  open = Some(OpenSession(math.min(s.start_us, e.ts_us),
                    math.max(s.last_us, e.ts_us), s.n + 1, s.total + e.value))
                case Some(s) if e.ts_us < s.start_us - gapUs =>
                  straggler match {
                    case Some(st) if e.ts_us - st.last_us <= gapUs =>
                      straggler = Some(OpenSession(st.start_us,
                        math.max(st.last_us, e.ts_us), st.n + 1, st.total + e.value))
                    case Some(_) =>
                      emitStraggler()
                      straggler = Some(OpenSession(e.ts_us, e.ts_us, 1, e.value))
                    case None =>
                      straggler = Some(OpenSession(e.ts_us, e.ts_us, 1, e.value))
                  }
                case Some(s) =>
                  closed += Session(userId, s.start_us, s.last_us, s.n, s.total)
                  open = Some(OpenSession(e.ts_us, e.ts_us, 1, e.value))
                case None =>
                  open = Some(OpenSession(e.ts_us, e.ts_us, 1, e.value))
              }
            }
            emitStraggler()
            open.foreach { s =>
              state.update(s)
              // Close when event time passes the gap; clamp above the
              // current watermark (required by the GroupState contract for
              // stragglers whose gap deadline already passed).
              val target = s.last_us / 1000 + gapUs / 1000 + 1
              state.setTimeoutTimestamp(math.max(target, state.getCurrentWatermarkMs + 1))
            }
            closed.result().iterator
          }
      }
  }

  /** Streaming dedup by event id: drops re-deliveries (at-least-once
    * sources re-emit on retry) arriving within the watermark horizon.
    * `dropDuplicatesWithinWatermark` keeps one state entry per key and —
    * unlike plain `dropDuplicates` in streaming — evicts each entry once
    * the watermark passes its event time, so state is O(keys per horizon),
    * not O(all keys ever): the only shape that survives an unbounded
    * stream. Batch twin: `dropDuplicates("event_id")`. */
  def dedupEvents(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withColumn("ts_utc", timestamp_micros(col("ts_us")))
      .withWatermark("ts_utc", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream inner join with watermark-bounded state: each purchase
    * joined to the clicks by the same user in the preceding
    * `attributionWindow`. The time-range predicate plus watermarks on BOTH
    * sides is what lets Structured Streaming evict join state (a click
    * older than watermark + window can never match a future purchase);
    * without the range condition the state would grow forever. Shuffles
    * both sides once on `user_id`. Runs unchanged in batch (watermarks
    * no-op), which is how the oracle checks it. */
  def attributedPurchases(events: DataFrame, attributionWindow: String = "30 minutes",
                          watermark: String = "1 hour"): DataFrame = {
    val base = events.withColumn("ts_utc", timestamp_micros(col("ts_us")))
    val clicks = base.where(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts_utc").as("click_ts"))
      .withWatermark("click_ts", watermark)
    val purchases = base.where(col("event_type") === "purchase")
      .select(col("user_id").as("user_id"), col("event_id").as("purchase_id"),
        col("value").as("purchase_value"), col("ts_utc").as("purchase_ts"))
      .withWatermark("purchase_ts", watermark)
    purchases.join(clicks,
      col("user_id") === col("c_user") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr(s"INTERVAL $attributionWindow"))
      .select(col("user_id"), col("purchase_id"), col("click_id"),
        col("purchase_value"))
  }

  /** Stream-static dimension enrichment: join the event stream against a
    * BATCH dimension table (user → segment, product → category, …). The
    * static side is planned per micro-batch as an ordinary broadcast hash
    * join — no streaming state at all (nothing to watermark or evict), and
    * a dimension refresh is picked up on the next batch when the static
    * side is re-read (e.g. a parquet dir path). The canonical lookup shape
    * at any scale: state cost zero, network cost one broadcast per batch. */
  def enrichWithDim(events: DataFrame, dim: DataFrame, key: String,
                    joinType: String = "left"): DataFrame =
    events.join(broadcast(dim), Seq(key), joinType)

  /** A user's funnel progress so far: earliest completion micros per
    * step, -1 while the step is unreached. */
  final case class FunnelState(times: Seq[Long])

  /** Progress row: emitted when a user's funnel advances, and once more
    * with `closed = true` when the funnel terminates (all steps completed,
    * or the conversion window expired at the watermark). */
  final case class FunnelProgress(user_id: Long, steps_completed: Int,
                                  times: Seq[Long], closed: Boolean)

  /** Streaming twin of [[graft.ops.Funnel]]: per-user funnel state
    * maintained across micro-batches with `flatMapGroupsWithState`; a row
    * is emitted only on a trigger where the user ADVANCED a step, plus one
    * terminal `closed = true` row. State is O(steps) per user — never an
    * event buffer — and it is BOUNDED IN TIME too: funnels conventionally
    * count conversions "within N days of entry", so an event-time timeout
    * is armed at `entry (first-step time) + conversionWindowUs`. Once the
    * watermark passes it, the user's final progress is emitted and the
    * state evicted — an unbounded stream no longer accumulates state for
    * every user ever seen. Step CREDITING enforces the same window (an
    * event past `entry + conversionWindowUs` never advances the funnel,
    * window-inclusive), so the result is a function of the event data
    * alone — not of micro-batch slicing or watermark lag. Users whose events never complete the entry
    * step keep ZERO state. Events behind the watermark are dropped by the
    * operator, so an evicted funnel cannot be resurrected by stragglers; a
    * fresh in-watermark entry event starts a NEW funnel journey.
    *
    * Ordering contract: events are processed in event-time order WITHIN
    * each micro-batch (the group iterator is sorted here); an event
    * arriving in a later trigger than one with a larger timestamp can
    * only advance steps conservatively (it cannot retroactively enable a
    * step-completion that needed it earlier). With triggers in event-time
    * order the final state equals the batch funnel exactly (pinned in
    * EventStreamsSpec). In one-shot batch execution timeouts never fire
    * (same caveat as [[sessionize]]): only advancement/completion rows
    * are emitted. */
  def funnelProgress(events: Dataset[Event], steps: Seq[String],
                     conversionWindowUs: Long = 7L * 24 * 3600 * 1000000L,
                     watermarkDelay: String = "10 seconds"): Dataset[FunnelProgress] = {
    import events.sparkSession.implicits._
    val stepIdx = steps.zipWithIndex.toMap
    events
      .withColumn("ts_utc", timestamp_micros(col("ts_us")))
      .withWatermark("ts_utc", watermarkDelay)
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelProgress](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[Event], state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            // Conversion window expired: emit final progress, evict.
            val t = state.get.times
            state.remove()
            Iterator.single(FunnelProgress(user, t.takeWhile(_ >= 0).length, t,
              closed = true))
          } else {
            val t = state.getOption.map(_.times.toArray)
              .getOrElse(Array.fill(steps.size)(-1L))
            var advanced = false
            it.toSeq.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
              stepIdx.get(e.event_type).foreach { i =>
                val prevOk = i == 0 || (t(i - 1) >= 0 && e.ts_us > t(i - 1))
                // The conversion window is part of the funnel DEFINITION,
                // not just a state-eviction deadline: a step event past
                // `entry + window` must never be credited, even when it is
                // processed before the watermark passes the deadline —
                // otherwise the result depends on micro-batch slicing /
                // watermark lag (window-inclusive: ts == deadline counts).
                val inWindow = i == 0 || e.ts_us <= t(0) + conversionWindowUs
                if (prevOk && inWindow && (t(i) < 0 || e.ts_us < t(i))) {
                  t(i) = e.ts_us; advanced = true
                }
              }
            }
            // A late-but-in-watermark ENTRY event can move t(0) EARLIER,
            // tightening the window; steps credited under the old entry
            // may now lie past the new deadline and must be UNcredited
            // (clearing step i also breaks the chain for i+1..) — else the
            // final state depends on which trigger the late entry landed
            // in. Re-searching earlier qualifying events is impossible
            // (state holds only earliest times) and stays within the
            // documented conservative cross-trigger contract.
            if (t(0) >= 0) {
              var i = 1
              var broken = false
              while (i < t.length) {
                if (broken || (t(i) >= 0 && t(i) > t(0) + conversionWindowUs)) {
                  if (t(i) >= 0) { t(i) = -1L; advanced = true }
                  broken = true
                }
                i += 1
              }
            }
            val completed = t.takeWhile(_ >= 0).length
            if (completed == steps.size) {
              // Fully converted — terminal row now, nothing left to expire.
              if (state.exists) state.remove()
              Iterator.single(FunnelProgress(user, completed, t.toSeq, closed = true))
            } else if (t(0) < 0) {
              // Never entered the funnel (out-of-order later steps can't be
              // credited): keep zero state, emit nothing.
              Iterator.empty
            } else {
              state.update(FunnelState(t.toSeq))
              // Deadline = funnel entry + conversion window; clamped above
              // the current watermark per the GroupState contract.
              val deadlineMs = t(0) / 1000 + conversionWindowUs / 1000
              state.setTimeoutTimestamp(
                math.max(deadlineMs, state.getCurrentWatermarkMs + 1))
              if (advanced)
                Iterator.single(FunnelProgress(user, completed, t.toSeq, closed = false))
              else Iterator.empty
            }
          }
      }
  }

  /** Epoch-micros expression for a raw events frame's `ts` column. The
    * generated table has shipped in two layouts — nanos-since-epoch LONG
    * (legacy-flag read of TIMESTAMP(NANOS)) and micros TIMESTAMP (read as
    * TIMESTAMP_NTZ) — and every consumer dispatches HERE so a third
    * layout (or a cast fix) is a one-place change. The timestamp cast is
    * epoch-exact under the suite's fixed UTC session timezone. */
  def tsMicros(raw: DataFrame): Column =
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts div 1000")
      case _ => unix_micros(col("ts").cast("timestamp"))
    }

  /** Adapt the raw events table to the typed stream (`ts` normalized to
    * epoch micros via [[tsMicros]], either shipped layout). */
  def typedEvents(raw: DataFrame): Dataset[Event] = {
    import raw.sparkSession.implicits._
    raw.select(col("event_id"), tsMicros(raw).as("ts_us"),
      col("user_id"), col("event_type"), col("value")).as[Event]
  }
}
