package graft.streaming

import graft.SparkSpec
import graft.streaming.EventStreams.{Event, Session}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

class EventStreamsSpec extends SparkSpec {
  import spark.implicits._

  test("windowed counts: streaming file source equals batch computation") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val dir = "/root/testdata/sf0.001"
    val batchRaw = spark.read.parquet(s"$dir/events.parquet")
    val schema = batchRaw.schema

    val stream2 = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
    // shared layout dispatch — nanos LONG or micros TIMESTAMP (schemas match)
    val typedStream = stream2.select(col("event_id"),
      EventStreams.tsMicros(batchRaw).as("ts_us"),
      col("user_id"), col("event_type"), col("value"))
    val q = EventStreams.windowedCounts(typedStream)
      .writeStream.format("memory").queryName("win_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // append mode only emits finalized windows; re-run complete-mode batch twin:
    val batchTyped = EventStreams.typedEvents(batchRaw)
    val expect = EventStreams.windowedCounts(batchTyped.toDF())
      .orderBy("window_start", "event_type").collect()
    // batch watermark = no-op → all windows; streaming append emits only
    // windows older than watermark. Check streamed ⊆ batch and nonempty.
    val got = spark.table("win_out").orderBy("window_start", "event_type").collect()
    assert(got.nonEmpty, "streaming emitted no finalized windows")
    val expectSet = expect.map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    got.foreach(r => assert(expectSet.contains((r.getTimestamp(0), r.getString(1), r.getLong(2)))))
  }

  test("sessionize: gaps close sessions; state carries across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val B = 3600000000L // base event time (1h) — keeps fixtures above the initial watermark
    val input = MemoryStream[Event]
    val sessions = EventStreams.sessionize(input.toDS(), gapUs = 1000000L) // 1s gap, 10s watermark
    val q = sessions.writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()

    // batch 1: user 1 has two events 0.5s apart (one session so far, still open)
    input.addData(Event(1, B, 1L, "a", 1.0), Event(2, B + 500000L, 1L, "a", 2.0))
    q.processAllAvailable()
    assert(spark.table("sess_out").count() == 0) // nothing closed yet

    // batch 2: user 1 event 10s later → closes the first session (proves
    // state survived the micro-batch boundary)
    input.addData(Event(3, B + 10500000L, 1L, "a", 4.0))
    q.processAllAvailable()
    val closed = spark.table("sess_out").as[Session].collect()
    assert(closed.length == 1)
    assert(closed(0) == Session(1L, B, B + 500000L, 2, 3.0))

    // batch 3: another user interleaved; the gap closes their first
    // session, and the watermark (now 15s past user 1's gap deadline)
    // fires the event-time timeout that emits user 1's trailing session.
    input.addData(Event(4, B + 15000000L, 2L, "b", 5.0), Event(5, B + 35000000L, 2L, "b", 6.0))
    q.processAllAvailable()
    val all = spark.table("sess_out").as[Session].collect().sortBy(_.user_id)
    assert(all.contains(Session(2L, B + 15000000L, B + 15000000L, 1, 5.0)))
    assert(all.contains(Session(1L, B + 10500000L, B + 10500000L, 1, 4.0)),
      "user 1's trailing session must be emitted once the watermark passes its gap")

    // batch 4: a third user far in the future pushes the watermark past
    // user 2's open session too → its trailing session emits (state evicted).
    input.addData(Event(6, B + 60000000L, 3L, "c", 1.0))
    q.processAllAvailable()
    val withTrailing = spark.table("sess_out").as[Session].collect()
    assert(withTrailing.contains(Session(2L, B + 35000000L, B + 35000000L, 1, 6.0)),
      "user 2's trailing session must be emitted by timeout")
    q.stop()
  }

  test("sessionize: a late-but-in-watermark event cannot regress session boundaries") {
    implicit val sqlCtx = spark.sqlContext
    val B = 3600000000L
    val input = MemoryStream[Event]
    val sessions = EventStreams.sessionize(input.toDS(), gapUs = 1000000L) // 1s gap, 10s watermark
    val q = sessions.writeStream.format("memory").queryName("sess_late_out")
      .outputMode("append").start()

    // batch 1: one event at B+1s → open session (1s, 1s)
    input.addData(Event(1, B + 1000000L, 1L, "a", 1.0))
    q.processAllAvailable()
    // batch 2: a LATE event at B+0.4s (inside the watermark, within gap of
    // the open session) followed by B+1.9s. Moving last_us backward to 0.4s
    // would make 1.9s look > gap away and mis-split with end < start; the
    // min/max extension keeps one session.
    input.addData(Event(2, B + 400000L, 1L, "a", 1.0), Event(3, B + 1900000L, 1L, "a", 1.0))
    q.processAllAvailable()
    assert(spark.table("sess_late_out").count() == 0,
      "late event must extend the open session, not split it")
    // two more batches: first advances the watermark far past the gap
    // deadline, second fires the armed timeout → the merged session emits
    input.addData(Event(4, B + 60000000L, 2L, "b", 1.0))
    q.processAllAvailable()
    input.addData(Event(5, B + 61000000L, 2L, "b", 1.0))
    q.processAllAvailable()
    val out = spark.table("sess_late_out").as[Session].collect().filter(_.user_id == 1L)
    assert(out.toSeq == Seq(Session(1L, B + 400000L, B + 1900000L, 3, 3.0)))
    q.stop()
  }

  test("sessionize: stragglers within a gap of each other form one session") {
    implicit val sqlCtx = spark.sqlContext
    val B = 3600000000L
    val input = MemoryStream[Event]
    val sessions = EventStreams.sessionize(input.toDS(), gapUs = 1000000L) // 1s gap, 10s watermark
    val q = sessions.writeStream.format("memory").queryName("sess_strag_out")
      .outputMode("append").start()
    // open session far ahead at B+8s
    input.addData(Event(1, B + 8000000L, 1L, "a", 1.0))
    q.processAllAvailable()
    // two late events 0.5s apart, both >1 gap older than the open session:
    // they belong together — ONE straggler session, not two singletons
    input.addData(Event(2, B + 1000000L, 1L, "a", 2.0), Event(3, B + 1500000L, 1L, "a", 3.0))
    q.processAllAvailable()
    val strag = spark.table("sess_strag_out").as[Session].collect()
    assert(strag.toSeq == Seq(Session(1L, B + 1000000L, B + 1500000L, 2, 5.0)),
      s"stragglers mis-grouped: ${strag.toSeq}")
    q.stop()
  }

  test("stream-static enrichment joins each micro-batch against the dimension") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "segment")
    val q = EventStreams.enrichWithDim(input.toDF(), dim, "user_id")
      .writeStream.format("memory").queryName("enrich_out")
      .outputMode("append").start()
    input.addData(Event(1, 1000L, 1L, "a", 1.0), Event(2, 2000L, 3L, "b", 2.0))
    q.processAllAvailable()
    input.addData(Event(3, 3000L, 2L, "c", 3.0))
    q.processAllAvailable()
    val got = spark.table("enrich_out")
      .select("event_id", "segment").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getString(1))).toMap
    // left join: unmatched user keeps the event with a null segment
    assert(got == Map(1L -> "gold", 2L -> null, 3L -> "basic"))
    q.stop()
  }

  test("StreamMetrics accumulates batches, rows and state size from progress events") {
    implicit val sqlCtx = spark.sqlContext
    val metrics = new StreamMetrics
    spark.streams.addListener(metrics)
    try {
      val B = 3600000000L
      val input = MemoryStream[Event]
      val q = EventStreams.windowedCounts(input.toDS().toDF())
        .writeStream.format("memory").queryName("metrics_win")
        .outputMode("append").start()
      input.addData(Event(1, B, 1L, "a", 1.0), Event(2, B + 1000L, 1L, "b", 2.0))
      q.processAllAvailable()
      input.addData(Event(3, B + 2000L, 2L, "a", 3.0))
      q.processAllAvailable()
      q.stop()
      // progress events are delivered asynchronously on the listener bus
      val deadline = System.nanoTime() + 10L * 1000000000L
      var s = metrics.summary("metrics_win")
      while (System.nanoTime() < deadline &&
        !s.exists(x => x.inputRows == 3 && x.batches >= 2)) {
        Thread.sleep(50); s = metrics.summary("metrics_win")
      }
      assert(s.exists(_.inputRows == 3), s"expected 3 ingested rows, got $s")
      assert(s.exists(_.batches >= 2), s"expected >= 2 batches, got $s")
      assert(s.exists(_.stateRows > 0), s"windowed agg must report state rows, got $s")
    } finally spark.streams.removeListener(metrics)
  }

  test("attributedPurchases: stream-stream join matches across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val B = 3600000000L
    val M = 60000000L // one minute in micros
    val input = MemoryStream[Event]
    val joined = EventStreams.attributedPurchases(input.toDS().toDF())
    val q = joined.writeStream.format("memory").queryName("attr_out")
      .outputMode("append").start()

    // batch 1: click only — no purchase yet, no output
    input.addData(Event(1, B, 1L, "click", 0.0))
    q.processAllAvailable()
    assert(spark.table("attr_out").count() == 0)

    // batch 2: purchase 10 min after the click (state crossed the batch
    // boundary), plus a purchase by another user with no click → no match
    input.addData(Event(2, B + 10 * M, 1L, "purchase", 9.99),
      Event(3, B + 10 * M, 2L, "purchase", 5.0))
    q.processAllAvailable()
    val got = spark.table("attr_out")
      .select("user_id", "purchase_id", "click_id").as[(Long, Long, Long)].collect()
    assert(got.toSeq == Seq((1L, 2L, 1L)))

    // batch 3: purchase 45 min after the click — outside the 30-min window
    input.addData(Event(4, B + 45 * M, 1L, "purchase", 1.0))
    q.processAllAvailable()
    assert(spark.table("attr_out").count() == 1)
    q.stop()

    // batch twin over the same events gives the same pairs
    val batch = EventStreams.attributedPurchases(Seq(
      Event(1, B, 1L, "click", 0.0), Event(2, B + 10 * M, 1L, "purchase", 9.99),
      Event(3, B + 10 * M, 2L, "purchase", 5.0), Event(4, B + 45 * M, 1L, "purchase", 1.0))
      .toDF()).select("purchase_id", "click_id").as[(Long, Long)].collect()
    assert(batch.toSeq == Seq((2L, 1L)))
  }

  test("dedupEvents: re-deliveries within the watermark are dropped across batches") {
    implicit val sqlCtx = spark.sqlContext
    val B = 3600000000L
    val input = MemoryStream[Event]
    val deduped = EventStreams.dedupEvents(input.toDS().toDF(), watermark = "1 hour")
    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()

    // batch 1: id 2 delivered twice in one batch → emitted once
    input.addData(Event(1, B, 1L, "a", 1.0), Event(2, B + 1000L, 1L, "a", 2.0),
      Event(2, B + 1000L, 1L, "a", 2.0))
    q.processAllAvailable()
    assert(spark.table("dedup_out").select("event_id").as[Long].collect().sorted
      .toSeq == Seq(1L, 2L))

    // batch 2: id 2 re-delivered (state held across the boundary) + new id 3
    input.addData(Event(2, B + 2000L, 1L, "a", 2.0), Event(3, B + 3000L, 2L, "b", 3.0))
    q.processAllAvailable()
    assert(spark.table("dedup_out").select("event_id").as[Long].collect().sorted
      .toSeq == Seq(1L, 2L, 3L))

    // batch twin gives the same key set
    val batchIds = Seq(Event(1, B, 1L, "a", 1.0), Event(2, B + 1000L, 1L, "a", 2.0),
      Event(2, B + 2000L, 1L, "a", 2.0), Event(3, B + 3000L, 2L, "b", 3.0))
      .toDF().dropDuplicates("event_id").select("event_id").as[Long].collect().sorted
    assert(batchIds.toSeq == Seq(1L, 2L, 3L))
    q.stop()
  }

  test("streaming funnel: state advances across micro-batches, matches batch funnel") {
    implicit val sqlCtx = spark.sqlContext
    import EventStreams.{Event, FunnelProgress}
    val input = MemoryStream[Event]
    val prog = EventStreams.funnelProgress(input.toDS(), Seq("view", "click", "purchase"))
    val q = prog.writeStream.format("memory").queryName("funnel_out")
      .outputMode("update").start()

    // batch 1: user 1 views; user 2 clicks without viewing (no progress)
    input.addData(Event(1, 100L, 1L, "view", 0.0), Event(2, 100L, 2L, "click", 0.0))
    q.processAllAvailable()
    // batch 2: user 1 clicks (state carried) then purchases IN ORDER;
    // user 2 finally views — click must NOT be retro-credited
    input.addData(Event(3, 200L, 1L, "click", 0.0), Event(4, 300L, 1L, "purchase", 0.0),
      Event(5, 200L, 2L, "view", 0.0))
    q.processAllAvailable()
    q.stop()

    import org.apache.spark.sql.functions.col
    val last = spark.table("funnel_out").groupBy("user_id")
      .agg(org.apache.spark.sql.functions.max("steps_completed").as("sc"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(last(1L) == 3)
    assert(last(2L) == 1)

    // equivalence with the batch operator over the same (in-order) events
    val batch = Seq((1L, 100L, "view"), (2L, 100L, "click"),
      (1L, 200L, "click"), (1L, 300L, "purchase"), (2L, 200L, "view"))
      .toDF("user_id", "ts", "event_type")
    val b = graft.ops.Funnel.funnel(batch, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"))
      .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("steps_completed")).toMap
    assert(b.view.mapValues(_.toInt).toMap == last)
  }

  test("streaming funnel: emits only on advancement; no-progress users keep no state") {
    implicit val sqlCtx = spark.sqlContext
    import EventStreams.Event
    val B = 3600000000L
    val input = MemoryStream[Event]
    val prog = EventStreams.funnelProgress(input.toDS(), Seq("view", "click"))
    val q = prog.writeStream.format("memory").queryName("funnel_adv_out")
      .outputMode("update").start()
    // user 1 views (advances); user 2 clicks without viewing (no progress row)
    input.addData(Event(1, B, 1L, "view", 0.0), Event(2, B, 2L, "click", 0.0))
    q.processAllAvailable()
    // user 1 sends an untracked event type: state exists but nothing advanced
    input.addData(Event(3, B + 1000L, 1L, "scroll", 0.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("funnel_adv_out")
      .select("user_id", "steps_completed", "closed").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2)))
    assert(rows.toSeq == Seq((1L, 1, false)),
      s"exactly one advancement row expected, got ${rows.toSeq}")
  }

  test("streaming funnel: past-window events never credit, under either batch slicing") {
    implicit val sqlCtx = spark.sqlContext
    import EventStreams.Event
    val B = 3600000000L
    val S = 1000000L // one second in micros
    def run(name: String)(
        feed: (MemoryStream[Event], org.apache.spark.sql.streaming.StreamingQuery) => Unit)
        : Set[(Int, Boolean)] = {
      val input = MemoryStream[Event]
      val prog = EventStreams.funnelProgress(input.toDS(), Seq("view", "click"),
        conversionWindowUs = 5L * S)
      val q = prog.writeStream.format("memory").queryName(name)
        .outputMode("update").start()
      feed(input, q)
      q.stop()
      spark.table(name).where(col("user_id") === 1L)
        .select("steps_completed", "closed").collect()
        .map(r => (r.getInt(0), r.getBoolean(1))).toSet
    }
    // The click at B+6s is INSIDE the watermark but past the 5 s
    // conversion window. Before the window gated crediting, it converted
    // whenever it was processed before the watermark passed the deadline —
    // i.e. the answer depended on trigger slicing. Both slicings must now
    // agree: entered (1 step), never converted.
    val oneBatch = run("funnel_win_a") { (in, q) =>
      in.addData(Event(1, B, 1L, "view", 0.0), Event(2, B + 6 * S, 1L, "click", 0.0))
      q.processAllAvailable()
    }
    val twoBatches = run("funnel_win_b") { (in, q) =>
      in.addData(Event(1, B, 1L, "view", 0.0)); q.processAllAvailable()
      in.addData(Event(2, B + 6 * S, 1L, "click", 0.0)); q.processAllAvailable()
    }
    assert(oneBatch == Set((1, false)), s"past-window click must not credit: $oneBatch")
    assert(twoBatches == oneBatch, "result must be independent of micro-batch slicing")
    // the window is inclusive: a click exactly at entry + window converts
    val boundary = run("funnel_win_c") { (in, q) =>
      in.addData(Event(1, B, 1L, "view", 0.0), Event(2, B + 5 * S, 1L, "click", 0.0))
      q.processAllAvailable()
    }
    assert(boundary == Set((2, true)), s"window-inclusive boundary must convert: $boundary")
    // the batch twin with the same window agrees on both fixtures
    def batchSteps(clickAt: Long) = graft.ops.Funnel.funnel(
      Seq((1L, B, "view"), (1L, clickAt, "click")).toDF("user_id", "ts_us", "event_type"),
      "user_id", "ts_us", "event_type", Seq("view", "click"),
      conversionWindow = Some(5 * S))
      .where(col("user_id") === 1L).head().getAs[Long]("steps_completed")
    assert(batchSteps(B + 6 * S) == 1L, "batch twin must not credit past the window")
    assert(batchSteps(B + 5 * S) == 2L, "batch twin window is inclusive too")
  }

  test("streaming funnel: a late earlier entry tightens the window and uncredits steps") {
    implicit val sqlCtx = spark.sqlContext
    import EventStreams.Event
    val B = 3600000000L
    val S = 1000000L
    val input = MemoryStream[Event]
    // 3 steps so a 2-step credit doesn't terminate the state
    val prog = EventStreams.funnelProgress(input.toDS(),
      Seq("view", "click", "purchase"), conversionWindowUs = 5L * S)
    val q = prog.writeStream.format("memory").queryName("funnel_late_entry")
      .outputMode("update").start()
    // trigger 1: entry at B+2s, click at B+6s — within that window
    input.addData(Event(1, B + 2 * S, 1L, "view", 0.0),
      Event(2, B + 6 * S, 1L, "click", 0.0))
    q.processAllAvailable()
    // trigger 2: a LATE entry at B (inside the watermark) moves entry
    // earlier; the credited click at B+6s is now past B+5s and must be
    // uncredited — the emitted progress regresses to 1 step
    input.addData(Event(3, B, 1L, "view", 0.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("funnel_late_entry")
      .select("steps_completed", "times").collect()
      .map(r => (r.getInt(0), r.getSeq[Long](1)))
    assert(rows.map(_._1).toSeq == Seq(2, 1), s"expected 2-step then 1-step rows: ${rows.toSeq}")
    val last = rows.last._2
    assert(last == Seq(B, -1L, -1L), s"state must be entry-only after tightening: $last")
    // the batch twin on the SAME events agrees with the corrected state
    val batch = graft.ops.Funnel.funnel(
      Seq((1L, B + 2 * S, "view"), (1L, B + 6 * S, "click"), (1L, B, "view"))
        .toDF("user_id", "ts_us", "event_type"),
      "user_id", "ts_us", "event_type", Seq("view", "click", "purchase"),
      conversionWindow = Some(5 * S))
    assert(batch.head().getAs[Long]("steps_completed") == 1L)
  }

  test("streaming funnel: conversion window evicts quiet state; stragglers can't resurrect it") {
    implicit val sqlCtx = spark.sqlContext
    import EventStreams.Event
    val B = 3600000000L
    val S = 1000000L // one second in micros
    val input = MemoryStream[Event]
    // 5 s conversion window, 10 s watermark delay
    val prog = EventStreams.funnelProgress(input.toDS(), Seq("view", "click"),
      conversionWindowUs = 5L * S)
    val q = prog.writeStream.format("memory").queryName("funnel_evict_out")
      .outputMode("update").start()

    // batch 1: user 1 enters the funnel at B
    input.addData(Event(1, B, 1L, "view", 0.0))
    q.processAllAvailable()
    // batch 2 advances max event time to B+20s (watermark lags one batch);
    // batch 3 applies watermark B+10s > deadline B+5s → timeout fires
    input.addData(Event(2, B + 20 * S, 2L, "view", 0.0))
    q.processAllAvailable()
    input.addData(Event(3, B + 21 * S, 2L, "view", 0.0))
    q.processAllAvailable()
    val afterEvict = spark.table("funnel_evict_out")
      .where(col("user_id") === 1L)
      .select("steps_completed", "closed").collect()
      .map(r => (r.getInt(0), r.getBoolean(1))).toSet
    assert(afterEvict == Set((1, false), (1, true)),
      s"expected advancement + expiry rows for user 1, got $afterEvict")

    // a straggler click behind the watermark must NOT resurrect the funnel
    input.addData(Event(4, B + 1 * S, 1L, "click", 0.0))
    q.processAllAvailable()
    val afterLate = spark.table("funnel_evict_out")
      .where(col("user_id") === 1L).count()
    assert(afterLate == 2, "late event must be dropped, not resurrect evicted state")
    q.stop()
  }
}
