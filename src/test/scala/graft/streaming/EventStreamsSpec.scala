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
    val typedStream = stream2.select(col("event_id"), expr("ts div 1000").as("ts_us"),
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
    val input = MemoryStream[Event]
    val sessions = EventStreams.sessionize(input.toDS(), gapUs = 1000000L) // 1s gap
    val q = sessions.writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()

    // batch 1: user 1 has two events 0.5s apart (one session so far, still open)
    input.addData(Event(1, 0L, 1L, "a", 1.0), Event(2, 500000L, 1L, "a", 2.0))
    q.processAllAvailable()
    assert(spark.table("sess_out").count() == 0) // nothing closed yet

    // batch 2: user 1 event 10s later → closes the first session (proves
    // state survived the micro-batch boundary)
    input.addData(Event(3, 10500000L, 1L, "a", 4.0))
    q.processAllAvailable()
    val closed = spark.table("sess_out").as[Session].collect()
    assert(closed.length == 1)
    assert(closed(0) == Session(1L, 0L, 500000L, 2, 3.0))

    // batch 3: another user interleaved; gap closes their session too
    input.addData(Event(4, 0L, 2L, "b", 5.0), Event(5, 20000000L, 2L, "b", 6.0))
    q.processAllAvailable()
    val all = spark.table("sess_out").as[Session].collect().sortBy(_.user_id)
    assert(all.length == 2 && all(1) == Session(2L, 0L, 0L, 1, 5.0))
    q.stop()
  }
}
