package graft.streaming

import graft.SparkSpec
import graft.io.SegmentedIndex
import graft.ops.Retrieval
import org.apache.spark.sql.DataFrame

/** Randomized soak of the maintained BM25 index: 10 CDC deliveries of
  * random upsert/delete mixes through [[RetrievalStream.cdcBatch]] with
  * a tight segment budget on the maintainEvery=2 cadence (multiple
  * compactions fire mid-soak) and a REPLAY of a random earlier delivery
  * after every even batch (exercising batch-id memory across the
  * ledger rebases). After every delivery the probe must hash-match a
  * from-scratch BM25 over the independently-maintained model corpus. */
class RetrievalSoakSpec extends SparkSpec {
  import spark.implicits._

  private val words = Vector("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta", "iota", "kappa", "lambda", "mu")

  private def key(df: DataFrame) = df.collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet

  test("10 random CDC deliveries + cadenced compactions + replays stay probe-exact") {
    val t = s"bm25_soak_${System.nanoTime()}"
    val rnd = new scala.util.Random(12)
    def text(): String = Seq.fill(4 + rnd.nextInt(6))(words(rnd.nextInt(words.size)))
      .mkString(" ")
    val q = Seq((0L, "alpha beta"), (1L, "gamma delta epsilon")).toDF("qid", "qtext")

    var model = (1L to 40L).map(i => i -> text()).toMap
    var delivered = List.empty[(DataFrame, Long)]
    def deliver(batch: DataFrame, id: Long): Unit =
      RetrievalStream.cdcBatch(batch, id, t, "doc_id", "text", "op",
        buckets = 2, maintainEvery = 2, maxSegments = 3L)

    deliver(model.toSeq.sortBy(_._1).map { case (i, s) => (i, s, "I") }
      .toDF("doc_id", "text", "op"), 0L)
    var gens = Set(SegmentedIndex.currentGen(spark, t))
    (1 to 10).foreach { b =>
      val live = model.keys.toSeq.sorted
      val upd = rnd.shuffle(live).take(5).map(i => (i, text(), "U"))
      val del = rnd.shuffle(live.diff(upd.map(_._1))).take(2)
        .map(i => (i, null.asInstanceOf[String], "D"))
      val ins = (1 to 2).map(j => (100L + b * 10 + j, text(), "I"))
      val ops = rnd.shuffle(upd ++ del ++ ins)
      val batch = ops.toDF("doc_id", "text", "op")
      deliver(batch, b.toLong)
      delivered ::= (batch, b.toLong)
      ops.foreach {
        case (i, _, "D") => model -= i
        case (i, s, _) => model += i -> s
      }
      gens += SegmentedIndex.currentGen(spark, t)
      if (b % 2 == 0) { // replay a random earlier delivery: must no-op
        val (rb, rid) = delivered(rnd.nextInt(delivered.size))
        deliver(rb, rid)
      }
      val want = key(Retrieval.bm25TopK(
        model.toSeq.sortBy(_._1).toDF("doc_id", "text"), q,
        "doc_id", "text", "qid", "qtext", k = 10))
      val got = key(Retrieval.bm25AgainstIndex(spark, t, q, "qid", "qtext", k = 10))
      assert(got == want, s"probe diverged from recompute after delivery $b")
    }
    assert(gens.size >= 3,
      s"fixture must compact at least twice mid-soak, saw generations $gens")
    spark.sql(s"SHOW TABLES LIKE '$t*'").collect()
      .foreach(r => spark.sql(s"DROP TABLE IF EXISTS ${r.getAs[String]("tableName")}"))
  }
}
