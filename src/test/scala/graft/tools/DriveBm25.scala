package graft.tools

import graft.ops.Retrieval
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch end-to-end driver (test scope): BM25 retrieval over REAL
  * testdata documents, expect-vs-got against an independent in-memory
  * recomputation of the BM25 formula on the driver for a sampled query. */
object DriveBm25 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val q = Seq((0L, "spark merge join"), (1L, "window sort batch stream"))
      .toDF("qid", "qtext")
    val got = Retrieval.bm25TopK(docs, q, "doc_id", "text", "qid", "qtext", k = 5)
      .orderBy("qid", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))

    // Independent driver-side recomputation (same rational-idf formula,
    // plain Scala collections — no Spark expressions shared with the op).
    val corpus = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.split("\\s+").toSeq).toMap
    val n = corpus.size.toDouble
    val dl = corpus.map { case (d, ts) => d -> ts.length.toLong }
    val avgdl = dl.values.sum.toDouble / n
    val dfm = corpus.values.flatMap(_.distinct).groupBy(identity).map { case (t, xs) => t -> xs.size }
    def score(terms: Seq[String], d: Long): Double =
      terms.distinct.sorted.map { t =>
        val tf = corpus(d).count(_ == t).toDouble
        if (tf == 0) 0.0
        else {
          val df = dfm(t).toDouble
          val idf = (n - df + 0.5) / (df + 0.5)
          idf * (tf * (1.2 + 1.0)) / (tf + 1.2 * (0.25 + 0.75 * dl(d) / avgdl))
        }
      }.sum
    val queries = Map(0L -> "spark merge join", 1L -> "window sort batch stream")
    var ok = true
    for ((qid, qtext) <- queries) {
      val terms = qtext.split("\\s+").toSeq
      val expect = corpus.keys.toSeq
        .map(d => (d, score(terms, d))).filter(_._2 > 0)
        .sortBy { case (d, s) => (-s, d) }.take(5)
      val mine = got.filter(_._1 == qid).map(t => (t._2, t._3)).toSeq
      val same = expect.map(_._1) == mine.map(_._1) &&
        expect.zip(mine).forall { case (e, m) => math.abs(e._2 - m._2) < 1e-9 }
      println(s"[drive-bm25] qid=$qid expect=${expect.take(3)} got=${mine.take(3)} match=$same")
      ok &= same
    }
    println(s"[drive-bm25] RESULT=${if (ok) "PASS" else "FAIL"}")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
