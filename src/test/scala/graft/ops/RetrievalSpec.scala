package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "a b a"),   // both query terms, a twice
    (2L, "a c"),     // one query term + a rare term
    (3L, "b b b"),   // one query term, repeated
    (4L, "c c d")    // no query term — must not appear
  ).toDF("doc_id", "text")

  private def run(qtext: String, k: Int = 10) =
    Retrieval.bm25TopK(docs, Seq((0L, qtext)).toDF("qid", "qtext"),
      "doc_id", "text", "qid", "qtext", k)
      .orderBy("rank")
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getLong(3)))

  test("doc matching both terms outranks single-term matches; non-matches absent") {
    val got = run("a b")
    assert(got.map(_._1).head == 1L)          // matches a (twice) and b
    assert(!got.map(_._1).contains(4L))       // no query term → no row
    assert(got.map(_._3).toSeq == (1L to got.length).toSeq) // dense ranks from 1
  }

  test("rarer term scores higher at equal tf and dl") {
    // d2 = "a c": df(a)=2, df(c)=2 in this fixture? No — c appears in d2, d4:
    // df(c)=2, df(a)=2, so make the comparison inside one doc via two
    // single-term queries over d2 (same tf=1, same dl): idf must decide.
    val a = run("a").find(_._1 == 2L).get._2
    val d = run("d").head
    assert(d._1 == 4L)
    // df(d)=1 < df(a)=2 → rational idf strictly larger for d.
    assert(d._2 > a)
  }

  test("k caps the list; repeated runs are bit-identical") {
    val one = run("a b", k = 1)
    assert(one.length == 1 && one.head._3 == 1L)
    assert(run("a b").toSeq == run("a b").toSeq)
  }

  test("duplicate query terms count once") {
    assert(run("b b b").toSeq == run("b").toSeq)
  }

  test("logIdf: single-term rankings identical to rational idf; scores are ln of ratio") {
    val rational = run("a")
    val logged = Retrieval.bm25TopK(docs, Seq((0L, "a")).toDF("qid", "qtext"),
      "doc_id", "text", "qid", "qtext", 10, logIdf = true)
      .orderBy("rank")
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(rational.map(x => (x._1, x._3)).toSeq == logged.map(x => (x._1, x._3)).toSeq)
    assert(logged.zip(rational)
      .forall { case (l, r) => l._2 < r._2 }) // ln(x) < x for the x ≥ 1 here
  }

  test("logIdf divergence (documented): one rare term vs three mid terms flips the order") {
    // 20 docs, all dl = 3: docA carries the df=1 term 'ra'; docB carries
    // three df=5 terms m1 m2 m3 (each also in 4 other docs). Rational
    // idf: A = 19.5/1.5 = 13 > B = 3·(15.5/5.5) ≈ 8.45. Log idf:
    // A = ln 13 ≈ 2.56 < B = 3·ln(15.5/5.5) ≈ 3.11 — the steeper
    // rare-term weighting of the rational variant, pinned here.
    val fix = (Seq((1L, "ra x0 y0"), (2L, "m1 m2 m3")) ++
      (0 until 4).flatMap(i => Seq(
        (10L + i, s"m1 f$i g$i"), (20L + i, s"m2 f$i h$i"), (30L + i, s"m3 f$i j$i"))) ++
      (0 until 6).map(i => (40L + i, s"z$i w$i v$i"))).toDF("doc_id", "text")
    assert(fix.count() == 20)
    val q = Seq((0L, "ra m1 m2 m3")).toDF("qid", "qtext")
    def top(logIdf: Boolean): Long =
      Retrieval.bm25TopK(fix, q, "doc_id", "text", "qid", "qtext", 1,
        logIdf = logIdf).head().getLong(1)
    assert(top(logIdf = false) == 1L)
    assert(top(logIdf = true) == 2L)
  }

  test("against-index path honors logIdf (ranking equal to log recompute)") {
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    val table = "bm25_logidf_spec"
    Retrieval.writeBm25Index(docs, "doc_id", "text", table, buckets = 2)
    val viaIndex = Retrieval.bm25AgainstIndex(spark, table,
      Seq((0L, "a b")).toDF("qid", "qtext"), "qid", "qtext", 10, logIdf = true)
    val recompute = Retrieval.bm25TopK(docs, Seq((0L, "a b")).toDF("qid", "qtext"),
      "doc_id", "text", "qid", "qtext", 10, logIdf = true)
    assert(key(viaIndex) == key(recompute))
    Seq(table, table + "_docs", table + "_segments", table + "_tombstones")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("against-index path: bit-identical to recompute; index side plans no term exchange") {
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val q = Seq((0L, "spark merge join"), (1L, "window sort batch stream"))
      .toDF("qid", "qtext")
    val table = "bm25_idx_spec"
    Retrieval.writeBm25Index(corpus, "doc_id", "text", table, buckets = 8)
    val viaIndex = Retrieval.bm25AgainstIndex(spark, table, q, "qid", "qtext", k = 5)
    val recompute = Retrieval.bm25TopK(corpus, q, "doc_id", "text", "qid", "qtext", k = 5)
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(key(viaIndex) == key(recompute))
    // The index side must ride its bucket layout: no hashpartitioning
    // exchange on `term` anywhere in the probe plan (the df window and
    // the candidate join are both satisfied by the bucketing).
    val plan = viaIndex.queryExecution.executedPlan.toString
    assert(!"Exchange hashpartitioning\\(term".r.findFirstIn(plan).isDefined,
      s"index probe must not exchange on term:\n$plan")
  }

  test("against-index probe bucket-prunes the scan to the probed terms' files") {
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val table = s"bm25_prune_spec_${System.nanoTime()}"
    Retrieval.writeBm25Index(corpus, "doc_id", "text", table, buckets = 32)
    try {
      val viaIndex = Retrieval.bm25AgainstIndex(spark, table,
        Seq((0L, "merge join")).toDF("qid", "qtext"), "qid", "qtext", k = 5)
      val plan = viaIndex.queryExecution.executedPlan.toString
      val m = "SelectedBucketsCount: (\\d+) out of (\\d+)".r.findFirstMatchIn(plan)
      assert(m.isDefined, s"expected a bucket-pruned scan in:\n$plan")
      // Two probed terms can touch at most two of the 32 buckets.
      assert(m.get.group(1).toInt <= 2 && m.get.group(2).toInt == 32,
        s"expected <= 2 of 32 buckets, got ${m.get.matched}")
      // ...and the pruned probe still scores identically to recompute.
      val recompute = Retrieval.bm25TopK(corpus,
        Seq((0L, "merge join")).toDF("qid", "qtext"),
        "doc_id", "text", "qid", "qtext", k = 5)
      def key(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
      assert(key(viaIndex) == key(recompute))
    } finally Seq(table, table + "_docs", table + "_segments", table + "_tombstones")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("boolean AND against index ≡ direct containment, bucket-pruned probe") {
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val table = s"bool_and_spec_${System.nanoTime()}"
    Retrieval.writeBm25Index(corpus, "doc_id", "text", table, buckets = 32)
    try {
      val q = Seq((0L, "merge join"), (1L, "data data stream")).toDF("qid", "qtext")
      val viaIndex = Retrieval.booleanAndAgainstIndex(spark, table,
        q, "qid", "qtext")
      // direct: doc's distinct tokens ⊇ query's distinct tokens
      val toks = corpus.select(col("doc_id"),
        explode(array_distinct(graft.functions.TextFunctions.tokens(col("text"))))
          .as("term"))
      val qt = q.select(col("qid"), explode(array_distinct(
        graft.functions.TextFunctions.tokens(col("qtext")))).as("term"))
      val need = qt.groupBy("qid").agg(count_distinct(col("term")).as("need"))
      val direct = toks.join(qt, "term")
        .groupBy("qid", "doc_id").agg(count_distinct(col("term")).as("n_terms"))
        .join(need, "qid").where(col("n_terms") === col("need"))
        .select("qid", "doc_id", "n_terms")
      def key(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(key(viaIndex).nonEmpty, "fixture queries must match some docs")
      assert(key(viaIndex) == key(direct))
      // the probe must bucket-prune: 4 distinct terms touch ≤ 4 buckets
      val plan = viaIndex.queryExecution.executedPlan.toString
      val m = "SelectedBucketsCount: (\\d+) out of (\\d+)".r.findFirstMatchIn(plan)
      assert(m.isDefined, s"expected a bucket-pruned scan in:\n$plan")
      assert(m.get.group(1).toInt <= 4 && m.get.group(2).toInt == 32,
        s"expected <= 4 of 32 buckets, got ${m.get.matched}")
    } finally Seq(table, table + "_docs", table + "_segments", table + "_tombstones")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }
}
