package graft.ops

import graft.SparkSpec
import graft.io.Bucketing
import org.apache.spark.sql.functions._

class ScaleOpsSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("salted count equals plain groupBy count") {
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val plain = o.groupBy("o_orderstatus").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedCount(o, Seq("o_orderstatus"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("salted decimal sum equals direct decimal sum exactly") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val direct = li.groupBy("l_returnflag")
      .agg(sum($"l_quantity".cast("decimal(18,2)")).cast("double").as("total"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val salted = Skew.saltedSumDecimal(li, Seq("l_returnflag"), $"l_quantity", 2)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(salted == direct)
  }

  test("salted join equals plain join") {
    val o = spark.read.parquet(s"$sf/orders.parquet").select("o_orderkey", "o_custkey")
    val c = spark.read.parquet(s"$sf/customer.parquet").select("c_custkey", "c_mktsegment")
      .withColumnRenamed("c_custkey", "o_custkey")
    val plain = o.join(c, "o_custkey").count()
    val salted = Skew.saltedJoin(o, c, "o_custkey").count()
    assert(salted == plain)
  }

  test("bucketed co-located join plans without a shuffle exchange") {
    val warehouse = java.nio.file.Files.createTempDirectory("wh").toString
    // session catalog points at default warehouse; use unique table names
    val o = spark.read.parquet(s"$sf/orders.parquet").select("o_orderkey", "o_totalprice")
    val li = spark.read.parquet(s"$sf/lineitem.parquet").select("l_orderkey", "l_quantity")
      .withColumnRenamed("l_orderkey", "o_orderkey")
    Bucketing.writeBucketed(o, "bt_orders", "o_orderkey", 4)
    Bucketing.writeBucketed(li, "bt_lineitem", "o_orderkey", 4)
    val joined = Bucketing.readBucketed(spark, "bt_orders")
      .join(Bucketing.readBucketed(spark, "bt_lineitem"), "o_orderkey")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join should not shuffle:\n$plan")
    assert(joined.count() == li.count()) // every lineitem matches its order
    spark.sql("DROP TABLE bt_orders")
    spark.sql("DROP TABLE bt_lineitem")
  }

  test("dsir: ratio table joins broadcast; corpus stream never sort-merge-joins") {
    val out = graft.SparkEntry.queries("text_dsir_scores")(spark, sf)
    val plan = out.queryExecution.executedPlan.toString
    // the ≤buckets-row ratio table must ride a broadcast onto the per-doc
    // counts — a sort-merge join here would shuffle the corpus stream by
    // bucket, the exact exchange the design avoids
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join in:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"unexpected sort-merge join in:\n$plan")
  }

  test("cluster sample plans WindowGroupLimit; contamination stays broadcast") {
    val cs = graft.SparkEntry.queries("sim_cluster_sample")(spark, sf)
    val csPlan = cs.queryExecution.executedPlan.toString
    // per-partition top-n heaps BEFORE the cluster exchange — a mega-
    // cluster must never stream its full membership through one task
    assert(csPlan.contains("WindowGroupLimit"),
      s"expected WindowGroupLimit in:\n$csPlan")

    val ct = graft.SparkEntry.queries("dedup_contamination")(spark, sf)
    val ctPlan = ct.queryExecution.executedPlan.toString
    // benchmark gram set rides a broadcast onto the exploded corpus gram
    // stream; a sort-merge join here would shuffle the corpus by gram
    assert(ctPlan.contains("BroadcastHashJoin"),
      s"expected broadcast join in:\n$ctPlan")
    assert(!ctPlan.contains("SortMergeJoin"),
      s"unexpected sort-merge join in:\n$ctPlan")
  }

  test("grouping-sets query plans one Expand, top-ngrams plans TakeOrderedAndProject") {
    val gs = graft.SparkEntry.queries("rel_grouping_sets")(spark, sf)
    val gsPlan = gs.queryExecution.executedPlan.toString
    // one scan expanded per grouping set — not N repeated aggregations
    assert(gsPlan.contains("Expand"), s"expected Expand in:\n$gsPlan")

    val tn = graft.SparkEntry.queries("text_top_ngrams")(spark, sf)
    val tnPlan = tn.queryExecution.executedPlan.toString
    // global top-N must be per-partition heaps, never a full global sort
    assert(tnPlan.contains("TakeOrderedAndProject"),
      s"expected TakeOrderedAndProject in:\n$tnPlan")
  }

  test("round-6b plan shapes: chunk/redact/unpivot stay exchange-free; rrf fuses candidate-sized tables") {
    def nEx(p: String) = p.split("Exchange hashpartitioning").length - 1

    // Per-row fan-out ops: one scan, zero shuffles (fan-out stays
    // partition-local — the property that makes them scan-speed at 100 TB).
    for (q <- Seq("text_chunk", "text_pii_redact")) {
      val plan = graft.SparkEntry.queries(q)(spark, sf)
        .queryExecution.executedPlan.toString
      assert(nEx(plan) == 0, s"$q should plan zero hash exchanges:\n$plan")
    }

    // Native unpivot: one Expand over one scan, no join and no exchange.
    val up = graft.SparkEntry.queries("rel_unpivot")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(up.contains("Expand"), s"expected Expand in:\n$up")
    assert(nEx(up) == 0 && !up.contains("Join"),
      s"unpivot must be a single-scan Expand, not a join/shuffle:\n$up")

    // RRF: the fusion join runs over the two top-k tables (candidate-
    // sized), and the final re-rank window partitions by qid only —
    // corpus-sized data never reaches the fusion subtree.
    val rrf = graft.SparkEntry.queries("sim_rrf")(spark, sf)
      .queryExecution.executedPlan.toString
    // pin the fusion join to an EQUI full-outer (SMJ/shuffled-hash print
    // their key lists before the join type), not a nested-loop FullOuter
    // that lost its join keys
    assert("(SortMergeJoin|ShuffledHashJoin) \\[[^\\]]+\\], \\[[^\\]]+\\], FullOuter".r
      .findFirstIn(rrf).isDefined,
      s"fusion join must stay a keyed SMJ/shuffled-hash full outer:\n$rrf")
    // broadcast-centroid cross joins (BNLJ Cross) are fine; a FullOuter
    // BNLJ would mean the fusion join lost its keys
    assert("BroadcastNestedLoopJoin[^\\n]*FullOuter".r.findFirstIn(rrf).isEmpty,
      s"fusion must never degrade to a nested-loop full outer:\n$rrf")
  }

  test("round-6c plan shapes: bm25 broadcasts the query side; random projection stays exchange-free") {
    def nEx(p: String) = p.split("Exchange hashpartitioning").length - 1

    // BM25: the query-term join must be a broadcast (candidate generation
    // touches only query-term postings, never shuffles the posting table
    // against the query set), and the corpus-sized work is bounded to the
    // posting-table build + its df/dl derivations.
    val bm = graft.SparkEntry.queries("text_bm25")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(bm.contains("BroadcastHashJoin"),
      s"bm25 query side must broadcast:\n$bm")

    // JL projection: per-row column math over one scan — zero exchanges
    // up to the exploded output (the property that makes it scan-speed).
    val rp = graft.SparkEntry.queries("sim_random_proj")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(nEx(rp) == 0 && !rp.contains("Join"),
      s"random projection must plan a single-scan projection:\n$rp")
  }

  test("sliced prefix-sum queries match the single-window formulation on testdata") {
    import graft.functions.TextFunctions.tokens
    import org.apache.spark.sql.expressions.Window
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    // text_pack_sequences, as one naive window per language
    val t = docs.select($"doc_id", $"lang", size(tokens($"text")).cast("long").as("n_tokens"))
    val naivePack = t.withColumn("__cum",
      sum($"n_tokens").over(Window.partitionBy("lang").orderBy("n_tokens", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select($"doc_id", $"lang", $"n_tokens", expr("(__cum - n_tokens) div 2048").as("pack_id"))
    val pack = graft.SparkEntry.queries("text_pack_sequences")(spark, sf)
    assert(pack.collect().toSet == naivePack.collect().toSet)

    // text_domain_mix, as one naive window per source
    val weights = ((0 until 10).map(i => s"src$i" -> 0.0625) ++
      (10 until 20).map(i => s"src$i" -> 0.03125)).toMap
    val budgets = weights.toSeq.map { case (s, w) => (s, (w * 8192L).toLong) }
      .toDF("source", "__budget")
    val keyed = docs.select($"source", $"doc_id",
      size(tokens($"text")).cast("long").as("n_tokens"),
      graft.functions.TextFunctions.hash60(
        concat(lit("mix:"), $"doc_id".cast("string"))).as("__key"))
      .join(broadcast(budgets), "source")
    val naiveMix = keyed.withColumn("cum_tokens",
      sum($"n_tokens").over(Window.partitionBy("source").orderBy("__key", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .where($"cum_tokens" - $"n_tokens" < $"__budget")
      .select("source", "doc_id", "n_tokens", "cum_tokens")
    val mix = graft.SparkEntry.queries("text_domain_mix")(spark, sf)
    assert(mix.collect().toSet == naiveMix.collect().toSet)
  }

  test("round-6 plan shapes: two-exchange bounded fold, shuffle-free PQ assign, broadcast heavy gate") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val cents = e.where($"vec_id" < 8).select($"vec_id".as("cid"), $"embedding")
    def nEx(p: String) = p.split("Exchange hashpartitioning").length - 1
    // executedPlan BEFORE any action: exchanges are inserted (sparkPlan
    // predates EnsureRequirements) and AQE prints the initial plan once.
    // The sliced centroid fold is exactly two aggregate exchanges —
    // (cluster, dim, slice) then (cluster, dim) — nothing else moves
    val assigned = e.select($"vec_id", $"embedding", pmod($"vec_id", lit(8L)).as("cluster"))
    val foldPlan = Similarity.centroidUpdate(assigned, "vec_id", "embedding")
      .queryExecution.executedPlan.toString
    assert(nEx(foldPlan) == 2, s"expected exactly 2 exchanges in:\n$foldPlan")
    // PQ code assignment is per-row math against a broadcast codebook:
    // zero shuffles of the corpus
    val codesPlan = Similarity.pqCodes(e, e.where($"vec_id" < 16)
      .select($"vec_id".as("cid"), $"embedding"),
      "vec_id", "embedding", "cid", m = 4)
      .queryExecution.executedPlan.toString
    assert(nEx(codesPlan) == 0, s"PQ assign must not shuffle:\n$codesPlan")
    // IVF assignment is the same shape (argmax over the broadcast
    // centroid array) — the window formulation it replaced exchanged the
    // whole corpus by id
    val assignPlan = Similarity.ivfAssign(e, cents, "vec_id", "embedding", "cid")
      .queryExecution.executedPlan.toString
    assert(nEx(assignPlan) == 0, s"IVF assign must not shuffle:\n$assignPlan")
    // semDedup's over-cap gate (≤ |centroids| heavy-cluster ids) rides
    // broadcasts — the corpus is never exchanged by cluster just to
    // split heavy from capped. (The FINAL anti-join on id and the pair
    // self-joins are corpus-sized on both sides; shuffle joins are the
    // correct plan there and are not asserted against.)
    val sdPlan = Similarity.semDedup(e, cents, "vec_id", "embedding", "cid",
      threshold = 0.4, maxClusterSize = 60)
      .queryExecution.sparkPlan.toString
    assert(!"""SortMergeJoin \[cluster[^\n]*LeftAnti""".r.findFirstIn(sdPlan).isDefined,
      s"heavy-cluster gate must stay broadcast:\n$sdPlan")
    assert(sdPlan.contains("BroadcastHashJoin"), s"expected broadcast gate in:\n$sdPlan")
  }

  test("curation plan shapes: broadcast vocab/budget joins, span table joined not self-joined") {
    val d = spark.read.parquet(s"$sf/documents.parquet")
    def nEx(p: String) = p.split("Exchange hashpartitioning").length - 1
    // oovRate: the vocabulary is top-k by construction and must broadcast;
    // the corpus-side token stream is exchanged only for the final per-doc
    // aggregation (one exchange), never for the flagging join
    val oovPlan = TextAnalysis.oovRate(d, "doc_id", "text", vocabSize = 20)
      .queryExecution.executedPlan.toString
    assert(oovPlan.contains("BroadcastHashJoin"),
      s"vocab flagging join must broadcast:\n$oovPlan")
    // spanDupRate: grams join their global counts — both sides hash by the
    // 60-bit gram hash and the per-doc agg adds one more exchange; there
    // must be NO cartesian/self-join of the corpus
    val spanPlan = TextAnalysis.spanDupRate(d, "doc_id", "text", n = 3)
      .queryExecution.executedPlan.toString
    assert(!spanPlan.contains("CartesianProduct"),
      s"span stats must not cross-join:\n$spanPlan")
    assert(nEx(spanPlan) <= 3, s"span stats should move ≤3 exchanges:\n$spanPlan")
    // domainMixBudgets: computed budgets stay a broadcast table exactly
    // like the map-driven path — the corpus never exchanges by source for
    // the budget join. Inspect budgetKeyed (the PRE-materialization frame):
    // domainMixBudgets checkpoints right after the join, so its own plan
    // starts at a LogicalRDD and cannot contain the budget join at all.
    val budgets = Curation.temperatureWeights(d, "text", "source", 4096L)
    val mixPlan = Curation.budgetKeyed(d, "doc_id", "text", "source", budgets, "mix")
      .queryExecution.executedPlan.toString
    assert(mixPlan.contains("BroadcastHashJoin"),
      s"budget join must broadcast:\n$mixPlan")
    assert(!mixPlan.contains("Exchange hashpartitioning(source"),
      s"corpus must not exchange by source for the budget join:\n$mixPlan")
  }

  test("ivfKnnPreAssigned reuses the materialized assignment — no corpus centroid rescan") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val cents = e.where($"vec_id" < 8).select($"vec_id".as("cid"), $"embedding")
    val assigned = Similarity.ivfAssign(e, cents, "vec_id", "embedding", "cid")
      .localCheckpoint(true) // stands in for a persisted bucketed index
    val q = e.where($"vec_id" % 100 === 0).select($"vec_id".as("qid"), $"embedding")
    val reused = Similarity.ivfKnnPreAssigned(assigned, q, cents,
      "vec_id", "embedding", "qid", "cid", k = 3)
    val fresh = Similarity.ivfKnn(e, q, cents, "vec_id", "embedding", "qid", "cid", k = 3)
    assert(reused.collect().toSet == fresh.collect().toSet)
    // the only centroid crossJoin left is the tiny broadcast query side;
    // the fresh path pays it on the corpus side too. (sparkPlan, not
    // executedPlan: AQE's toString prints initial+final and double-counts)
    def nBnlj(p: String) = p.split("BroadcastNestedLoopJoin").length - 1
    assert(nBnlj(reused.queryExecution.sparkPlan.toString) == 1,
      "pre-assigned path must not re-scan the corpus against centroids")
    assert(nBnlj(fresh.queryExecution.sparkPlan.toString) == 2)
  }

  test("LSH index append: index + appended batch ≡ full rebuild, still exchange-free") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val base = docs.where($"doc_id" % 5 =!= 0L)
    val extra = docs.where($"doc_id" % 10 === 0L)
      .withColumn("doc_id", $"doc_id" + 1000000L)
    val probe = docs.where($"doc_id" % 10 === 5L)
      .withColumn("doc_id", $"doc_id" + 2000000L)
    Dedup.writeLshIndex(base, "doc_id", "text", "lsh_idx_app", buckets = 4)
    Dedup.appendToLshIndex(extra, "doc_id", "text", "lsh_idx_app", buckets = 4,
      batchId = "b1")
    Dedup.writeLshIndex(base.unionByName(extra), "doc_id", "text", "lsh_idx_rebuild",
      buckets = 4)
    try {
      val viaAppend = Dedup.lshCandidatesAgainstIndex(spark, "lsh_idx_app",
        probe, "doc_id", "text")
      val viaRebuild = Dedup.lshCandidatesAgainstIndex(spark, "lsh_idx_rebuild",
        probe, "doc_id", "text")
      val a = viaAppend.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val b = viaRebuild.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(a == b, s"append=${a.size} rebuild=${b.size}")
      assert(a.nonEmpty)
      // the appended index still reads bucketed with zero band_key exchange
      val plan = viaAppend.queryExecution.executedPlan.toString
      assert(plan.contains("Bucketed: true"), s"index scan not bucketed:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning(band_key"),
        s"band_key exchange must stay eliminated after append:\n$plan")
    } finally {
      spark.sql("DROP TABLE IF EXISTS lsh_idx_app")
      spark.sql("DROP TABLE IF EXISTS lsh_idx_rebuild")
    }
  }

  test("incremental dedup against a persisted LSH index: corpus side never shuffles") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val corpus = docs.where($"doc_id" % 5 =!= 0L)
    val batch = docs.where($"doc_id" % 5 === 0L)
      .withColumn("doc_id", $"doc_id" + 1000000L) // disjoint id space
    Dedup.writeLshIndex(corpus, "doc_id", "text", "lsh_index_t", buckets = 4)
    try {
      val cand = Dedup.lshCandidatesAgainstIndex(spark, "lsh_index_t",
        batch, "doc_id", "text")
      // equivalence: against-index candidates == the cross (new x corpus)
      // slice of a full recompute over corpus+batch
      val full = Dedup.lshCandidatePairs(corpus.unionByName(batch), "doc_id", "text")
        .where(($"id_a" < 1000000L) =!= ($"id_b" < 1000000L)) // cross pairs only
        .select(
          org.apache.spark.sql.functions.greatest($"id_a", $"id_b").as("id_new"),
          org.apache.spark.sql.functions.least($"id_a", $"id_b").as("id_corpus"),
          $"est_jaccard")
      val a = cand.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val b = full.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(a == b, s"against-index=${a.size} full-cross=${b.size}")
      assert(a.nonEmpty) // the fixture has near-dups across the split
      // plan: the bucketed index scan feeds the cap window AND the join
      // with no band_key exchange anywhere — the only hash exchange left
      // is the candidates-proportional distinct (and the small batch side
      // broadcasts)
      val plan = cand.queryExecution.executedPlan.toString
      assert(plan.contains("Bucketed: true"), s"index scan not bucketed:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning(band_key"),
        s"corpus/band_key exchange should be eliminated by bucketing:\n$plan")
    } finally spark.sql("DROP TABLE IF EXISTS lsh_index_t")
  }

  test("outer-join + decorrelated-subquery shapes: keyed joins only, never nested-loop") {
    // r8: Q13/Q17/Q21 + the null-key full-outer pin all carry equi keys —
    // a BroadcastNestedLoopJoin or CartesianProduct anywhere means a join
    // lost its keys (the one plan shape that cannot survive 100 TB)
    for (q <- Seq("rel_tpch_q13", "rel_outer_join", "rel_tpch_q17", "rel_tpch_q21",
        "rel_tpch_q4", "rel_tpch_q16", "rel_tpch_q20", "rel_tpch_q2",
        "rel_tpch_q7", "rel_tpch_q8", "rel_tpch_q9", "rel_tpch_q12",
        "rel_tpch_q14", "rel_tpch_q19", "events_gapfill",
        "dedup_sorted_neighborhood")) {
      val plan = graft.SparkEntry.queries(q)(spark, sf)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"$q must not plan a nested loop:\n$plan")
      assert(!plan.contains("CartesianProduct"), s"$q must not cross-join:\n$plan")
    }
    // Q22's one-row avg rides a broadcast cross join (sanctioned scalar
    // pattern); the NOT-EXISTS side must stay a KEYED anti join.
    val q22 = graft.SparkEntry.queries("rel_tpch_q22")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!q22.contains("CartesianProduct"), s"q22 must not cartesian:\n$q22")
    assert("(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) [^\\n]*LeftAnti".r
      .findFirstIn(q22).isDefined, s"q22 anti join must stay keyed:\n$q22")
    // Q17's decorrelated form: the brand dim broadcasts; the per-part avg
    // is ONE grouped aggregate joined back — never a per-row subquery.
    val q17 = graft.SparkEntry.queries("rel_tpch_q17")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(q17.contains("BroadcastHashJoin"), s"brand dim must broadcast:\n$q17")
    // Q21's global top-100 plans as per-partition heaps.
    val q21 = graft.SparkEntry.queries("rel_tpch_q21")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(q21.contains("TakeOrderedAndProject"),
      s"expected TakeOrderedAndProject in:\n$q21")
  }

  test("null-safe equi-join plans as a hash join, never a nested loop") {
    val out = graft.SparkEntry.queries("rel_nullsafe_join")(spark, sf)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"nested loop in:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian in:\n$plan")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin") ||
      plan.contains("ShuffledHashJoin"), s"expected a keyed join in:\n$plan")
    // NULL keys MATCH under <=>: the NULL group's pair count is the
    // product of the two sides' null counts
    val c = spark.read.parquet(s"$sf/customer.parquet")
    val sup = spark.read.parquet(s"$sf/supplier.parquet")
    val nullCust = c.where(col("c_acctbal") < 0).count()
    val nullSupp = sup.where(col("s_acctbal") < 0).count()
    val nullRow = out.where(col("k").isNull).collect()
    if (nullCust > 0 && nullSupp > 0) {
      assert(nullRow.length == 1)
      assert(nullRow.head.getAs[Long]("n_pairs") == nullCust * nullSupp,
        s"NULL<=>NULL pairs must be $nullCust*$nullSupp: ${nullRow.head}")
    }
  }

  test("ewma: first two rows of a user obey the closed-form dyadic weights") {
    val out = graft.SparkEntry.queries("events_ewma")(spark, sf)
    val e = graft.queries.Tables.events(spark, sf)
      .withColumn("tus", expr("ts div 1000"))
      .withColumn("cents", floor(col("value") * lit(100.0) + lit(0.5)).cast("long"))
    // a user with at least two events, their first two in time order
    val uid = e.groupBy("user_id").count().where(col("count") >= 2)
      .select("user_id").head().getLong(0)
    val first2 = e.where(col("user_id") === uid)
      .orderBy("tus", "event_id").limit(2)
      .select("event_id", "cents").collect()
    val (id1, c1) = (first2(0).getLong(0), first2(0).getLong(1))
    val (id2, c2) = (first2(1).getLong(0), first2(1).getLong(1))
    val got = out.where(col("event_id").isin(id1, id2))
      .select("event_id", "ewma").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(id1) == (c1 * 32768L).toDouble / 65536.0 / 100.0)
    assert(got(id2) == (c2 * 32768L + c1 * 16384L).toDouble / 65536.0 / 100.0)
  }

  test("concurrency sweep: balanced deltas, plausible bounds, no window-everything plan") {
    val out = graft.SparkEntry.queries("events_concurrency")(spark, sf)
    val rows = out.collect()
    assert(rows.nonEmpty)
    // bounds: never negative (an hour whose only point is a session END
    // legitimately maxes at 0 — the close leaves nothing open), never
    // above the user count
    val users = graft.queries.Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(rows.forall { r =>
      val m = r.getAs[Long]("max_concurrent"); m >= 0 && m <= users
    }, "implausible concurrency bound")
    assert(rows.exists(_.getAs[Long]("max_concurrent") >= 1))
    // total points = 2 × session count (each +1 matched by a −1)
    val nSessions = graft.SparkEntry.queries("events_sessionize_batch")(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_points")).sum == 2 * nSessions)
    // the global running sum is the two-phase prefix sum: no
    // single-partition global window in the plan
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window [sum") ||
      plan.contains("Exchange rangepartitioning"),
      s"expected range-partitioned prefix sum:\n$plan")
  }

  test("time-weighted average: constant-value user reproduces the constant") {
    import spark.implicits._
    // synthetic check through the op's exact arithmetic: two users, one
    // constant at 2.50, one alternating — TWA of the constant user IS it
    val e = graft.queries.Tables.events(spark, sf)
    val twa = graft.SparkEntry.queries("events_time_weighted")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // every user's TWA lies within [min value, max value] of their events
    val bounds = e.withColumn("cents",
        floor(col("value") * lit(100.0) + lit(0.5)).cast("long"))
      .groupBy("user_id").agg(min("cents").as("lo"), max("cents").as("hi"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    twa.foreach { case (u, v) =>
      val (lo, hi) = bounds(u)
      assert(v >= lo / 100.0 - 1e-9 && v <= hi / 100.0 + 1e-9,
        s"user $u twa $v outside [${lo / 100.0}, ${hi / 100.0}]")
    }
  }

  test("NOT IN plans as a hash anti join, never a nested loop; NULL poisoning pinned") {
    val out = graft.SparkEntry.queries("rel_not_in_null")(spark, sf)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"nested loop in:\n$plan")
    val row = out.head()
    val neg = spark.read.parquet(s"$sf/supplier.parquet")
      .where(col("s_acctbal") < 0).count()
    assert(row.getLong(0) > 0, s"clean NOT IN must match someone: $row")
    if (neg > 0) assert(row.getLong(1) == 0,
      s"one NULL in the set must empty NOT IN: $row")
    else assert(row.getLong(1) == row.getLong(0),
      s"no NULL in the fixture at this sf — branches must agree: $row")
  }

  test("co-occurrence pair generation is an offset equi-join, never a nested loop") {
    val out = graft.SparkEntry.queries("text_cooccurrence")(spark, sf)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"nested loop in:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian in:\n$plan")
    // sanity: adjacent tokens of any real doc co-occur — result nonempty,
    // marginals bound the pair count
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (np, na, nb) = (r.getAs[Long]("n_pair"), r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))
      assert(np <= 3 * math.min(na, nb), s"pair count exceeds window bound: $r")
    }
  }

  test("weighted median: crossing row matches the by-hand fold; plan has no global sort") {
    val out = graft.SparkEntry.queries("rel_weighted_median")(spark, sf)
    val got = out.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // by-hand reference: sort each group, walk cumulative weights
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_returnflag", "l_extendedprice", "l_quantity", "l_orderkey",
        "l_linenumber").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2).toLong,
        r.getLong(3), r.getInt(4).toLong))
    li.groupBy(_._1).foreach { case (rf, rows) =>
      val sorted = rows.sortBy(t => (t._2, t._4, t._5))
      val tot = sorted.map(_._3).sum
      var cum = 0L
      val med = sorted.find { t => cum += t._3; 2 * cum >= tot }.get._2
      assert(got(rf) == ((tot, med)), s"group $rf: got ${got(rf)}, want ($tot, $med)")
    }
    // the prefix sum must be the two-phase form: range partition, no
    // single-partition global window
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("Exchange rangepartitioning"),
      s"expected the range-partitioned prefix sum in:\n$plan")
  }

  test("phrase index probe: bucketed scan, zero bigram exchange, ≡ recompute") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    import spark.implicits._
    val q = Seq((0L, "merge join order"), (1L, "data stream batch"))
      .toDF("qid", "qtext")
    Retrieval.writePhraseIndex(docs, "doc_id", "text", "phrase_idx_plan", buckets = 4)
    try {
      val viaIdx = Retrieval.phraseAgainstIndex(spark, "phrase_idx_plan",
        q, "qid", "qtext", k = 10)
      val fresh = Retrieval.phraseTopK(docs, q, "doc_id", "text",
        "qid", "qtext", k = 10)
      def s4(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(s4(viaIdx) == s4(fresh))
      assert(s4(viaIdx).nonEmpty)
      val plan = viaIdx.queryExecution.executedPlan.toString
      assert(plan.contains("Bucketed: true"), s"index scan not bucketed:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning(bigram"),
        s"bigram exchange should be eliminated by bucketing:\n$plan")
    } finally Seq("phrase_idx_plan", "phrase_idx_plan_tombstones",
      "phrase_idx_plan_segments")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("equi-depth histogram: balanced buckets via the distributed rank, no global window") {
    val out = graft.SparkEntry.queries("rel_equidepth_hist")(spark, sf)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("Exchange rangepartitioning"),
      s"expected the range-partitioned prefix-sum rank in:\n$plan")
    assert(!plan.contains("Window [ntile"), s"global ntile window in:\n$plan")
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.length == 8, s"expected 8 buckets: ${rows.mkString(",")}")
    val counts = rows.map(_._2)
    assert(counts.max - counts.min <= 1,
      s"equi-depth buckets must differ by at most one row: ${rows.mkString(",")}")
  }

  test("explode_outer keeps array-less rows; totals reconcile with the left join") {
    val out = graft.SparkEntry.queries("rel_explode_outer")(spark, sf).collect()
    val heavy = spark.read.parquet(s"$sf/lineitem.parquet")
      .where(col("l_quantity") >= 45)
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val matched = orders.join(heavy,
      col("o_orderkey") === col("l_orderkey"), "left_semi").count()
    val nRows = out.map(_.getLong(1)).sum
    val nUnmatched = out.map(_.getLong(2)).sum
    assert(nUnmatched == orders.count() - matched,
      "every array-less order must surface exactly one NULL row")
    assert(nRows - nUnmatched == heavy.count(),
      "each heavy lineitem must surface exactly one exploded row")
  }

  test("OHLC bars: open/close respect the (ts, event_id) order, high/low bound them") {
    val out = graft.SparkEntry.queries("events_ohlc")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (open, high, low, close) =
        (r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))
      assert(low <= open && open <= high, s"open outside [low, high]: $r")
      assert(low <= close && close <= high, s"close outside [low, high]: $r")
    }
    // n = 1 bars must have open == close (one event is both endpoints).
    out.filter(_.getLong(2) == 1L).foreach { r =>
      assert(r.getDouble(3) == r.getDouble(6), s"1-event bar open != close: $r")
    }
  }

  test("DBSCAN: roles partition the corpus, borders inherit a core neighbor's cluster") {
    val out = graft.SparkEntry.queries("sim_dbscan")(spark, sf)
    val rows = out.collect()
    val byRole = rows.groupBy(_.getString(1))
    assert(byRole.keySet.subsetOf(Set("core", "border", "noise")))
    byRole.getOrElse("noise", Array()).foreach(r =>
      assert(r.isNullAt(2), s"noise must have NULL cluster: $r"))
    byRole.getOrElse("core", Array()).foreach(r =>
      assert(!r.isNullAt(2), s"core must be clustered: $r"))
    byRole.getOrElse("border", Array()).foreach(r =>
      assert(!r.isNullAt(2), s"border must be clustered: $r"))
    // Cluster labels are min member ids: every cluster id is a core id.
    val coreIds = byRole.getOrElse("core", Array()).map(_.getLong(0)).toSet
    rows.filter(!_.isNullAt(2)).foreach(r =>
      assert(coreIds.contains(r.getLong(2)),
        s"cluster label must be a core's id: $r"))
  }

  test("MRL truncation recall is a valid rate and truth lists are full-k") {
    val out = graft.SparkEntry.queries("sim_mrl_recall")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(1) == 5L, s"truth list must hold k=5: $r")
      val rec = r.getDouble(3)
      assert(rec >= 0.0 && rec <= 1.0, s"recall outside [0,1]: $r")
    }
  }

  test("similarity histogram: cumulative counts reconcile with the bins") {
    val out = graft.SparkEntry.queries("dedup_sim_histogram")(spark, sf)
      .collect().sortBy(-_.getLong(0))
    assert(out.nonEmpty)
    var cum = 0L
    out.foreach { r =>
      cum += r.getLong(1)
      assert(r.getLong(2) == cum, s"cumulative mismatch at $r: expected $cum")
      assert(r.getLong(0) >= 0 && r.getLong(0) <= 9, s"bin out of range: $r")
    }
  }

  test("length buckets: caps are powers of two and tight") {
    val out = graft.SparkEntry.queries("text_length_buckets")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val cap = r.getLong(0)
      assert((cap & (cap - 1)) == 0L && cap >= 1L, s"cap not a power of two: $r")
      val (nd, tot, waste) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(waste == nd * cap - tot, s"waste arithmetic broken: $r")
      assert(tot > nd * cap / 2 || cap == 1L,
        s"cap not tight — every doc fits the next bucket down: $r")
      val eff = r.getDouble(4)
      assert(eff > 0.0 && eff <= 1.0, s"efficiency out of range: $r")
    }
  }

  test("modularity: component edges and degrees reconcile, Q bounded") {
    val out = graft.SparkEntry.queries("sim_modularity")(spark, sf).collect()
    assert(out.nonEmpty)
    // Components absorb every edge: Σ e_in = m and Σ d = 2m.
    val eSum = out.map(_.getLong(2)).sum
    val dSum = out.map(_.getLong(3)).sum
    assert(dSum == 2 * eSum, s"sum of degrees must be twice the edges")
    val q = out.map(_.getDouble(4)).sum
    assert(q > -1.0 - 1e-9 && q <= 1.0 + 1e-9, s"total modularity $q out of range")
    out.foreach { r =>
      assert(r.getLong(1) >= 2, s"a component with edges has >= 2 nodes: $r")
      assert(r.getLong(2) >= 1, s"component without edges surfaced: $r")
    }
  }

  test("Rocchio: expanded query still excludes itself and ranks 5 per query") {
    val out = graft.SparkEntry.queries("sim_rocchio")(spark, sf).collect()
    val byQ = out.groupBy(_.getLong(0))
    assert(byQ.nonEmpty)
    byQ.foreach { case (qid, rows) =>
      assert(rows.map(_.getLong(3)).sorted.toSeq == (1L to 5L),
        s"ranks not 1..5 for $qid")
      assert(!rows.exists(_.getLong(1) == qid),
        s"query $qid retrieved itself after expansion")
      rows.foreach(r => assert(r.getDouble(2) >= -1.0 - 1e-9 &&
        r.getDouble(2) <= 1.0 + 1e-9, s"cosine out of range: $r"))
    }
  }

  test("skyline equals the brute-force non-dominated set; no global data window") {
    val out = graft.SparkEntry.queries("rel_skyline")(spark, sf)
    // The executed plan of `out` truncates at the frontier checkpoint;
    // assert the sliced-running-max shape on the lazy frontier plan.
    val (frontier, sliced) = Skyline.frontierPlan(
      spark.read.parquet(s"$sf/orders.parquet")
        .selectExpr("o_orderkey", "o_totalprice",
          "unix_micros(CAST(o_orderdate AS TIMESTAMP)) AS d"),
      "o_totalprice", "d")
    val plan = frontier.queryExecution.executedPlan.toString
    sliced.unpersist(false)
    assert(plan.contains("Exchange rangepartitioning"),
      s"expected the sliced running max in:\n$plan")
    val sky = out.collect().map(_.getLong(0)).toSet
    val all = spark.read.parquet(s"$sf/orders.parquet")
      .selectExpr("o_orderkey", "o_totalprice",
        "unix_micros(CAST(o_orderdate AS TIMESTAMP)) AS d")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val brute = all.filter { case (_, pm, xm) =>
      !all.exists { case (_, pb, xb) =>
        graft.ops.Skyline.dominates(pb, xb, pm, xm) }
    }.map(_._1).toSet
    assert(sky == brute,
      s"frontier mismatch: extra=${sky -- brute} missing=${brute -- sky}")
  }

  test("skyline frontier broadcast is size-gated (anti-correlated data demotes to shuffle join)") {
    // Anti-correlated axes: y = x under (minimize x, maximize y) puts
    // EVERY distinct x on the frontier — the adversarial case where a
    // forced broadcast of the frontier would grow with the data. Turn
    // auto-broadcast off so the plan shows only what the HINT forces
    // (at real scale a big frontier exceeds the auto threshold anyway —
    // the gate exists to not FORCE broadcast past AQE).
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val anti = spark.range(200)
        .selectExpr("id AS k", "CAST(id AS DOUBLE) AS x", "id AS y")
      val gated = Skyline.skyline2d(anti, "x", "y", maxBroadcastFrontier = 8L)
      val gatedPlan = gated.queryExecution.executedPlan.toString
      assert(!gatedPlan.contains("BroadcastHashJoin"),
        s"frontier above the gate must not broadcast:\n$gatedPlan")
      assert(gated.count() == 200L)
      // Below the gate (tiny frontier) the broadcast hint stays.
      val corr = spark.range(200)
        .selectExpr("id AS k", "CAST(id AS DOUBLE) AS x", "-id AS y")
      val fast = Skyline.skyline2d(corr, "x", "y")
      assert(fast.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
      assert(fast.count() == 1L)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("SCD2 temporal join: at most one version per instant, equi-join plan") {
    val out = graft.SparkEntry.queries("cdc_scd2_temporal_join")(spark, sf)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"interval join must ride the key equi-join:\n$plan")
    val rows = out.collect()
    val byProbe = rows.groupBy(r => (r.getLong(0), r.getLong(1)))
    byProbe.foreach { case (k, vs) =>
      assert(vs.length == 1, s"more than one version valid at $k")
    }
    // Probes at the last batch must agree with the merged current state:
    // every non-deleted key has exactly one version there.
    val lastProbe = rows.filter(_.getLong(1) == 2L)
    assert(lastProbe.nonEmpty)
    assert(lastProbe.exists(!_.isNullAt(2)), "no current versions at seq 2")
  }

  test("basket rules: probabilities in range, lift consistent with support") {
    val out = graft.SparkEntry.queries("rel_basket_rules")(spark, sf).collect()
    out.foreach { r =>
      val (nab, sup, conf, lift) =
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(nab >= 3, s"support floor violated: $r")
      assert(sup > 0.0 && sup <= 1.0, s"support out of range: $r")
      assert(conf > 0.0 && conf <= 1.0, s"confidence out of range: $r")
      assert(lift > 0.0, s"lift must be positive: $r")
      assert(r.getLong(0) < r.getLong(1), s"pair not ordered: $r")
    }
  }

  test("engagement: DAU <= WAU <= MAU, WAU covers the trailing week exactly") {
    val out = graft.SparkEntry.queries("events_engagement")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(1) <= r.getLong(2) && r.getLong(2) <= r.getLong(3),
        s"DAU <= WAU <= MAU violated: $r")
    }
    // Brute-force one day's WAU from raw events.
    val active = spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000 AS day",
        "user_id")
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val probe = out.maxBy(_.getLong(0))
    val d = probe.getLong(0)
    val expect = active.filter(t => t._1 >= d - 6 && t._1 <= d)
      .map(_._2).distinct.length
    assert(probe.getLong(2) == expect.toLong,
      s"WAU($d) = ${probe.getLong(2)}, brute force says $expect")
  }

  test("keyphrases: no stopword inside any phrase, scores positive, top-20") {
    val out = graft.SparkEntry.queries("text_keyphrases")(spark, sf).collect()
    assert(out.length == 20)
    val stop = Set("the", "a", "an", "of", "to", "in", "and", "is", "it",
      "that", "for", "on", "with", "as")
    out.foreach { r =>
      val words = r.getString(0).split(" ")
      assert(words.nonEmpty && words.forall(w => !stop.contains(w)),
        s"stopword leaked into phrase: $r")
      assert(r.getLong(1) >= 1 && r.getDouble(2) > 0.0, s"bad stats: $r")
      // A phrase's score is at least its length (deg/freq >= 1 per word).
      assert(r.getDouble(2) >= words.length.toDouble - 1e-9,
        s"score below phrase length: $r")
    }
  }

  test("CUSUM: closed form equals the clamped recurrence, never negative") {
    val out = graft.SparkEntry.queries("events_cusum")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getLong(3) >= 0L, s"CUSUM went negative: $r"))
    // Re-derive sequentially per type and compare — the closed form
    // P_t - min(0, min P_j) must equal max(0, C_{t-1} + d_t).
    out.groupBy(_.getString(0)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getTimestamp(1).getTime)
      val t = sorted.length.toLong
      val n = sorted.map(_.getLong(2)).sum
      var c = 0L
      sorted.foreach { r =>
        c = math.max(0L, c + (r.getLong(2) * t - n))
        assert(r.getLong(3) == c, s"closed form diverges at $r: expected $c")
      }
    }
  }

  test("seasonal forecast: holdout is disjoint from train, error math consistent") {
    val out = graft.SparkEntry.queries("events_seasonal_forecast")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (trainN, weeks, actual) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(weeks >= 1 && trainN >= weeks,
        s"cell must appear at least once per counted train week: $r")
      val forecast = trainN.toDouble / weeks.toDouble
      assert(r.getDouble(5) == forecast, s"forecast mismatch: $r")
      assert(r.getDouble(6) == math.abs(actual.toDouble - forecast),
        s"abs_err mismatch: $r")
    }
  }

  test("embedding drift: shares sum to one per half, self-comparison is cosine 1") {
    val out = graft.SparkEntry.queries("sim_embed_drift")(spark, sf).collect()
    assert(out.nonEmpty)
    assert(math.abs(out.map(_.getDouble(3)).sum - 1.0) < 1e-9)
    assert(math.abs(out.map(_.getDouble(4)).sum - 1.0) < 1e-9)
    out.foreach(r => assert(r.getDouble(5) >= -1.0 - 1e-9 &&
      r.getDouble(5) <= 1.0 + 1e-9, s"cosine out of range: $r"))
    // Same-half drift must be exactly cosine 1 per cluster (identical
    // mean vectors) — the monitor's null hypothesis.
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val cents = emb.where(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding"))
    val assigned = graft.ops.Similarity.ivfAssign(emb, cents,
      "vec_id", "embedding", "cid")
    val sums = graft.ops.Similarity.centroidUpdate(
      assigned.where(col("vec_id") % 2 === 0), "vec_id", "embedding")
    val means = sums.groupBy("cluster")
      .agg(array_sort(collect_list(struct(col("dim"),
        (col("comp_sum") / col("n").cast("double")).cast("float").as("m"))))
        .as("__a"))
      .select(col("cluster"), expr("transform(__a, x -> x.m)").as("v"))
    val self = means.select(
      graft.functions.VectorFunctions.cosine(col("v"), col("v")).as("c"))
      .collect()
    self.foreach(r => assert(math.abs(r.getDouble(0) - 1.0) < 1e-12))
  }

  test("burst detection: RANGE frame counts itself, flags agree with the count") {
    val out = graft.SparkEntry.queries("events_burst_detect")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val n = r.getLong(2)
      assert(n >= 1L, s"trailing count must include the event itself: $r")
      assert(r.getBoolean(3) == (n >= 5L), s"flag disagrees with count: $r")
    }
  }

  test("seasonal profile: bounded 7x24 cells, shares sum to one") {
    val out = graft.SparkEntry.queries("events_seasonal_profile")(spark, sf).collect()
    assert(out.length <= 168, s"more cells than dow x hour: ${out.length}")
    out.foreach { r =>
      assert(r.getLong(0) >= 0 && r.getLong(0) <= 6, s"dow out of range: $r")
      assert(r.getLong(1) >= 0 && r.getLong(1) <= 23, s"hod out of range: $r")
    }
    val total = out.map(_.getLong(2)).sum
    val shareSum = out.map(_.getDouble(4)).sum
    assert(math.abs(shareSum - 1.0) < 1e-9, s"shares sum to $shareSum")
    assert(total == spark.read.parquet(s"$sf/events.parquet").count())
  }

  test("link prediction: candidates are unlinked 2-hop pairs with valid Jaccard") {
    val edges = graft.ops.Similarity.knnGraph(
      spark.read.parquet(s"$sf/embeddings.parquet"), "vec_id", "embedding",
      k = 3, bits = 6, maxBucketSize = 1000)
      .select("src", "dst").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val linked = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
    val out = graft.SparkEntry.queries("sim_link_predict")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (a, c, j) = (r.getLong(0), r.getLong(1), r.getDouble(3))
      assert(a < c, s"pair not ordered: $r")
      assert(!linked.contains((a, c)), s"predicted pair already linked: $r")
      assert(j > 0.0 && j <= 1.0, s"Jaccard outside (0,1]: $r")
    }
  }

  test("MMR re-rank: pick 1 is the relevance argmax, picks are distinct per query") {
    val out = graft.SparkEntry.queries("sim_mmr_rerank")(spark, sf).collect()
    val byQ = out.groupBy(_.getLong(0))
    assert(byQ.nonEmpty)
    byQ.foreach { case (qid, rows) =>
      assert(rows.map(_.getLong(3)).sorted.toSeq == (1L to 5L),
        s"ranks not 1..5 for query $qid")
      assert(rows.map(_.getLong(1)).distinct.length == 5,
        s"duplicate picks for query $qid")
      val first = rows.find(_.getLong(3) == 1L).get
      val maxRel = rows.map(_.getDouble(2)).max
      assert(first.getDouble(2) == maxRel ||
        rows.count(_.getDouble(2) == maxRel) > 1,
        s"pick 1 must be the relevance argmax for query $qid")
    }
  }

  test("novelty: valid rates, exact duplicates score zero") {
    val nov = graft.SparkEntry.queries("text_novelty")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(nov.nonEmpty)
    nov.foreach { case (id, n, u, v) =>
      assert(u <= n, s"unique grams exceed distinct grams for doc $id")
      assert(v >= 0.0 && v <= 1.0, s"novelty outside [0,1] for doc $id")
    }
    // Docs sharing their exact text (the corpus has literal duplicates)
    // must both score 0 — every gram they have, the twin has too.
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val twins = docs.groupBy("text")
      .agg(collect_list("doc_id").as("ids"), count(lit(1)).as("c"))
      .where(col("c") >= 2)
      .selectExpr("explode(ids) AS doc_id").collect().map(_.getLong(0)).toSet
    if (twins.nonEmpty) {
      val novMap = nov.map(t => t._1 -> t._4).toMap
      twins.foreach(id => assert(novMap(id) == 0.0,
        s"doc $id has an exact twin but novelty ${novMap(id)}"))
    }
  }

  test("dq audits: tie-out partitions orders, shapes collapse, closed forms reconcile") {
    val q = graft.SparkEntry.queries

    // consistency: statuses partition the orders table; the dollar diff
    // is exactly the integer diff re-scaled (no second float path)
    val cons = q("dq_consistency")(spark, sf).collect()
    val nOrders = spark.read.parquet(s"$sf/orders.parquet").count()
    assert(cons.map(_.getAs[Long]("n_orders")).sum == nOrders)
    cons.foreach { r =>
      assert(r.getAs[Long]("n_mismatched") + r.getAs[Long]("n_no_lines")
        <= r.getAs[Long]("n_orders"))
      assert(r.getAs[Double]("max_abs_diff")
        == r.getAs[Long]("max_abs_diff_u").toDouble / 1.0e6)
    }

    // shapes: the uniform generator columns collapse to ONE shape each
    // (c_name = 'Customer#000000000' → 'A#9'); shares sum to 1 per column
    val shapes = q("dq_value_shapes")(spark, sf).collect()
    val byCol = shapes.groupBy(_.getAs[String]("column"))
    assert(byCol("c_name").map(_.getAs[String]("shape")).toSet == Set("A#9"))
    // priorities are '1-URGENT' … '4-NOT SPECIFIED' → exactly the two
    // digit-dash-word shapes, nothing unparsed
    assert(byCol("o_orderpriority").map(_.getAs[String]("shape")).toSet
      == Set("9-A", "9-A A"))
    byCol.values.foreach { rows =>
      assert(math.abs(rows.map(_.getAs[Double]("share")).sum - 1.0) < 1e-9)
      rows.foreach { r =>
        // the example really has the claimed shape
        val reshaped = r.getAs[String]("example")
          .replaceAll("[A-Za-z]+", "A").replaceAll("[0-9]+", "9")
        assert(reshaped == r.getAs[String]("shape"))
      }
    }

    // drift: the exact-rational tv_total reconciles with the float
    // per-bin fold, and both cohort count columns cover all orders
    val drift = q("dq_drift")(spark, sf).collect()
    assert(drift.map(r => r.getAs[Long]("n_a") + r.getAs[Long]("n_b")).sum
      == nOrders)
    val tv = drift.head.getAs[Double]("tv_total")
    assert(tv >= 0.0 && tv <= 1.0)
    assert(math.abs(tv - drift.map(_.getAs[Double]("tv_term")).sum) < 1e-9)

    // class balance: closed-form chi2_total ≡ the expanded per-label sum
    val bal = q("dq_class_balance")(spark, sf).collect()
    val chiTot = bal.head.getAs[Double]("chi2_total")
    assert(math.abs(chiTot - bal.map(_.getAs[Double]("chi2_term")).sum) < 1e-6)
    assert(bal.map(_.getAs[Long]("n_rows")).sum
      == spark.read.parquet(s"$sf/embeddings.parquet").count())
  }

  test("binary quantization: mask packing pinned, Hamming shortlist reranks to a valid top-5") {
    // packing convention on a hand vector: strict sign (> 0) — a 0.0f
    // dim is NOT set; dim 0 → bit 0 of mask_lo, dim 33 → bit 1 of mask_hi
    val v = Array.fill(64)(-1.0f)
    v(0) = 1f; v(33) = 0.5f; v(5) = 0f
    val m = Similarity.binaryMasks(
      Seq((1L, v.toSeq)).toDF("vec_id", "embedding"), "embedding").head()
    assert(m.getAs[Long]("mask_lo") == 1L)
    assert(m.getAs[Long]("mask_hi") == 2L)
    assert(m.getAs[Long]("n_bits") == 2L)

    val knn = graft.SparkEntry.queries("sim_binary_knn")(spark, sf).collect()
    assert(knn.nonEmpty)
    knn.groupBy(_.getAs[Long]("qid")).values.foreach { rows =>
      assert(rows.map(_.getAs[Long]("rank")).sorted.toSeq
        == (1L to rows.size).toSeq)
      rows.foreach(r => assert(r.getAs[Long]("hamming") >= 0
        && r.getAs[Long]("hamming") <= 64))
      val byRank = rows.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("cos"))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b },
        "rerank must order by exact cosine, not Hamming")
    }

    val rec = graft.SparkEntry.queries("sim_binary_recall")(spark, sf).collect()
    assert(rec.nonEmpty)
    rec.foreach { r =>
      assert(r.getAs[Long]("k") == 5L)
      val x = r.getAs[Double]("recall")
      assert(x >= 0.0 && x <= 1.0)
    }

    // maintained mask sidecar: full top-5 per query, deleted ids gone
    val au = graft.SparkEntry.queries("sim_binary_after_update")(spark, sf)
      .collect()
    assert(au.nonEmpty)
    au.groupBy(_.getAs[Long]("qid")).values
      .foreach(rows => assert(rows.length == 5))
    au.foreach(r => assert(r.getAs[Long]("vec_id") % 9 != 4,
      "a deleted vector survived in the maintained index"))
  }

  test("binary IVF: mask scan prunes to probed cluster partitions; recall tracks the flat scan") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val cents = emb.where($"vec_id" < 8)
      .select($"vec_id".as("cid"), $"embedding")
    val queries = emb.where($"vec_id" % 100 === 0)
      .select($"vec_id".as("qid"), $"embedding")
    val idx = java.nio.file.Files.createTempDirectory("binIvf").toString + "/masks"
    Similarity.writeIvfIndex(
      Similarity.binaryMasks(
          Similarity.ivfAssign(emb, cents, "vec_id", "embedding", "cid"),
          "embedding")
        .select($"vec_id", $"mask_lo", $"mask_hi", $"cluster"), idx)
    val nClusters = spark.read.parquet(idx).select("cluster").distinct().count()
    assert(nClusters >= 4, s"fixture should spread clusters, got $nClusters")

    val out = Similarity.binaryIvfKnn(spark, idx, emb, queries, cents,
      "vec_id", "embedding", "qid", "cid", k = 5, shortlist = 20, nprobe = 2)
    out.collect()

    // the query's OWN executed plan opens only probed cluster= partitions
    // of the mask sidecar (static partition pruning, not a full mask
    // scan) — asserted on a ONE-query batch so most clusters go unprobed
    val q1 = queries.where($"qid" === 0L)
    val out1 = Similarity.binaryIvfKnn(spark, idx, emb, q1, cents,
      "vec_id", "embedding", "qid", "cid", k = 5, shortlist = 20, nprobe = 2)
    out1.collect()
    val probed = Similarity.probedClusters(q1, cents,
      "qid", "embedding", "cid", nprobe = 2).toSet
    assert(probed.size < nClusters, "need an unprobed cluster for the assert to bite")
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val maskFiles = scala.collection.mutable.Buffer[String]()
    def walk(p: SparkPlan): Unit = p.foreach {
      case f: FileSourceScanExec
          if f.relation.location.rootPaths.exists(_.toString.contains("binIvf")) =>
        maskFiles ++= f.selectedPartitions.toPartitionArray.map(_.urlEncodedPath)
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => walk(q.plan)
      case _ =>
    }
    walk(out1.queryExecution.executedPlan)
    assert(maskFiles.nonEmpty, "expected a mask-sidecar scan in the plan")
    assert(maskFiles.forall(f => probed.exists(c => f.contains(s"cluster=$c"))),
      s"mask scan must open probed partitions only:\n${maskFiles.mkString("\n")}")

    // the sharp law: probing ALL clusters reproduces the flat binary
    // scan EXACTLY (same candidate set → same shortlist → same rerank)
    val flat = Similarity.binaryKnn(emb, queries, "vec_id", "embedding",
      "qid", k = 5, shortlist = 20)
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"),
        r.getAs[Long]("hamming"), r.getAs[Long]("rank"))).toSet
    val outAll = Similarity.binaryIvfKnn(spark, idx, emb, queries, cents,
      "vec_id", "embedding", "qid", "cid", k = 5, shortlist = 20,
      nprobe = nClusters.toInt)
    assert(asSet(outAll) == asSet(flat),
      "full-probe binary IVF must equal the flat binary scan")
    // nprobe=2 of 8: recall vs flat is the IVF trade — record a floor
    // (the fixture's arbitrary first-8 centroids are a weak quantizer;
    // 0.36 observed, widen nprobe to buy recall back)
    val rec = Similarity.recallAtK(flat, out, "qid", "vec_id")
      .agg(avg($"recall")).head().getDouble(0)
    assert(rec >= 0.2, s"nprobe=2 recall vs flat scan collapsed: $rec")
    // and the exact-rank contract holds per query
    out.collect().groupBy(_.getAs[Long]("qid")).values.foreach { rows =>
      assert(rows.map(_.getAs[Long]("rank")).sorted.toSeq == (1L to rows.size).toSeq)
    }
  }

  test("k-center||: cover radius within 2x of the sequential greedy; k picks exactly") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    def radius(picks: org.apache.spark.sql.DataFrame): Double = {
      val cents = broadcast(
        emb.join(picks.select("vec_id"), Seq("vec_id"), "left_semi")
          .select($"vec_id".as("cid"), $"embedding".as("__cv")))
      emb.crossJoin(cents)
        .select($"vec_id",
          (lit(1.0) - graft.functions.VectorFunctions.cosine(
            $"embedding", $"__cv")).as("d"))
        .groupBy("vec_id").agg(min($"d").as("mind"))
        .agg(max($"mind")).head().getDouble(0)
    }
    val greedy = Similarity.kCenterCoreset(emb, "vec_id", "embedding", k = 8)
    val par = Similarity.kCenterScalable(emb, "vec_id", "embedding",
      k = 8, oversample = 8, passes = 2)
    assert(par.count() == 8)
    assert(par.select("vec_id").distinct().count() == 8, "picks must be distinct")
    val (rg, rp) = (radius(greedy), radius(par))
    assert(rp <= 2.0 * rg + 1e-12,
      s"k-center|| cover radius $rp must stay within 2x of greedy $rg")
    // steps are a permutation-free greedy sequence: maximin non-increasing
    val dists = par.orderBy("step").collect().drop(1)
      .map(_.getAs[Double]("maximin_dist"))
    assert(dists.zip(dists.tail).forall { case (a, b) => a >= b - 1e-12 },
      "candidate-set maximin must be non-increasing over picks")
  }

  test("gatedBroadcast: a query side above the cap loses the forced hint, output identical") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val queries = emb.where($"vec_id" % 100 === 0)
      .select($"vec_id".as("qid"), $"embedding")
    def run() = Similarity.bruteForceKnn(emb, queries,
      "vec_id", "embedding", "qid", k = 3)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"),
        r.getAs[Long]("rank"))).toSet
    // below the cap (default 100k): the hint sticks — broadcast join
    val below = run()
    val belowRows = rows(below)
    assert(below.queryExecution.executedPlan.toString.contains("Broadcast"),
      "small query batch must keep the broadcast fast path")
    // force the batch "above" the cap and disable AQE's own (size-safe)
    // broadcast: the forced hint must be GONE — the join degrades to a
    // cartesian/shuffle plan instead of OOMing executors at real scale
    val prevAuto = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set(Similarity.BroadcastRowCapKey, "2")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val above = run()
      val aboveRows = rows(above)
      above.collect()
      val plan = above.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastExchange"),
        s"above-cap query side must not be force-broadcast:\n$plan")
      assert(aboveRows == belowRows, "gating must not change results")
    } finally {
      spark.conf.unset(Similarity.BroadcastRowCapKey)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevAuto)
    }
  }

  test("privacy/post-ingest audits: k-anonymity partitions rows; lake suite sees feed violations") {
    // the post-ingest suite runs against the MERGED lake: the change
    // feed writes 'X'/'Y' statuses, so the in_set rule must now FAIL
    // with violations == the surviving updated keys, while not_null and
    // uniqueness still pass (the merge keeps one row per key)
    val suite = graft.SparkEntry.queries("dq_suite_after_ingest")(spark, sf)
      .collect().map(r => r.getAs[String]("rule") ->
        (r.getAs[Long]("violations"), r.getAs[Boolean]("pass"))).toMap
    assert(!suite("in_set:o_orderstatus")._2
      && suite("in_set:o_orderstatus")._1 > 0,
      "post-ingest audit must catch the feed's out-of-contract statuses")
    assert(suite("not_null:o_custkey") == ((0L, true)))
    assert(suite("unique:o_orderkey")._2, "merge must keep one row per key")

    // candidate keys: the PK is discovered, a 2-value column is not,
    // a composite never beats the table row count
    val ck = graft.SparkEntry.queries("dq_candidate_keys")(spark, sf)
      .collect().map(r => r.getAs[String]("column_set") ->
        (r.getAs[Long]("n_distinct"), r.getAs[Boolean]("is_key"))).toMap
    assert(ck("o_orderkey")._2, "the primary key must be discovered")
    assert(!ck("o_orderstatus")._2 && ck("o_orderstatus")._1 <= 3)
    assert(ck("o_custkey,o_orderdate")._1 >= ck("o_custkey")._1)

    val ka = graft.SparkEntry.queries("dq_k_anonymity")(spark, sf).collect()
    val nCust = spark.read.parquet(s"$sf/customer.parquet").count()
    assert(ka.map(_.getAs[Long]("n_rows")).sum == nCust)
    val kMin = ka.head.getAs[Long]("k_min")
    assert(ka.map(_.getAs[Long]("n_rows")).min == kMin)
    ka.foreach(r => assert(r.getAs[Boolean]("below_k")
      == (r.getAs[Long]("n_rows") < 5L)))
    val risk = ka.head.getAs[Double]("risk_share")
    assert(risk >= 0.0 && risk <= 1.0)
    assert(math.abs(risk - ka.filter(_.getAs[Boolean]("below_k"))
      .map(_.getAs[Long]("n_rows")).sum.toDouble / nCust) < 1e-12)
  }

  test("feature matrix and RA link prediction: frame laws hold, non-edges only") {
    val fm = graft.SparkEntry.queries("events_feature_matrix")(spark, sf).collect()
    assert(fm.length == spark.read.parquet(s"$sf/events.parquet").count())
    fm.foreach { r =>
      val cnt = r.getAs[Long]("rcnt5")
      assert(cnt >= 1 && cnt <= 5)
      assert(r.getAs[Double]("rmean5")
        == r.getAs[Double]("rsum5") / cnt.toDouble)
      if (!r.isNullAt(r.fieldIndex("gap_us")))
        assert(r.getAs[Long]("gap_us") >= 0L, "user order must be time-monotone")
      // lag1 missing exactly when the rolling window holds only this row
      assert(r.isNullAt(r.fieldIndex("lag1")) == (cnt == 1L))
    }

    val g = Similarity.knnGraph(
      spark.read.parquet(s"$sf/embeddings.parquet"), "vec_id", "embedding",
      k = 3, bits = 6, maxBucketSize = 1000)
    val edges = g.select("src", "dst").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ra = graft.SparkEntry.queries("sim_link_ra")(spark, sf).collect()
    assert(ra.length == 20)
    ra.foreach { r =>
      val (a, c) = (r.getAs[Long]("a"), r.getAs[Long]("c"))
      assert(!edges.contains((a, c)) && !edges.contains((c, a)),
        "predicted links must be non-edges")
      assert(r.getAs[Double]("ra") > 0.0 && r.getAs[Long]("n_common") >= 1L)
    }
  }

  test("bot score and token runs: invariants hold and a hand recompute agrees") {
    val bots = graft.SparkEntry.queries("events_bot_score")(spark, sf).collect()
    assert(bots.nonEmpty)
    val nEvents = spark.read.parquet(s"$sf/events.parquet").count()
    assert(bots.map(_.getAs[Long]("n_events")).sum == nEvents)
    bots.foreach { r =>
      val simpson = r.getAs[Double]("simpson")
      val k = r.getAs[Long]("n_types")
      assert(simpson >= 1.0 / k - 1e-12 && simpson <= 1.0)
      assert(r.getAs[Boolean]("suspicious")
        == (r.getAs[Long]("peak_per_min") >= 2L || simpson >= 0.22))
    }

    val runs = graft.SparkEntry.queries("text_token_runs")(spark, sf).collect()
    runs.foreach { r =>
      assert(r.getAs[Long]("max_run") >= 1L)
      assert(r.getAs[Long]("run3_tokens") <= r.getAs[Long]("n_tokens"))
      val share = r.getAs[Double]("run3_share")
      assert(share >= 0.0 && share <= 1.0)
    }
    // hand recompute on the doc holding the global max run
    val top = runs.maxBy(_.getAs[Long]("max_run"))
    val text = spark.read.parquet(s"$sf/documents.parquet")
      .where(col("doc_id") === top.getAs[Long]("doc_id"))
      .head().getAs[String]("text")
    val toks = text.trim.split("\\s+")
    var best = 1; var cur = 1
    for (i <- 1 until toks.length) {
      if (toks(i) == toks(i - 1)) { cur += 1; best = math.max(best, cur) }
      else cur = 1
    }
    assert(best.toLong == top.getAs[Long]("max_run"),
      s"hand recompute disagrees on doc ${top.getAs[Long]("doc_id")}")
  }

  test("k-center coreset: greedy radius is non-increasing and covers the corpus") {
    val picks = graft.SparkEntry.queries("sim_coreset_kcenter")(spark, sf)
      .collect().sortBy(_.getAs[Long]("step"))
    assert(picks.length == 8)
    assert(picks.map(_.getAs[Long]("vec_id")).distinct.length == 8)
    assert(picks.head.isNullAt(picks.head.fieldIndex("maximin_dist")))
    val radii = picks.tail.map(_.getAs[Double]("maximin_dist"))
    assert(radii.zip(radii.tail).forall { case (a, b) => a >= b },
      "each greedy pick's maximin distance must not exceed the previous")
    // k-center cover guarantee: every corpus point is within the LAST
    // pick's radius of some kept point
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val ids = picks.map(_.getAs[Long]("vec_id")).toSeq
    val centers = emb.where(col("vec_id").isin(ids: _*))
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val uncovered = emb.crossJoin(broadcast(centers))
      .groupBy("vec_id")
      .agg(min(lit(1.0) - graft.functions.VectorFunctions.cosine(
        col("embedding"), col("cv"))).as("d"))
      .where(col("d") > radii.last + 1e-12)
    assert(uncovered.isEmpty, "a corpus point escaped the coreset radius")

    // weights: a partition of the corpus over the 8 picks, radius bounded
    val ws = graft.SparkEntry.queries("sim_coreset_weights")(spark, sf).collect()
    assert(ws.length == 8)
    assert(ws.map(_.getAs[Long]("weight")).sum == emb.count())
    assert(ws.map(_.getAs[Double]("max_dist")).max <= radii.last + 1e-12)
  }

  test("clustering coefficient: triangle graph = 1.0, path interior = 0.0, star center = 0.0") {
    // triangle 1-2-3 with a pendant 4 and a 2-path 5-6-7 (both directions,
    // as mutualKnn emits)
    val und = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (5L, 6L), (6L, 7L))
    val g = (und ++ und.map(_.swap)).toDF("src", "dst")
    val got = Similarity.clusteringCoef(g).collect()
      .map(r => r.getAs[Long]("node") ->
        (r.getAs[Long]("degree"), r.getAs[Long]("n_tri"), r.getAs[Double]("coef"))).toMap
    assert(got(1L) == ((2L, 1L, 1.0)))
    assert(got(2L) == ((2L, 1L, 1.0)))
    assert(got(3L) == ((3L, 1L, 1.0 / 3.0)))
    assert(got(4L) == ((1L, 0L, 0.0)))   // degree < 2 → defined as 0
    assert(got(6L) == ((2L, 0L, 0.0)))   // path interior: open wedge
    // corpus query: bounds + the degree/triangle consistency law
    val q = graft.SparkEntry.queries("sim_clustering_coef")(spark, sf).collect()
    assert(q.nonEmpty)
    q.foreach { r =>
      val c = r.getAs[Double]("coef")
      assert(c >= 0.0 && c <= 1.0)
      assert(r.getAs[Long]("n_tri")
        <= r.getAs[Long]("degree") * (r.getAs[Long]("degree") - 1) / 2)
    }
  }
}
