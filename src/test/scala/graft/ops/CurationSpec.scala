package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog", "web"),
    (2L, "the quick brown fox jumps over the lazy dog", "web"),
    (3L, "pack my box with five dozen liquor jugs", "web"),
    (4L, "code code code", "code"),
    (5L, "def main args unit", "code"),
    (6L, "unweighted source text", "junk")
  ).toDF("doc_id", "text", "source")

  test("domainMix: respects per-source budgets, drops unweighted sources") {
    val out = Curation.domainMix(docs, "doc_id", "text", "source",
      Map("web" -> 0.5, "code" -> 0.5), totalTokenBudget = 16L)
    val rows = out.collect()
    // junk has no weight → excluded entirely
    assert(!rows.exists(_.getAs[String]("source") == "junk"))
    // every kept doc STARTED under its source budget (over-fill ≤ 1 doc)
    rows.foreach { r =>
      assert(r.getAs[Long]("cum_tokens") - r.getAs[Long]("n_tokens") < 8L)
    }
    // deterministic: same seed → same selection
    val again = Curation.domainMix(docs, "doc_id", "text", "source",
      Map("web" -> 0.5, "code" -> 0.5), totalTokenBudget = 16L).collect()
    assert(rows.map(_.getLong(1)).sorted.sameElements(again.map(_.getLong(1)).sorted))
  }

  test("domainMix: budget large enough keeps everything weighted") {
    val out = Curation.domainMix(docs, "doc_id", "text", "source",
      Map("web" -> 0.5, "code" -> 0.5), totalTokenBudget = 1000L)
    assert(out.count() == 5) // all but junk
  }

  test("domainMix leaks no cache entries (sliceOf path persists nothing)") {
    spark.catalog.clearCache()
    Curation.domainMix(docs, "doc_id", "text", "source",
      Map("web" -> 0.5, "code" -> 0.5), totalTokenBudget = 16L).collect()
    assert(spark.sharedState.cacheManager.isEmpty,
      "library callers must not inherit cache entries from domainMix")
  }

  test("qualityFloor: per-domain bottom-fraction drop, exact rank boundary") {
    val df = Seq(
      ("a", 1L, 0.1), ("a", 2L, 0.2), ("a", 3L, 0.3), ("a", 4L, 0.4), ("a", 5L, 0.5),
      ("b", 6L, 0.9), ("b", 7L, 0.8),
      ("c", 8L, 0.5)).toDF("source", "doc_id", "quality")
    val kept = Curation.qualityFloor(df, "source", "quality", "doc_id", 0.2)
      .select("doc_id").as[Long].collect().toSet
    // a: ranks 0/.25/.5/.75/1 → doc 1 (rank 0) drops; b: 7 at rank 0 drops;
    // c: a single-doc domain has percent_rank 0 and drops — rank floors
    // are meaningful only for domains with ≥ 1/dropFrac docs (documented)
    assert(kept == Set(2L, 3L, 4L, 5L, 6L))
    // dropFrac 0 keeps everything (0 >= 0 includes single-doc domains)
    assert(Curation.qualityFloor(df, "source", "quality", "doc_id", 0.0)
      .count() == 8L)
  }

  test("qualityFloorByCutoff: data-value boundary, superset of the rank floor, sortless") {
    val df = Seq(
      ("a", 1L, 0.1), ("a", 2L, 0.2), ("a", 3L, 0.3), ("a", 4L, 0.4), ("a", 5L, 0.5),
      ("b", 6L, 0.9), ("b", 7L, 0.8),
      ("c", 8L, 0.5)).toDF("source", "doc_id", "quality")
    val out = Curation.qualityFloorByCutoff(df, "source", "quality", 0.2)
    val kept = out.select("doc_id").as[Long].collect().toSet
    // a (n=5, f=0.2): cutoff = smallest q with cume_dist >= 0.2 = 0.1
    //   (cume 1/5) — the cutoff doc itself survives, so ALL of a is kept;
    // b (n=2): cutoff = 0.8 (cume 1/2 >= 0.2) → both kept;
    // c (n=1): cutoff = 0.5 → kept (single-doc domains survive, unlike
    //   the rank floor which drops them at any dropFrac > 0)
    assert(kept == Set(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L))
    // the kept set always contains the rank floor's (percent_rank <
    // cume_dist pointwise below the top rank)
    val rankKept = Curation.qualityFloor(df, "source", "quality", "doc_id", 0.2)
      .select("doc_id").as[Long].collect().toSet
    assert(rankKept.subsetOf(kept))
    // the cutoff is a data value of its own domain
    out.collect().foreach { r =>
      assert(Set(0.1, 0.2, 0.3, 0.4, 0.5, 0.8, 0.9).contains(r.getAs[Double]("q_cutoff")))
    }
    // the scale claim: NO sort, NO window anywhere in the physical plan —
    // a skew-dominated domain costs sketch merges, not a per-domain sort
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("SortExec") && !plan.contains("Window"),
      s"cutoff floor must stay sortless:\n$plan")
    // a larger fraction drops the bottom: a (f=0.5) → cutoff 0.3
    val tight = Curation.qualityFloorByCutoff(
      df.where(col("source") === "a"), "source", "quality", 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(tight == Set(3L, 4L, 5L))
  }

  test("temperatureWeights: sqrt-scaled, normalized, budgets floor to longs") {
    val out = Curation.temperatureWeights(docs, "text", "source",
      totalTokenBudget = 1000L).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(3)))).toMap
    assert(out.keySet == Set("web", "code", "junk"))
    // weights normalize to 1 (exactly: the residual is one fold's rounding)
    val wsum = out.values.map(_._2).sum
    assert(math.abs(wsum - 1.0) < 1e-12)
    // sqrt tempering: the small domain's weight exceeds its token share
    val totTokens = out.values.map(_._1).sum.toDouble
    val (jn, jw, _) = out("junk")
    assert(jw > jn / totTokens, "sqrt must up-weight the smallest domain")
    // budgets are floors of weight * total
    out.values.foreach { case (_, w, b) => assert(b == math.floor(w * 1000L).toLong) }
    // deterministic across runs
    val again = Curation.temperatureWeights(docs, "text", "source", 1000L)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(3)))).toMap
    assert(again == out)
  }

  test("domainMixBudgets ≡ domainMix when budgets match; composes with temperatureWeights") {
    val viaMap = Curation.domainMix(docs, "doc_id", "text", "source",
      Map("web" -> 0.5, "code" -> 0.5), totalTokenBudget = 16L)
      .collect().map(_.toString).sorted.toSeq
    val budgets = Seq(("web", 8L), ("code", 8L)).toDF("source", "token_budget")
    val viaDf = Curation.domainMixBudgets(docs, "doc_id", "text", "source", budgets)
      .collect().map(_.toString).sorted.toSeq
    assert(viaDf == viaMap)
    // the composition point: tempered budgets flow in as a DataFrame with
    // no driver collect, and every budgeted source is represented
    val tempered = Curation.domainMixBudgets(docs, "doc_id", "text", "source",
      Curation.temperatureWeights(docs, "text", "source", 1000L))
    assert(tempered.select("source").distinct().count() == 3)
  }

  test("shuffleShard: total order is a permutation, stable under re-run") {
    val out = Curation.shuffleShard(docs, "doc_id", numShards = 3)
    val rows = out.collect()
    assert(rows.length == 6)
    assert(rows.map(_.getAs[Long]("shard")).forall(s => s >= 0 && s < 3))
    // positions are 1..count(shard) within each shard
    rows.groupBy(_.getAs[Long]("shard")).foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Long]("pos")).sorted.sameElements(1L to rs.length))
    }
    val again = Curation.shuffleShard(docs, "doc_id", numShards = 3).collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet ==
      again.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet)
    // a different seed produces a different layout (with 6 docs over
    // 3 shards the probability of identical assignment is ~1/729)
    val reseeded = Curation.shuffleShard(docs, "doc_id", numShards = 3, seed = "other").collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSet !=
      reseeded.map(r => (r.getLong(0), r.getLong(1))).toSet)
  }

  test("bigramLmScore: duplicate docs score identically; boilerplate beats noise") {
    val out = Curation.bigramLmScore(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getAs[Long]("n_bigrams"), r.getAs[Double]("lm_score"))).toMap
    assert(out(1L) == out(2L)) // exact dup → identical score
    // "code code code" repeats one bigram 2× (plus counts from doc 4 only)
    // → its conditional probability dominates any unique bigram's
    assert(out(4L)._2 > out(3L)._2)
    assert(out.values.forall { case (n, p) => n == 0 || (p > 0.0 && p <= 1.0) })
  }

  test("stupidBackoffScore: all three backoff tiers exact on a hand fixture") {
    // train: "a b c d", "b c x" → N=7; uni a1 b2 c2 d1 x1;
    // bi "a b"1 "b c"2 "c d"1 "c x"1; tri "a b c"1 "b c d"1 "b c x"1
    val train = Seq((100L, "a b c d"), (101L, "b c x")).toDF("doc_id", "text")
    val score = Seq(
      (1L, "a b c"), // seen trigram:        ct/c12 = 1/1            = 1.0
      (2L, "x b c"), // bigram backoff:      0.4 · c("b c")/c(b)     = 0.4
      (3L, "x y c"), // unigram backoff:     0.4² · c(c)/N           = 0.16·2/7
      (4L, "x y z"), // OOV tail word:       0.4² · 0/N              = 0.0
      (5L, "a b")    // < 3 tokens → n_trigrams = 0, score 0.0
    ).toDF("doc_id", "text")
    val out = Curation.stupidBackoffScore(score, train, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_trigrams"), r.getAs[Double]("sbo_score"))).toMap
    assert(out(1L) == ((1L, 1.0)))
    assert(out(2L) == ((1L, 0.4 * (2.0 / 2.0))))
    assert(out(3L) == ((1L, 0.4 * 0.4 * (2.0 / 7.0))))
    assert(out(4L) == ((1L, 0.0)))
    assert(out(5L) == ((0L, 0.0)))
  }

  test("parallelRunningSum ≡ single-window running sum on a skewed fixture") {
    import org.apache.spark.sql.expressions.Window
    // 90% of rows in one domain — the shape that kills the naive window
    val rows = (1L to 200L).map { i =>
      (i, if (i <= 180) "web" else s"src${i % 4}", (i * 37 % 100) + 1)
    }
    val df = rows.toDF("id", "dom", "v")
    val naive = df.withColumn("cum",
      sum($"v").over(Window.partitionBy("dom").orderBy("v", "id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("id", "dom", "v", "cum")
    val par = Curation.parallelRunningSum(df, Seq("dom"), Seq("v", "id"), "v", "cum")
      .select("id", "dom", "v", "cum")
    assert(par.collect().toSet == naive.collect().toSet)
    // the running-sum window partitions by (dom, slice), not dom alone —
    // one dominant domain spreads over many tasks
    val plan = par.queryExecution.executedPlan.toString
    assert(plan.contains("__slice"), s"expected sliced window in:\n$plan")
  }

  test("parallelRunningSum deterministic sliceOf ≡ sampled-range slicing") {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.TextFunctions.hash60
    // order leads with a uniform 60-bit hash, like domainMix's __key
    val df = (1L to 300L).map { i => (i, if (i <= 270) "web" else "code", i % 7 + 1) }
      .toDF("id", "dom", "v")
      .withColumn("__key", hash60(concat(lit("s:"), $"id".cast("string"))))
    val naive = df.withColumn("cum",
      sum($"v").over(Window.partitionBy("dom").orderBy("__key", "id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("id", "dom", "v", "cum")
    val det = Curation.parallelRunningSum(df, Seq("dom"), Seq("__key", "id"),
      "v", "cum",
      sliceOf = Some { n =>
        val width = ((1L << 60) + n - 1) / n
        expr(s"__key div ${width}L")
      }).select("id", "dom", "v", "cum")
    assert(det.collect().toSet == naive.collect().toSet)
    // deterministic slicing needs no range exchange: the only exchanges are
    // the (part, slice) hash for the window and the tiny slice-sum agg
    val plan = det.queryExecution.executedPlan.toString
    assert(!plan.contains("rangepartitioning"), s"unexpected range exchange:\n$plan")
    // the cache is advisory here: clearing it must not change the answer
    spark.catalog.clearCache()
    assert(det.collect().toSet == naive.collect().toSet)
  }

  test("domainMix is sliced: plan shows >1 window partition key per domain") {
    val out = Curation.domainMix(docs, "doc_id", "text", "source",
      Map("web" -> 0.5, "code" -> 0.5), totalTokenBudget = 1000L)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("__slice"), s"expected sliced prefix sum in:\n$plan")
  }

  test("dsirScores: target-like docs outrank off-target, deterministic") {
    val target = Seq(
      (100L, "physics energy momentum quantum field theory"),
      (101L, "quantum field energy states physics momentum")
    ).toDF("doc_id", "text")
    val raw = Seq(
      (1L, "quantum field theory energy momentum physics"), // target-like
      (2L, "buy cheap pills online casino winner click"),   // off-target
      (3L, "physics energy and also casino pills")          // mixed
    ).toDF("doc_id", "text")
    val out = Curation.dsirScores(raw, target, "doc_id", "text", buckets = 256)
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("dsir_score")).toMap
    assert(out(1L) > out(3L) && out(3L) > out(2L),
      s"expected target-like > mixed > off-target, got $out")
    val again = Curation.dsirScores(raw, target, "doc_id", "text", buckets = 256)
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("dsir_score")).toMap
    assert(out == again)
  }

  test("splitAssign: exhaustive, reproducible, stable under corpus growth") {
    val fr = Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125)
    val base = (1L to 400L).toDF("doc_id")
    val a = Curation.splitAssign(base, "doc_id", fr)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a.values.toSet.subsetOf(Set("train", "val", "test")))
    // roughly proportional (hash uniformity; generous bounds)
    assert(a.values.count(_ == "train") > 240)
    // growth stability: appending docs never reassigns existing ones
    val grown = Curation.splitAssign((1L to 800L).toDF("doc_id"), "doc_id", fr)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert((1L to 400L).forall(i => grown(i) == a(i)))
    // a different seed reshuffles
    val reseeded = Curation.splitAssign(base, "doc_id", fr, seed = "other")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(reseeded != a)
  }

  test("parallelRunningSum property: ≡ single window for arbitrary skew/ties/slices") {
    import org.apache.spark.sql.expressions.Window
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val genRows: Gen[(List[(Long, String, Long)], Int)] = for {
      n <- Gen.choose(1, 120)
      rows <- Gen.listOfN(n, for {
        dom <- Gen.frequency(8 -> Gen.const("web"), 1 -> Gen.const("code"),
          1 -> Gen.oneOf("a", "b", "c"))
        v <- Gen.choose(0L, 5L) // tiny range → heavy order-key ties
      } yield (dom, v))
      slices <- Gen.choose(1, 7)
    } yield (rows.zipWithIndex.map { case ((d, v), i) => (i.toLong, d, v) }, slices)
    val prop = Prop.forAll(genRows) { case (rows, slices) =>
      val df = rows.toDF("id", "dom", "v")
      val naive = df.withColumn("cum",
        sum($"v").over(Window.partitionBy("dom").orderBy("v", "id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select("id", "dom", "v", "cum").collect().map(_.toString).toSet
      val par = Curation.parallelRunningSum(df, Seq("dom"), Seq("v", "id"),
        "v", "cum", numSlices = slices)
        .select("id", "dom", "v", "cum").collect().map(_.toString).toSet
      par == naive
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(30).withWorkers(1), prop)
    assert(res.passed, res.status.toString)
  }

  test("bigramLmScore: sub-2-token docs emit n_bigrams=0, score 0") {
    val tiny = Seq((1L, "word"), (2L, ""), (3L, "two tokens")).toDF("doc_id", "text")
    val out = Curation.bigramLmScore(tiny, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("n_bigrams")).toMap
    assert(out(1L) == 0L && out(2L) == 0L && out(3L) == 1L)
  }
}
