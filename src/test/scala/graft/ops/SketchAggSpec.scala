package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable sketches: HLL accuracy + MAX-merge law, CMS one-sided
  * error + SUM-merge law. */
class SketchAggSpec extends SparkSpec {
  import spark.implicits._

  private lazy val terms = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select(col("source"),
      explode(graft.functions.TextFunctions.tokens(col("text"))).as("term"))
    .localCheckpoint(true)

  private def regSet(df: DataFrame): Set[(String, Long, Long)] =
    df.select(col("source"), col("bucket"), col("register"))
      .as[(String, Long, Long)].collect().toSet

  test("HLL raw estimate lands within the expected error band past the small-range zone") {
    // controlled cardinalities: group g holds ids g*100000 .. +n(g)-1,
    // every value distinct, n >> m so the raw estimator is in its band
    val vals = Seq(("g2k", 2000L), ("g10k", 10000L)).map { case (g, n) =>
      spark.range(n).select(lit(g).as("source"),
        (col("id") + lit(g.hashCode.toLong.abs * 100000L)).cast("string").as("term"))
    }.reduce(_ unionByName _)
    val est = Sketches.hllDistinct(vals, Seq("source"), "term", m = 64)
      .select(col("source"), col("hll_distinct")).as[(String, Double)].collect().toMap
    // raw HLL at m=64: ~1.04/√64 ≈ 13% relative stddev — allow 3σ
    assert(math.abs(est("g2k") - 2000) / 2000.0 < 0.4, s"g2k: ${est("g2k")}")
    assert(math.abs(est("g10k") - 10000) / 10000.0 < 0.4, s"g10k: ${est("g10k")}")
    // small-range zone is DETECTABLE, not silently wrong: far fewer than
    // m buckets set flags the raw estimate as needing linear counting
    val small = Sketches.hllDistinct(terms.where(col("source") === "src1"),
      Seq("source"), "term", m = 64)
      .select(col("n_buckets_set")).as[Long].head()
    assert(small < 40, s"small group should leave most of m=64 buckets unset: $small")
  }

  test("HLL merge law: parity-split registers MAX-merge to the single-pass registers") {
    val whole = Sketches.hllRegisters(terms, Seq("source"), "term", m = 64)
    val h = abs(hash(col("term"))) % 3
    val parts = (0 until 3).map(i =>
      Sketches.hllRegisters(terms.where(h === i), Seq("source"), "term", m = 64))
    assert(regSet(Sketches.hllMerge(parts, Seq("source"))) == regSet(whole))
  }

  test("HLL sliding merge: full-span window ≡ global single pass; trailing=1 ≡ per-frame") {
    // deterministic frame assignment (token length mod 4) — any row
    // partition works, the merge law does the rest
    val framed = terms.withColumn("frame", (length(col("term")) % 4).cast("long"))
    val regs = Sketches.hllRegisters(framed, Seq("frame"), "term", m = 64)

    // a window spanning every frame ends (at the max frame) in the MAX-
    // merge of all frames = the single-pass global registers
    val wide = Sketches.hllSlidingEstimate(regs, "frame", trailing = 1000L, m = 64)
      .where(col("frame") === 3L).select(col("hll_distinct")).as[Double].head()
    val global = Sketches.hllDistinct(
      framed.withColumn("g", lit(0L)), Seq("g"), "term", m = 64)
      .select(col("hll_distinct")).as[Double].head()
    assert(wide == global, s"full-span sliding $wide != global $global")

    // trailing=1 degenerates to the per-frame estimates
    val one = Sketches.hllSlidingEstimate(regs, "frame", trailing = 1L, m = 64)
      .select(col("frame"), col("hll_distinct")).as[(Long, Double)].collect().toMap
    val perFrame = Sketches.hllEstimate(regs, Seq("frame"), m = 64)
      .select(col("frame"), col("hll_distinct")).as[(Long, Double)].collect().toMap
    assert(one == perFrame)
  }

  test("CMS estimates are one-sided and mostly exact at low load factor") {
    val cms = Sketches.cmsBuild(terms, "term", depth = 4, width = 1024)
    val watch = graft.functions.TextFunctions.StopwordsEn.toDF("term")
    val est = Sketches.cmsEstimate(cms, watch, "term", depth = 4, width = 1024)
      .as[(String, Long)].collect().toMap
    val exact = terms.join(watch, "term").groupBy("term").count()
      .as[(String, Long)].collect().toMap
    graft.functions.TextFunctions.StopwordsEn.foreach { t =>
      val truth = exact.getOrElse(t, 0L)
      assert(est(t) >= truth, s"$t: CMS under-estimated ${est(t)} < $truth")
    }
    // depth 4 × width 1024 over a few-thousand-term vocabulary: at least
    // one of the 4 rows should be collision-free for most watch terms
    val exactHits = est.count { case (t, e) => e == exact.getOrElse(t, 0L) }
    assert(exactHits >= est.size / 2, s"only $exactHits/${est.size} exact")
  }

  test("CMS merge law: parity-split cells SUM-merge to the single-pass sketch") {
    def cells(df: DataFrame): Set[(Int, Long, Long)] =
      df.select(col("row").cast("int"), col("col"), col("cnt"))
        .as[(Int, Long, Long)].collect().toSet
    val whole = Sketches.cmsBuild(terms, "term", depth = 4, width = 256)
    val h = abs(hash(col("term"), col("source"))) % 4
    val parts = (0 until 4).map(i =>
      Sketches.cmsBuild(terms.where(h === i), "term", depth = 4, width = 256))
    assert(cells(Sketches.cmsMerge(parts)) == cells(whole))
  }

  test("KMV merge law: parity-split bottom-k sketches merge to the single-pass sketch") {
    def rows(df: DataFrame): Set[(String, Long)] =
      df.select(col("source"), col("h")).as[(String, Long)].collect().toSet
    val whole = Sketches.kmvSketch(terms, Seq("source"), "term", k = 16)
    val h = abs(hash(col("term"))) % 3
    val parts = (0 until 3).map(i =>
      Sketches.kmvSketch(terms.where(h === i), Seq("source"), "term", k = 16))
    assert(rows(Sketches.kmvMerge(parts, Seq("source"), k = 16)) == rows(whole))
    // overlapping (non-disjoint) parts merge identically — bottom-k of a
    // union is insensitive to duplication
    val overlapping = Seq(
      Sketches.kmvSketch(terms, Seq("source"), "term", k = 16),
      Sketches.kmvSketch(terms.where(h === 0), Seq("source"), "term", k = 16))
    assert(rows(Sketches.kmvMerge(overlapping, Seq("source"), k = 16)) == rows(whole))
  }

  test("KMV exact regime: under k distinct values the count is exact") {
    val vals = spark.range(40).select(lit("g").as("source"),
      concat(lit("v"), col("id")).as("term"))
    val est = Sketches.kmvDistinct(vals, Seq("source"), "term", k = 64)
      .select(col("n_min_vals"), col("kmv_distinct"))
      .as[(Long, Double)].head()
    assert(est == ((40L, 40.0)), s"under-k group must report exactly: $est")
  }

  test("KMV estimator lands within the error band at n >> k") {
    // 20k distinct values, k=64: relative stddev ≈ 1/√(k−2) ≈ 12.7% — 3σ
    val vals = spark.range(20000).select(lit("g").as("source"),
      concat(lit("u"), col("id")).as("term"))
    val est = Sketches.kmvDistinct(vals, Seq("source"), "term", k = 64)
      .select(col("kmv_distinct")).as[Double].head()
    assert(math.abs(est - 20000) / 20000.0 < 0.4, s"estimate off: $est")
  }

  test("KMV resemblance: identical sets → 1.0, disjoint sets → 0.0, mixtures between") {
    def est(df: DataFrame): Map[(String, String), Double] = {
      val sk = Sketches.kmvSketch(df, Seq("source"), "term", k = 16)
        .localCheckpoint(true)
      val srcs = sk.select("source").distinct()
      val pairs = srcs.select(col("source").as("sa"))
        .crossJoin(srcs.select(col("source").as("sb")))
        .where(col("sa") < col("sb"))
      val ra = pairs.join(sk.select(col("source").as("sa"), col("h")), "sa")
        .select(col("sa"), col("sb"), col("h"), lit(1L).as("ina"), lit(0L).as("inb"))
      val rb = pairs.join(sk.select(col("source").as("sb"), col("h")), "sb")
        .select(col("sa"), col("sb"), col("h"), lit(0L).as("ina"), lit(1L).as("inb"))
      val W = org.apache.spark.sql.expressions.Window
        .partitionBy("sa", "sb").orderBy("h")
      ra.unionByName(rb).groupBy("sa", "sb", "h")
        .agg(max("ina").as("ina"), max("inb").as("inb"))
        .withColumn("rn", row_number().over(W)).where(col("rn") <= 16)
        .groupBy("sa", "sb")
        .agg((sum(col("ina") * col("inb")).cast("double") /
          count(lit(1)).cast("double")).as("est"))
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    }
    val base = (0 until 100).map(i => s"v$i")
    val same = (base.map(("a", _)) ++ base.map(("b", _))).toDF("source", "term")
    assert(est(same)(("a", "b")) == 1.0)
    val disjoint = (base.map(("a", _)) ++
      (100 until 200).map(i => ("b", s"v$i"))).toDF("source", "term")
    assert(est(disjoint)(("a", "b")) == 0.0)
    val half = (base.map(("a", _)) ++
      (50 until 150).map(i => ("b", s"v$i"))).toDF("source", "term")
    val h = est(half)(("a", "b")) // true jaccard 50/150 ≈ 0.33
    assert(h > 0.05 && h < 0.7, s"half-overlap estimate implausible: $h")
  }

  test("shape mismatch fails loudly instead of silently mis-estimating") {
    val regs = Sketches.hllRegisters(terms, Seq("source"), "term", m = 64)
    val e1 = intercept[IllegalArgumentException] {
      Sketches.hllEstimate(regs, Seq("source"), m = 16)
    }
    assert(e1.getMessage.contains("different m"))
    val cms = Sketches.cmsBuild(terms, "term", depth = 4, width = 256)
    val e2 = intercept[IllegalArgumentException] {
      Sketches.cmsEstimate(cms,
        graft.functions.TextFunctions.StopwordsEn.toDF("term"), "term",
        depth = 2, width = 256)
    }
    assert(e2.getMessage.contains("different shape"))
  }

  test("quantile sketch exact regime: groups with <= k rows report exact discrete quantiles") {
    // 40 rows, k=64: the sample IS the group — rank selection must hit
    // the exact discrete quantiles of 1..40
    val vals = spark.range(1, 41).select(lit("g").as("source"),
      col("id").as("rid"), col("id").as("v"))
    val est = Sketches.quantiles(vals, Seq("source"), "rid", "v",
        probs = Seq((1, 4), (1, 2), (3, 4), (1, 1)), k = 64)
      .select(col("q"), col("n_sample"), col("q_value"))
      .as[(Double, Long, Long)].collect().toSet
    // ceil(0.25*40)=10, ceil(0.5*40)=20, ceil(0.75*40)=30, ceil(1*40)=40
    assert(est == Set((0.25, 40L, 10L), (0.5, 40L, 20L), (0.75, 40L, 30L), (1.0, 40L, 40L)), s"got $est")
  }

  test("quantile sketch error band: sampled median of a known uniform is within the rank bound") {
    // 20k values 1..20000, k=256: sample-quantile rank error stddev
    // ~ sqrt(q(1-q)/k) ≈ 3.1% at the median — allow 5σ of rank drift
    val vals = spark.range(1, 20001).select(lit("g").as("source"),
      col("id").as("rid"), col("id").as("v"))
    val med = Sketches.quantiles(vals, Seq("source"), "rid", "v",
        probs = Seq((1, 2)), k = 256)
      .select(col("q_value")).as[Long].head()
    assert(math.abs(med - 10000) / 20000.0 < 0.16, s"median estimate off: $med")
  }

  test("quantile sketch merge law: disjoint-split sketches merge to the single-pass sketch") {
    def rows(df: DataFrame): Set[(String, Long, Long)] =
      df.select(col("source"), col("h"), col("v"))
        .as[(String, Long, Long)].collect().toSet
    val vals = spark.range(5000).select(
        concat(lit("s"), col("id") % 3).as("source"),
        col("id").as("rid"), (col("id") * 7 % 1000).as("v"))
      .localCheckpoint(true)
    val whole = Sketches.quantileSketch(vals, Seq("source"), "rid", "v", k = 32)
    val parts = (0 until 4).map(i =>
      Sketches.quantileSketch(vals.where(col("rid") % 4 === i),
        Seq("source"), "rid", "v", k = 32))
    assert(rows(Sketches.quantileMerge(parts, Seq("source"), k = 32)) == rows(whole))
    // estimates off the merged sketch ≡ estimates off the single pass
    val eW = Sketches.quantileEstimate(whole, Seq("source"),
      Seq((1, 4), (1, 2), (3, 4))).collect().toSet
    val eM = Sketches.quantileEstimate(
      Sketches.quantileMerge(parts, Seq("source"), k = 32), Seq("source"),
      Seq((1, 4), (1, 2), (3, 4))).collect().toSet
    assert(eW == eM)
  }

  test("quality floor by sketch keeps a cutoff-bounded superset consistent with the sketch cutoff") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val scored = TextAnalysis.qualityScores(docs, "doc_id", "text")
      .join(docs.select("doc_id", "source"), "doc_id")
      .select("source", "doc_id", "quality")
      .localCheckpoint(true)
    val kept = Curation.qualityFloorBySketch(scored, "source", "doc_id",
      "quality", dropNum = 1, dropDen = 5, k = 256)
    // every kept row satisfies its domain's cutoff, and per domain the
    // realized drop fraction is near 20% (sketch rank error bounded)
    val perDom = kept.groupBy("source")
      .agg(count(lit(1)).as("n_kept"), min("quality").as("min_q"),
        min("q_cutoff").as("cut"), max("q_cutoff").as("cut2"))
      .collect()
    val totals = scored.groupBy("source").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    perDom.foreach { r =>
      assert(r.getDouble(3) == r.getDouble(4), "cutoff must be constant per domain")
      assert(r.getDouble(2) >= r.getDouble(3), "kept row below cutoff")
      val frac = r.getLong(1).toDouble / totals(r.getString(0))
      assert(frac > 0.6 && frac <= 1.0, s"${r.getString(0)}: kept fraction $frac")
    }
  }

  test("sketch build collapses to sketch-sized partial aggregates (no raw-term shuffle)") {
    val cms = Sketches.cmsBuild(terms, "term", depth = 4, width = 256)
    val plan = cms.queryExecution.executedPlan.toString
    // a partial count must run before the exchange (map-side combine
    // collapses each task's output to ≤ depth·width cells)
    assert(plan.contains("partial_count"), s"no partial aggregate:\n$plan")
    val hll = Sketches.hllRegisters(terms, Seq("source"), "term", m = 64)
    val hplan = hll.queryExecution.executedPlan.toString
    assert(hplan.contains("partial_max"), s"no partial max:\n$hplan")
  }
}
