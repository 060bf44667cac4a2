package graft.ops

import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators for training-data assembly: domain-mixture
  * sampling to a token budget, deterministic global shuffle + sharding,
  * and an n-gram-LM fluency score.
  *
  * Scale design:
  *  - [[domainMix]]: per-domain running token sum via the two-phase
  *    [[parallelRunningSum]] — parallelism is the slice count, NOT the
  *    domain count, so a one-domain-dominated mixture (web ≈ 90% of a
  *    pretraining corpus) still spreads across the cluster. No collect,
  *    no per-domain jobs.
  *  - [[shuffleShard]]: per-row hash (no data movement to DECIDE the
  *    shard) + one window per shard for positions. Writing the result
  *    `partitionBy(shard)` gives the training-reader layout directly.
  *  - [[bigramLmScore]]: two corpus-level aggregations (bigram counts,
  *    context counts) joined back on the exploded bigram stream — three
  *    key-hash shuffles total, all partial-aggregated map-side. No
  *    broadcast of the vocabulary: at 100 TB the bigram table is huge,
  *    so the join must be a shuffle hash join, and it is.
  */
object Curation {

  /** Deterministic per-id shuffle key, identical in the DuckDB oracle:
    * hash60 of "seed:id". */
  private def shuffleKey(idCol: String, seed: String) =
    hash60(concat(lit(seed + ":"), col(idCol).cast("string")))

  /** Two-phase parallel running sum — the scale-safe replacement for
    * `sum(value) over (partition by part order by order rows unbounded
    * preceding)`, whose single-window plan routes EVERY row of one `part`
    * value through one task. A real pretraining mixture is one-domain
    * dominated (web ≈ 80-90% of tokens), so at 100 TB that one task sorts
    * and scans most of the corpus.
    *
    * Phase 0: assign every row a slice id that is contiguous in the
    * (part, order) sort order — either caller-supplied (`sliceOf`, e.g.
    * `key div width` when the leading order column is a uniform hash) or
    * range-repartition by (part ++ order) and pin `spark_partition_id()`.
    * Phase 1: per-(part, slice) sums — a tiny table (≤ |parts| × slices).
    * Phase 2: exclusive running sum over that tiny table per part (a window
    * over ≤ `numSlices` rows) gives each slice's starting offset;
    * broadcast-join it back and add the intra-slice running sum.
    *
    * Identical answer to the single window (offsets are exact, the order
    * key must be a total order); parallelism = `numSlices` regardless of
    * how skewed `part` is.
    *
    * Materialization: with `sliceOf` the slice id is a pure function of
    * the row, so the two consumers (slice sums, final window) may safely
    * recompute the projection — NOTHING is persisted, and a library
    * caller leaks no cache entries (the slice-sum subtree partial-aggs
    * on the scan; only the final window exchanges by (part, slice)
    * hash). Without `sliceOf` the sampled range boundaries ARE the slice
    * assignment: the single cached materialization (`persist()`, columnar
    * — measured 2.3x over row-form `localCheckpoint` at 50M rows,
    * SCALE.md §skew) is what keeps both consumers on one drawing
    * (exchange-level reuse is not guaranteed once column pruning
    * differentiates the two subtrees), so the entry must live until the
    * query's last action; it holds only this narrow projection, and the
    * caller reclaims it afterwards (`spark.catalog.clearCache()`).
    *
    * `sliceOf` contract: given the slice count, return an expression that
    * is non-decreasing along `orderCols` within each `partCols` group and
    * lands in [0, slices) — e.g. `n => expr(s"__key div $width")` for a
    * uniform 60-bit hash key. Balance comes from key uniformity there,
    * from the range partitioner's sampling otherwise.
    */
  def parallelRunningSum(df: DataFrame, partCols: Seq[String],
                         orderCols: Seq[String], valueCol: String,
                         resultCol: String, numSlices: Int = 0,
                         sliceOf: Option[Int => Column] = None): DataFrame = {
    val slices =
      if (numSlices > 0) numSlices
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val sliced = sliceOf match {
      case Some(f) => df.withColumn("__slice", f(slices))
      case None =>
        df.repartitionByRange(slices, (partCols ++ orderCols).map(col): _*)
          .withColumn("__slice", spark_partition_id())
          .persist()
    }
    val sliceSums = sliced
      .groupBy((partCols :+ "__slice").map(col): _*)
      .agg(sum(col(valueCol)).as("__slice_sum"))
    val offsetW = Window.partitionBy(partCols.map(col): _*)
      .orderBy(col("__slice"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = sliceSums
      .withColumn("__offset",
        coalesce(sum(col("__slice_sum")).over(offsetW), lit(0L)))
      .drop("__slice_sum")
    val localW = Window
      .partitionBy((partCols :+ "__slice").map(col): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sliced
      .join(broadcast(offsets), partCols :+ "__slice")
      .withColumn(resultCol, sum(col(valueCol)).over(localW) + col("__offset"))
      .drop("__slice", "__offset")
  }

  /** Temperature-scaled domain weights (the multilingual-training
    * resampling rule at α = 1/2): each source's sampling weight is
    * √tokens normalized over all sources, which up-weights small domains
    * relative to proportional sampling without the floating-point
    * variance a general `pow(n, α)` would carry — IEEE `sqrt` is
    * correctly rounded, so the weights are bit-identical cross-engine.
    *
    * The normalizing Σ√tokens folds over a source-sorted array: the group
    * is bounded by the domain taxonomy (a few thousand sources at most,
    * by definition driver-tiny), so the deterministic fold is safe where
    * a corpus-sized one would not be. `token_budget` = ⌊weight · total⌋ —
    * feed it to [[domainMix]] (which accepts any per-source budget map)
    * to materialize the tempered mixture.
    *
    * Output: (source, n_tokens, weight, token_budget). */
  def temperatureWeights(docs: DataFrame, textCol: String, sourceCol: String,
                         totalTokenBudget: Long): DataFrame = {
    // Materialized once (eager, cleaner-reclaimed): bySrc is taxonomy-sized
    // (a few thousand rows) but its subtree is the full corpus scan +
    // tokenize, and both the normalizing total and the final select read
    // it — exchange-level reuse across the two subtrees is not guaranteed.
    val bySrc = docs.groupBy(col(sourceCol))
      .agg(sum(size(tokens(col(textCol)))).cast("long").as("n_tokens"))
      .localCheckpoint(true)
    val tot = bySrc.agg(
      aggregate(
        array_sort(collect_list(struct(col(sourceCol).as("s"),
          sqrt(col("n_tokens").cast("double")).as("v")))),
        lit(0.0), (acc, x) => acc + x.getField("v")).as("__tot"))
    bySrc.crossJoin(broadcast(tot))
      .select(col(sourceCol), col("n_tokens"),
        (sqrt(col("n_tokens").cast("double")) / col("__tot")).as("weight"))
      .withColumn("token_budget",
        floor(col("weight") * totalTokenBudget).cast("long"))
  }

  /** Per-domain quality floor (the FineWeb-style curation rule): within
    * each `domainCol` group, drop the bottom `dropFrac` fraction of
    * documents by quality percent_rank (ascending quality, ties broken
    * by id — fully deterministic). percent_rank is exact integer-ratio
    * arithmetic ((rank−1)/(n−1)), so the boundary compare is
    * engine-portable bit-for-bit. Note the single-document-domain edge:
    * its one doc has percent_rank 0 and drops at any dropFrac > 0 —
    * rank floors are meaningful only for domains with ≥ 1/dropFrac
    * documents; guard tiny domains upstream if they must survive.
    *
    * Scale: one hash exchange on `domainCol` + per-domain sort — the
    * standard ranked-window shape (cf. `rel_window_dist`). Domains are
    * the parallelism unit; a corpus where ONE domain dominates should
    * precompute an approximate quality cutoff per domain (quantile
    * sketch) and filter by it instead of ranking — same rule, sortless,
    * at the cost of an approximate boundary. */
  def qualityFloor(scored: DataFrame, domainCol: String, qualityCol: String,
                   idCol: String, dropFrac: Double): DataFrame = {
    require(dropFrac >= 0.0 && dropFrac < 1.0, s"dropFrac in [0,1): $dropFrac")
    val w = Window.partitionBy(domainCol)
      .orderBy(col(qualityCol), col(idCol))
    scored.withColumn("q_rank", percent_rank().over(w))
      .where(col("q_rank") >= dropFrac)
  }

  /** Sortless per-domain quality floor — the scale path [[qualityFloor]]'s
    * scaladoc points at for skew-dominated corpora: instead of ranking
    * every document inside its domain (a per-domain SORT whose
    * parallelism unit is the domain — one mega-domain serializes), compute
    * one quantile cutoff per domain with a bounded sketch and filter by
    * it at scan speed.
    *
    * `q_cutoff` is the smallest quality value whose cumulative frequency
    * reaches `dropFrac` (both Spark's `percentile_approx` in its exact
    * regime and DuckDB's `quantile_disc` implement exactly this statistic
    * — probed cross-engine, so the oracle hash-matches; no interpolation
    * arithmetic is involved, the cutoff is an element of the data).
    * Documents with quality ≥ the cutoff survive — the cutoff document
    * itself is kept, so the realized drop fraction is strictly BELOW
    * `dropFrac`, and the kept set is always a superset of
    * [[qualityFloor]]'s at the same fraction (percent_rank < cume_dist
    * pointwise; the containment is pinned in CurationSpec).
    *
    * Scale: one partial-aggregated exchange of taxonomy-sized sketch
    * state (bounded by `accuracy` per domain, independent of domain
    * size — the property the rank path lacks), a broadcast of the tiny
    * cutoff table, and a scan-speed filter. NO sort, NO per-domain
    * window; the scored input is evaluated twice (once under the
    * aggregate, once as the probe side), which at 100 TB is the right
    * trade — re-scoring is scan-cheap, materializing the corpus is not.
    * Beyond the exact regime (> `accuracy` docs in a domain) the cutoff
    * is approximate within the sketch's rank-error bound; the kept-set
    * semantics stay deterministic for a given cutoff.
    * Output: scored columns + `q_cutoff`. */
  def qualityFloorByCutoff(scored: DataFrame, domainCol: String, qualityCol: String,
                           dropFrac: Double, accuracy: Int = 10000): DataFrame = {
    require(dropFrac >= 0.0 && dropFrac < 1.0, s"dropFrac in [0,1): $dropFrac")
    val cutoffs = scored.groupBy(col(domainCol))
      .agg(percentile_approx(col(qualityCol), lit(dropFrac), lit(accuracy)).as("q_cutoff"))
    scored.join(broadcast(cutoffs), Seq(domainCol))
      .where(col(qualityCol) >= col("q_cutoff"))
  }

  /** [[qualityFloorByCutoff]] with the cutoff derived from the
    * MERGEABLE quantile sketch ([[Sketches.quantileSketch]]) instead of
    * a per-pass `percentile_approx`: the cutoff is the sketch sample's
    * value at rank ⌈num·n/den⌉ (discrete, an element of the data — same
    * kept-set semantics). The point of the variant is MAINTAINABILITY:
    * percentile_approx state must be rebuilt per corpus pass, while the
    * bottom-k sample is the per-segment summary a profiling sidecar
    * already keeps and MERGES (exact merge law) — so the floor's cutoff
    * can come from folded per-segment sketches without rescanning
    * history. `dropNum/dropDen` is the drop fraction as an exact
    * rational. Output: scored columns + `q_cutoff`. */
  def qualityFloorBySketch(scored: DataFrame, domainCol: String, idCol: String,
                           qualityCol: String, dropNum: Int, dropDen: Int,
                           k: Int = 256): DataFrame = {
    val cutoffs = Sketches.quantileEstimate(
        Sketches.quantileSketch(
          scored.select(col(domainCol), col(idCol), col(qualityCol).as("v")),
          Seq(domainCol), idCol, "v", k),
        Seq(domainCol), Seq((dropNum, dropDen)))
      .select(col(domainCol), col("q_value").as("q_cutoff"))
    scored.join(broadcast(cutoffs), Seq(domainCol))
      .where(col(qualityCol) >= col("q_cutoff"))
  }

  /** Deterministic stratified sample: the `n` rows whose
    * [[graft.functions.TextFunctions.hash60]] of `idCol` is smallest
    * per group — "show me 100 documents per source", the corpus-
    * inspection op every curation decision starts from. Hash-ordered
    * (bottom-n sampling), so the sample is a PURE FUNCTION of the
    * group's id set: reproducible across runs/engines (the DuckDB
    * oracle re-derives it), stable under corpus growth (a new row
    * displaces at most one sampled row), and uniform (md5 order is
    * independent of any data order). The same two-phase spread-bucket
    * bottom-n as [[Sketches.quantileSketch]] — no partition ever holds
    * a group's full row set. Output: input columns + `sample_rank`
    * (1..n in hash order — `sample_rank ≤ k` is a smaller sample, so
    * one materialized sample serves every k ≤ n). */
  def stratifiedSample(df: DataFrame, groupCols: Seq[String], idCol: String,
                       n: Int): DataFrame = {
    require(n >= 1, s"n must be >= 1: $n")
    val proj = df.withColumn("__h", graft.functions.TextFunctions.hash60(
      concat(lit("smp:"), col(idCol).cast("string"))))
    Sketches.bottomKByHash(proj, groupCols, Seq(idCol), n)
      .withColumn("sample_rank", col("__rn").cast("long"))
      .drop("__h", "__rn")
  }

  /** Per-domain robust length outliers via median/MAD (median absolute
    * deviation): flag documents whose token count deviates from their
    * domain's median by more than `k` MADs — the robust alternative to a
    * mean/stddev z-score (one pathological domain tail cannot drag the
    * center, unlike a mean) and a standard curation screen for
    * absurdly-short boilerplate and absurdly-long concatenation junk
    * RELATIVE to each domain's own length profile (a fixed global cutoff
    * misclassifies whole domains).
    *
    * Engine-exact by construction: counts are integers < 2^53, medians
    * interpolate at 0.5 (exact halving of exact integers), deviations are
    * exact half-integer doubles, and their median halves exactly again —
    * every compare is on exact IEEE values, so the DuckDB mirror is
    * bit-identical. (A quality-score MAD would interpolate arbitrary
    * doubles, where engines may legally differ in formula — this operator
    * deliberately sticks to the integer-count metric.)
    *
    * Scale: two `percentile` aggregations whose per-domain state is
    * O(distinct token counts) — bounded by max document length, not
    * corpus size (same argument as text_token_quantiles) — each followed
    * by a broadcast of the taxonomy-sized center table; the corpus is
    * never sorted and never shuffled (only the tiny aggregates move). The
    * (id, domain, count) projection is materialized once (eager,
    * cleaner-reclaimed) so its four consumers reuse three longs per row
    * instead of re-tokenizing the corpus per subtree. NULL domains form
    * their own group (null-safe joins), so no row silently disappears.
    *
    * Output: (idCol, domainCol, n_tokens, med, mad, is_outlier). */
  def lengthOutliers(docs: DataFrame, idCol: String, textCol: String,
                     domainCol: String, k: Double = 4.0): DataFrame = {
    require(k > 0.0, s"k must be > 0: $k")
    val t = docs.select(col(idCol), col(domainCol),
      size(graft.functions.TextFunctions.tokens(col(textCol))).cast("long").as("n_tokens"))
      .localCheckpoint(true)
    // groupBy keeps a NULL-domain group; the probe joins must too, or
    // NULL-domain rows vanish from the output (inner join on a null key
    // never matches) — join null-safely on a renamed key instead.
    val med = t.groupBy(domainCol)
      .agg(percentile(col("n_tokens"), lit(0.5)).as("med"))
      .withColumnRenamed(domainCol, "__dom")
    val dev = t.join(broadcast(med), col(domainCol) <=> col("__dom")).drop("__dom")
      .withColumn("absdev", abs(col("n_tokens") - col("med")))
    val mad = dev.groupBy(domainCol)
      .agg(percentile(col("absdev"), lit(0.5)).as("mad"))
      .withColumnRenamed(domainCol, "__dom")
    dev.join(broadcast(mad), col(domainCol) <=> col("__dom")).drop("__dom")
      .select(col(idCol), col(domainCol), col("n_tokens"), col("med"), col("mad"),
        (col("absdev") > lit(k) * col("mad")).as("is_outlier"))
  }

  /** Domain-mixture sampling: keep documents per source domain, in a
    * deterministic pseudo-random order, until that domain's share of the
    * total token budget is exhausted (classic data-mixture construction:
    * "α_web of the tokens from web, α_code from code, ...").
    *
    * A domain missing from `weights` gets budget 0 (dropped). Each domain
    * may overshoot its budget by at most the final document (streaming-
    * packing relaxation — the same contract as text_pack_sequences).
    *
    * Output: (source, id, n_tokens, cum_tokens) for kept documents.
    */
  def domainMix(docs: DataFrame, idCol: String, textCol: String,
                sourceCol: String, weights: Map[String, Double],
                totalTokenBudget: Long, seed: String = "mix"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    domainMixBudgets(docs, idCol, textCol, sourceCol,
      weights.toSeq.map { case (s, w) => (s, (w * totalTokenBudget).toLong) }
        .toDF(sourceCol, "token_budget"), seed = seed)
  }

  /** [[domainMix]] with the per-source token budgets supplied as a
    * DataFrame (sourceCol, `token_budget`) instead of a driver-side map —
    * the composition point for budgets COMPUTED from the data, e.g.
    * [[temperatureWeights]] output, with no collect in between. Sources
    * absent from `budgets` drop (inner join). */
  def domainMixBudgets(docs: DataFrame, idCol: String, textCol: String,
                       sourceCol: String, budgets: DataFrame,
                       seed: String = "mix"): DataFrame = {
    // Materialized once (eager, cleaner-reclaimed — NOT persist(): a
    // cache entry would outlive the call for library callers): the
    // tokenize pass is the expensive part and both prefix-sum consumers
    // read this narrow (source, id, n_tokens, key, budget) projection.
    val keyed = budgetKeyed(docs, idCol, textCol, sourceCol, budgets, seed)
      .localCheckpoint(true)
    // Running sum via the two-phase parallel prefix sum: one domain can be
    // 90% of the corpus, so the naive Window.partitionBy(source) would put
    // it through a single task (see [[parallelRunningSum]]). The order
    // leads with the uniform 60-bit shuffle key, so the slice id is
    // computed deterministically (`key div width`) — no sampled range
    // shuffle, and the materialization is advisory-only.
    parallelRunningSum(keyed, Seq(sourceCol), Seq("__key", idCol),
      "n_tokens", "cum_tokens",
      sliceOf = Some { n =>
        val width = ((1L << 60) + n - 1) / n
        expr(s"__key div ${width}L")
      })
      .where(col("cum_tokens") - col("n_tokens") < col("__budget"))
      .select(col(sourceCol), col(idCol), col("n_tokens"), col("cum_tokens"))
  }

  /** The pre-materialization (source, id, n_tokens, key, budget) projection
    * of [[domainMixBudgets]] — the budget join happens HERE, before the
    * eager materialization truncates the plan, so this is the frame plan
    * assertions must inspect (ScaleOpsSpec).
    *
    * Budgets ride a broadcast-joined table, not a per-source CASE chain:
    * a real source taxonomy has thousands of domains, and a 10k-branch
    * expression tree is a planner/codegen hazard while a 10k-row
    * broadcast is nothing. Inner join = sources without a weight drop. */
  private[graft] def budgetKeyed(docs: DataFrame, idCol: String,
                                 textCol: String, sourceCol: String,
                                 budgets: DataFrame, seed: String): DataFrame =
    docs
      .select(col(sourceCol), col(idCol),
        size(tokens(col(textCol))).cast("long").as("n_tokens"),
        shuffleKey(idCol, seed).as("__key"))
      .join(broadcast(
        budgets.select(col(sourceCol), col("token_budget").as("__budget"))),
        sourceCol)

  /** Deterministic global shuffle for training-data layout: every row
    * gets a reproducible pseudo-random 60-bit key, a shard assignment
    * (`key mod numShards`), and its position within the shard in key
    * order. Seeded → re-runs produce the identical byte layout, and a
    * different seed reshuffles without touching the data.
    *
    * Output: (id, shard, pos). Downstream writes
    * `.repartition(col("shard")).sortWithinPartitions("pos")` +
    * `partitionBy("shard")` for the reader layout.
    */
  def shuffleShard(docs: DataFrame, idCol: String, numShards: Int,
                   seed: String = "shuffle"): DataFrame = {
    val w = Window.partitionBy("shard").orderBy(col("__key"), col(idCol))
    docs
      .select(col(idCol), shuffleKey(idCol, seed).as("__key"))
      .withColumn("shard", pmod(col("__key"), lit(numShards.toLong)))
      .withColumn("pos", row_number().over(w).cast("long"))
      .select(col(idCol), col("shard"), col("pos"))
  }

  /** Deterministic train/val/test assignment: the seeded 60-bit document
    * hash falls into consecutive integer intervals sized by the requested
    * fractions — per-row math, no shuffle, no sampling pass, and the
    * assignment is a pure function of (seed, id): reproducible across
    * runs, stable under corpus growth (adding documents never reassigns
    * existing ones — the property a random split lacks and a training
    * pipeline needs), engine-portable (thresholds are exact integers).
    *
    * `fractions` must sum to ≤ 1; a remainder falls into the LAST named
    * split (so ("train" 0.9, "val" 0.1) is exhaustive, and dyadic
    * fractions make the `(cum * 2^60).toLong` thresholds exact).
    * Compose with [[Decontaminate]] to scrub eval splits from train.
    */
  def splitAssign(docs: DataFrame, idCol: String,
                  fractions: Seq[(String, Double)],
                  seed: String = "split"): DataFrame = {
    require(fractions.nonEmpty && fractions.map(_._2).sum <= 1.0 + 1e-9)
    val max = 1L << 60
    val cums = fractions.map(_._2).scanLeft(0.0)(_ + _).tail
    val thresholds = cums.init.map(c => (c * max).toLong) :+ max
    val key = shuffleKey(idCol, seed)
    val assign = fractions.map(_._1).zip(thresholds).reverse
      .foldLeft(lit(fractions.last._1)) { case (acc, (name, thr)) =>
        when(key < thr, lit(name)).otherwise(acc)
      }
    docs.select(col(idCol), assign.as("split"))
  }

  /** Curriculum ordering: assign every document a training PHASE by
    * global quality quantile (phase 1 = highest-quality band — train on
    * the cleanest data first, the standard curriculum schedule) and a
    * seeded shuffle key WITHIN the phase; reading in (phase, pos_key)
    * order is the curriculum. Boundaries come from one bounded-state
    * percentile sketch (exact in the ≤`accuracy`-distinct regime, the
    * [[qualityFloorByCutoff]] convention) broadcast as a single row;
    * phase assignment is a per-row fold over `phases − 1` cutoffs —
    * scan-speed, no corpus sort, no skew sensitivity.
    *
    * Output: (idCol, qualityCol, phase ∈ [1, phases], pos_key). */
  def curriculumOrder(scored: DataFrame, idCol: String, qualityCol: String,
                      phases: Int, seed: String = "curriculum",
                      accuracy: Int = 10000): DataFrame = {
    require(phases >= 2, s"phases must be >= 2: $phases")
    val fracs = (1 until phases).map(j => j.toDouble / phases)
    val cuts = scored.agg(percentile_approx(col(qualityCol),
      array(fracs.map(lit): _*), lit(accuracy)).as("__cuts"))
    scored.crossJoin(broadcast(cuts))
      .withColumn("phase", (lit(1) + aggregate(col("__cuts"), lit(0),
        (acc, c) => acc + when(col(qualityCol) < c, 1).otherwise(0))).cast("long"))
      .withColumn("pos_key", shuffleKey(idCol, seed))
      .select(col(idCol), col(qualityCol), col("phase"), col("pos_key"))
  }

  /** Epoch plan — the data-mixing arithmetic for budgets that EXCEED a
    * source's corpus ("3.2 epochs of wiki"): each source's token budget
    * decomposes exactly as `budget = full_epochs · n_tokens +
    * remainder_tokens` (0 ≤ remainder < n_tokens). Full passes
    * replicate the source whole; the remainder is drawn weighted
    * ([[ppsSample]] with the remainder as its budget, or
    * [[domainMixBudgets]]). One corpus pass (the per-source token agg —
    * map-side combined, taxonomy-sized result) + a broadcast of the
    * budget table; all arithmetic exact LONGs, so the plan is
    * hash-oracled (`text_epoch_plan`). Sources with zero tokens are
    * excluded (no epoch of nothing).
    *
    * Output: (source, n_tokens, budget, full_epochs, remainder_tokens). */
  def epochPlan(docs: DataFrame, textCol: String, sourceCol: String,
                budgets: Map[String, Long]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bdf = broadcast(budgets.toSeq.sortBy(_._1).toDF(sourceCol, "budget"))
    docs.groupBy(col(sourceCol))
      .agg(sum(size(tokens(col(textCol)))).cast("long").as("n_tokens"))
      .where(col("n_tokens") > 0)
      .join(bdf, sourceCol)
      .select(col(sourceCol), col("n_tokens"), col("budget"),
        expr("budget div n_tokens").as("full_epochs"),
        (col("budget") % col("n_tokens")).as("remainder_tokens"))
  }

  /** Systematic probability-proportional-to-size (PPS) sampling — the
    * weighted subsampling primitive ("sample `n` documents with
    * inclusion probability ∝ weight", e.g. token count, so the draw is
    * token-budget-faithful): documents line up in the seeded-hash
    * shuffle order, and `n` evenly-spaced pointers (stride `W/n`, seeded
    * start offset) sweep the cumulative-weight axis once. A document is
    * drawn once per pointer landing in its weight interval — `n_copies`
    * can exceed 1 for items heavier than the stride (the honest PPS
    * semantic; Σ n_copies = n exactly).
    *
    * Fully deterministic and engine-portable: weights are exact LONGs,
    * the cumulative axis comes from the two-phase
    * [[parallelRunningSum]] (hash-sliced — no single-task window, no
    * skew sensitivity), and the pointer arithmetic is a fixed IEEE
    * expression tree on exact inputs (stride `W/n` is one division, the
    * start fraction is the seed hash over 2^60), mirrored verbatim in
    * the oracle — so the drawn multiset hash-matches cross-engine
    * (`text_pps_sample`). Per-row cost past the prefix sum is two
    * `ceil`s and a broadcast of the (W, start) scalar row.
    *
    * Output: (idCol, weight, n_copies ≥ 1). */
  def ppsSample(docs: DataFrame, idCol: String, weightCol: String,
                n: Long, seed: String = "pps"): DataFrame = {
    require(n >= 1, s"sample size must be >= 1: $n")
    val keyed = docs
      .select(col(idCol), col(weightCol).cast("long").as("__w"),
        shuffleKey(idCol, seed).as("__key"))
      .where(col("__w") > 0)
    val cum = parallelRunningSum(keyed, Seq.empty, Seq("__key", idCol),
      "__w", "__cum",
      sliceOf = Some { s =>
        val width = ((1L << 60) + s - 1) / s
        expr(s"__key div ${width}L")
      })
    // One broadcast scalar row: total weight + the seeded start fraction
    // (hash over 2^60 — division by a power of two, exact).
    val params = keyed.agg(sum("__w").as("__tot"))
      .select(col("__tot"), (hash60(lit("start:" + seed)).cast("double") /
        lit((1L << 60).toDouble)).as("__f"))
    val step = col("__tot").cast("double") / lit(n).cast("double")
    val r = col("__f") * step
    val copies = (ceil((col("__cum").cast("double") - r) / step) -
      ceil(((col("__cum") - col("__w")).cast("double") - r) / step)).cast("long")
    cum.crossJoin(broadcast(params))
      .withColumn("n_copies", copies)
      .where(col("n_copies") >= 1)
      .select(col(idCol), col("__w").as("weight"), col("n_copies"))
  }

  /** DSIR-style importance scores (Xie et al. 2023, arXiv:2302.03169):
    * rank raw documents by how target-like their hashed n-gram profile
    * is. Features are unigrams + bigrams hashed into `buckets` slots;
    * each bucket gets an add-one-smoothed likelihood ratio
    * `((t_b+1)/(T+B)) / ((r_b+1)/(R+B))` between the target and raw
    * corpus distributions, and a document scores the count-weighted MEAN
    * ratio over its buckets.
    *
    * Deliberately LOG-FREE like [[bigramLmScore]]: the paper's
    * log-likelihood-ratio needs `ln` (not bit-portable across engines);
    * the arithmetic-mean ratio keeps every step IEEE-exact in the DuckDB
    * oracle while preserving the ranking signal selection consumes
    * (target-like buckets ratio > 1, off-target < 1). Selection is then
    * deterministic top-k by (score, id) — the paper's Gumbel-top-k
    * sampling needs logs too; seeded-hash tie-breaking keeps re-runs
    * byte-identical, the property the rest of the curation stack
    * guarantees.
    *
    * Scale shape: two feature streams (target's collapses to a ≤`buckets`-
    * row table, raw's is materialized once for its two consumers), bucket
    * stats are scalar/broadcast joins (a 4096-row ratio table is nothing),
    * and the per-doc fold is bucket-sorted so partition order cannot
    * perturb the double sum. No corpus-side shuffle beyond the per-doc
    * (id, bucket) partial aggregation.
    *
    * Output: (idCol, n_feats, dsir_score) for every raw document.
    */
  def dsirScores(raw: DataFrame, target: DataFrame, idCol: String,
                 textCol: String, buckets: Int = 4096): DataFrame = {
    require(buckets > 0)
    // One native per-row pass builds the hashed feature multiset (see
    // [[graft.expressions.HashedNgramBucketsExpr]] — the interpreted
    // transform-lambda + hex-conv formulation was ~10x slower).
    def feats(docs: DataFrame) = docs
      .select(col(idCol),
        explode(graft.expressions.TextSketches.hashedNgramBuckets(
          normalize(col(textCol)), buckets)).as("bucket"))
    // Small-input parallelism: per-row hashing is CPU-bound, and a corpus
    // that arrives as fewer splits than the session's parallelism (one
    // small file locally) would hash on one task. At scale the scan has
    // more splits than cores and this is a no-op — the corpus is never
    // shuffled just to hash it. The small-vs-large probe reads optimizer
    // plan STATS (size estimate), not `df.rdd` — an RDD conversion would
    // plan a row-deserialization stage per call just to count splits. A
    // scan splits at `files.maxPartitionBytes`, so an input estimated
    // below n·maxPartitionBytes cannot arrive as ≥ n splits.
    val sc = raw.sparkSession.sessionState.conf
    val n = sc.numShufflePartitions
    val widenBelow = BigInt(n) * sc.filesMaxPartitionBytes
    def widen(df: DataFrame) =
      if (df.queryExecution.optimizedPlan.stats.sizeInBytes < widenBelow)
        df.repartition(n)
      else df
    // Raw features feed the bucket stats AND the per-doc counts —
    // materialized once (eager, cleaner-reclaimed (id, bucket) longs).
    val rawF = feats(widen(raw)).localCheckpoint(true)
    val tb = feats(widen(target)).groupBy("bucket").agg(count(lit(1)).as("t_b"))
    val rb = rawF.groupBy("bucket").agg(count(lit(1)).as("r_b"))
    // Scalar totals come from the tiny bucket tables, not extra passes —
    // folded into ONE broadcast build (a 1x2 frame) instead of two
    // separate broadcast exchanges.
    val tots = broadcast(
      tb.agg(sum(col("t_b")).cast("long").as("t_total"))
        .crossJoin(rb.agg(sum(col("r_b")).cast("long").as("r_total"))))
    val ratios = rb.join(tb, Seq("bucket"), "left")
      .crossJoin(tots)
      .select(col("bucket"),
        (((coalesce(col("t_b"), lit(0L)) + 1L).cast("double") *
          (col("r_total") + buckets).cast("double")) /
          ((col("r_b") + 1L).cast("double") *
            (col("t_total") + buckets).cast("double"))).as("ratio"))
    val terms = rawF.groupBy(idCol, "bucket").agg(count(lit(1)).as("c"))
      .join(broadcast(ratios), "bucket")
      .select(col(idCol), col("bucket"),
        (col("c").cast("double") * col("ratio")).as("term"), col("c"))
    terms.groupBy(idCol)
      .agg(
        aggregate(
          array_sort(collect_list(struct(col("bucket"), col("term")))),
          lit(0.0), (acc, s) => acc + s.getField("term")).as("__tsum"),
        sum(col("c")).cast("long").as("n_feats"))
      .select(col(idCol), col("n_feats"),
        (col("__tsum") / col("n_feats").cast("double")).as("dsir_score"))
  }

  /** Bigram-LM fluency score: the mean add-one-smoothed conditional
    * probability of each document's bigrams under a language model fit on
    * the corpus itself — P(w2|w1) = (c(w1 w2)+1) / (c(w1·)+V), where
    * c(w1·) counts bigram contexts and V is the corpus vocabulary size.
    *
    * Deliberately LOG-FREE (arithmetic mean of probabilities, not mean
    * log-prob): libm log() is not bit-portable across engines, while
    * IEEE double division/addition is — the score is bit-identical in
    * the DuckDB oracle. Monotonicity per document length class is
    * preserved, which is what quality filtering consumes.
    *
    * The per-document mean folds probabilities in bigram-position order
    * (sorted struct array), so partition order can't perturb the sum.
    *
    * Output: (id, n_bigrams, lm_score); documents with < 2 tokens score
    * 0.0 with n_bigrams = 0.
    */
  def bigramLmScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toked = docs
      .select(col(idCol), tokens(normalize(col(textCol))).as("__toks"))
      .select(col(idCol), col("__toks"),
        when(size(col("__toks")) < 2, array())
          .otherwise(wordShingles(col("__toks"), 2)).as("__bgs"))
      // Materialized once (eager, cleaner-reclaimed): the bigram stream
      // feeds THREE aggregation consumers plus the empty-doc branch —
      // without this every consumer re-runs the regexp tokenize + shingle
      // pipeline (measured 22 s → ~2 s at sf0.1).
      .localCheckpoint(true)
    val exploded = toked
      .select(col(idCol), posexplode(col("__bgs")).as(Seq("pos", "bigram")))
      .withColumn("ctx", split(col("bigram"), " ").getItem(0))

    val bigramCounts = exploded.groupBy("bigram").agg(count(lit(1)).as("c2"))
    val ctxCounts = exploded.groupBy("ctx").agg(count(lit(1)).as("c1"))
    // Vocabulary size: distinct tokens over the corpus, as a 1-row frame
    // broadcast onto the stream (a scalar, not a collect()); reads the
    // materialized token arrays, not a second tokenization pass.
    val vocab = broadcast(
      toked.select(explode(col("__toks")).as("tok"))
        .agg(count_distinct(col("tok")).as("v")))

    val scored = exploded
      .join(bigramCounts, "bigram")
      .join(ctxCounts, "ctx")
      .crossJoin(vocab)
      .select(col(idCol), col("pos"),
        ((col("c2") + lit(1L)).cast("double") /
          (col("c1") + col("v")).cast("double")).as("p"))
    val perDoc = scored
      .groupBy(idCol)
      .agg(
        aggregate(
          array_sort(collect_list(struct(col("pos"), col("p")))),
          lit(0.0), (acc, s) => acc + s.getField("p")).as("__psum"),
        count(lit(1)).as("n_bigrams"))
      .select(col(idCol), col("n_bigrams"),
        (col("__psum") / col("n_bigrams").cast("double")).as("lm_score"))
    // Re-attach empty documents (no bigrams → left anti of the scored set).
    val empty = toked.where(size(col("__bgs")) === 0)
      .select(col(idCol), lit(0L).as("n_bigrams"), lit(0.0).as("lm_score"))
    perDoc.unionByName(empty)
  }

  /** Trigram stupid-backoff LM score (Brants et al. 2007, "Large
    * Language Models in Machine Translation" — the web-scale LM scheme:
    * no discounting, a fixed back-off factor, trivially distributed):
    *
    *   S(w3|w1 w2) = c(w1w2w3)/c(w1w2)        if the trigram was seen
    *               = 0.4 · c(w2w3)/c(w2)       else if the bigram was
    *               = 0.4² · c(w3)/N            else (0 for OOV w3)
    *
    * trained on `train` and scored over `docs` — a real held-out split
    * (self-scoring would never back off: every observed trigram has
    * count ≥ 1 in its own counts). Per-document score = arithmetic mean
    * of S over trigram positions, folded in position order — the same
    * deliberately LOG-FREE design as [[bigramLmScore]] (ratios of exact
    * integers + IEEE mean, bit-identical in the DuckDB oracle; libm log
    * is not engine-portable).
    *
    * Scale shape: the corpus is tokenized once per side; counts are
    * plain hash aggregations (map-side combined, vocabulary-bounded);
    * scoring is hash joins of the trigram stream against the count
    * tables on gram keys (AQE broadcasts the small ones) plus ONE
    * broadcast 1-row total. Nothing is quadratic; no driver
    * materialization.
    *
    * Output: (id, n_trigrams, sbo_score); docs with < 3 tokens score
    * 0.0 with n_trigrams = 0.
    */
  def stupidBackoffScore(docs: DataFrame, train: DataFrame, idCol: String,
                         textCol: String): DataFrame = {
    // --- training counts (one tokenize pass, three aggregations) ---
    val trainToks = train
      .select(tokens(normalize(col(textCol))).as("__toks"))
      .localCheckpoint(true)
    val uni = trainToks.select(explode(col("__toks")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cu"))
    val bi = trainToks.where(size(col("__toks")) >= 2)
      .select(explode(wordShingles(col("__toks"), 2)).as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("cb"))
    val tri = trainToks.where(size(col("__toks")) >= 3)
      .select(explode(wordShingles(col("__toks"), 3)).as("tg"))
      .groupBy("tg").agg(count(lit(1)).as("ct"))
    val total = broadcast(
      trainToks.select(explode(col("__toks")).as("w"))
        .agg(count(lit(1)).as("n_total")))

    // --- scoring stream: trigram positions with their backoff keys ---
    val toked = docs
      .select(col(idCol), tokens(normalize(col(textCol))).as("__toks"))
      .select(col(idCol), col("__toks"),
        when(size(col("__toks")) < 3, array())
          .otherwise(wordShingles(col("__toks"), 3)).as("__tgs"))
      .localCheckpoint(true)
    val pos = toked
      .select(col(idCol), posexplode(col("__tgs")).as(Seq("pos", "tg")))
      .withColumn("__a", split(col("tg"), " "))
      .select(col(idCol), col("pos"), col("tg"),
        concat_ws(" ", col("__a").getItem(0), col("__a").getItem(1)).as("b12"),
        concat_ws(" ", col("__a").getItem(1), col("__a").getItem(2)).as("b23"),
        col("__a").getItem(1).as("w2"), col("__a").getItem(2).as("w3"))

    val scored = pos
      .join(tri.withColumnRenamed("tg", "__tg3"), pos("tg") === col("__tg3"), "left")
      .join(bi.select(col("bg").as("b12"), col("cb").as("c12")), Seq("b12"), "left")
      .join(bi.select(col("bg").as("b23"), col("cb").as("c23")), Seq("b23"), "left")
      .join(uni.select(col("w").as("w2"), col("cu").as("c2u")), Seq("w2"), "left")
      .join(uni.select(col("w").as("w3"), col("cu").as("c3u")), Seq("w3"), "left")
      .crossJoin(total)
      .select(col(idCol), col("pos"),
        when(coalesce(col("ct"), lit(0L)) > 0L,
          col("ct").cast("double") / col("c12").cast("double"))
          .when(coalesce(col("c23"), lit(0L)) > 0L,
            lit(0.4) * (col("c23").cast("double") / col("c2u").cast("double")))
          .otherwise(lit(0.4) * lit(0.4) *
            (coalesce(col("c3u"), lit(0L)).cast("double") / col("n_total").cast("double")))
          .as("p"))
    val perDoc = scored
      .groupBy(idCol)
      .agg(
        aggregate(
          array_sort(collect_list(struct(col("pos"), col("p")))),
          lit(0.0), (acc, s) => acc + s.getField("p")).as("__psum"),
        count(lit(1)).as("n_trigrams"))
      .select(col(idCol), col("n_trigrams"),
        (col("__psum") / col("n_trigrams").cast("double")).as("sbo_score"))
    val empty = toked.where(size(col("__tgs")) === 0)
      .select(col(idCol), lit(0L).as("n_trigrams"), lit(0.0).as("sbo_score"))
    perDoc.unionByName(empty)
  }
}
