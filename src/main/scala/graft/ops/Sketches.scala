package graft.ops

import graft.functions.TextFunctions.hash60
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable cardinality / frequency sketches — the bounded-state
  * summaries a 100 TB corpus is profiled with when exact global counts
  * are too expensive to keep hot:
  *
  *  - [[hllRegisters]]/[[hllEstimate]] — HyperLogLog (Flajolet et al.
  *    2007): per-group distinct-count registers. m registers of a few
  *    bits replace a distinct-count's per-key state; registers built on
  *    disjoint corpus parts (partitions, ingest segments, days) merge by
  *    per-bucket MAX into exactly the whole-corpus registers — so a
  *    maintained stats sidecar can answer "distinct tokens per source"
  *    without ever re-scanning history (the same segment-ledger idea as
  *    [[graft.io.SegmentedIndex]], applied to profile state).
  *  - [[kmvSketch]]/[[kmvEstimate]] — KMV bottom-k distinct sketch
  *    (Bar-Yossef et al. 2002): the k smallest distinct hash values per
  *    group; disjoint parts merge by re-taking the bottom-k of the
  *    union ([[kmvMerge]]) into exactly the single-pass sketch.
  *  - [[cmsBuild]]/[[cmsEstimate]] — count-min sketch (Cormode &
  *    Muthukrishnan 2005): depth×width counters estimate any item's
  *    frequency with one-sided error (never under, over only on hash
  *    collision). Cells built on disjoint parts merge by per-cell SUM
  *    into exactly the whole-corpus sketch.
  *
  * Exactness contract (the repo convention): hashing is the mirrored
  * [[hash60]]; HLL's 2^-r terms are `1.0 / (1L << r)` — exact IEEE
  * doubles, no `pow` — folded in bucket order; CMS cells are exact LONG
  * counts and the estimate is an integer MIN. Every operator is
  * hash-oracle-checkable in DuckDB, merge laws included.
  *
  * Plan shape: register/cell building is one tokenize/explode pass into
  * a partial agg whose map-side combine collapses each task's output to
  * SKETCH size (≤ groups·m, resp. depth·width rows) before the
  * exchange; estimates touch sketch-sized or watchlist-sized data only.
  */
object Sketches {

  /** Number of leading-zeros-plus-one (rho) of the hash remainder `w`
    * within `wBits` bits: `w = 0` → wBits + 1 (all zeros). `bin()` is
    * exact integer formatting in both engines — no log2. */
  private def rho(w: Column, wBits: Int): Column =
    when(w === 0L, lit(wBits + 1))
      .otherwise(lit(wBits + 1) - length(bin(w)))

  private def log2i(m: Int): Int = {
    require(m >= 2 && (m & (m - 1)) == 0, s"m must be a power of two >= 2: $m")
    java.lang.Integer.numberOfTrailingZeros(m)
  }

  /** HLL registers of `valueCol` per group: (groupCols..., bucket,
    * register). The 60-bit [[hash60]] splits into a bucket (low log2(m)
    * bits) and a remainder whose leading-zero rank is the register
    * candidate; the register is the per-bucket MAX — which is exactly
    * why sketches of disjoint parts merge losslessly ([[hllMerge]]).
    * Absent buckets mean register 0 (no row of the group hashed there);
    * [[hllEstimate]] accounts for them without materializing zeros. */
  def hllRegisters(df: DataFrame, groupCols: Seq[String], valueCol: String,
                   m: Int): DataFrame = {
    val p = log2i(m)
    val h = hash60(concat(lit("hll:"), col(valueCol)))
    df.select(groupCols.map(col) :+
        h.bitwiseAND(lit(m - 1).cast("long")).as("bucket") :+
        shiftrightunsigned(h, p).as("__w"): _*)
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(max(rho(col("__w"), 60 - p)).cast("long").as("register"))
  }

  /** Merge register sets built on disjoint corpus parts: per-bucket MAX.
    * Associative/commutative/idempotent — registers of any partition of
    * the corpus merge to exactly the single-pass registers
    * (oracle-checked by `text_hll_merged`). */
  def hllMerge(parts: Seq[DataFrame], groupCols: Seq[String]): DataFrame =
    parts.reduce(_ unionByName _)
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(max("register").as("register"))

  /** Raw HLL estimate per group from a register set:
    * `alpha_m · m² / (Σ_j 2^(−r_j))`, absent buckets contributing
    * 2^0 = 1. Output: (groupCols..., n_buckets_set, hll_distinct).
    *
    * Deliberately the RAW estimator — no small-range linear-counting or
    * large-range corrections (both need `ln`, which carries engine ulp
    * variance; the repo's exactness convention). `n_buckets_set` rides
    * along so a consumer can apply corrections downstream: small-range
    * bias shows as n_buckets_set ≪ m. The 2^-r sum folds in bucket
    * order — deterministic, mirrored. */
  def hllEstimate(registers: DataFrame, groupCols: Seq[String],
                  m: Int): DataFrame = {
    // Materialize the (bounded, ≤ groups·m rows) register set ONCE: the
    // m-witness check below and the estimate fold both read it, and
    // without this each would re-derive the registers from the corpus —
    // doubling the only corpus-sized pass.
    val regs = registers.localCheckpoint(true)
    // a register set built (or merged) under a DIFFERENT m would
    // silently mis-estimate — the bucket domain is the cheap witness
    val maxB = regs.agg(max("bucket")).head()
    require(maxB.isNullAt(0) || maxB.getLong(0) < m,
      s"register set holds bucket ${maxB.get(0)} >= m=$m — built under a different m")
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(m.toDouble))
    val inv2r = lit(1.0) /
      expr("shiftleft(CAST(1 AS BIGINT), CAST(register AS INT))").cast("double")
    regs
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_buckets_set"),
        aggregate(
          array_sort(collect_list(struct(col("bucket"), inv2r.as("v")))),
          lit(0.0), (acc, s) => acc + s.getField("v")).as("__fold"))
      .select(groupCols.map(col) :+ col("n_buckets_set") :+
        (alpha * lit(m.toDouble) * lit(m.toDouble) /
          ((lit(m.toLong) - col("n_buckets_set")).cast("double") + col("__fold")))
          .as("hll_distinct"): _*)
  }

  /** One-call per-group approximate distinct count. */
  def hllDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
                  m: Int = 64): DataFrame =
    hllEstimate(hllRegisters(df, groupCols, valueCol, m), groupCols, m)

  /** Sliding-window distinct estimate from per-frame HLL registers: for
    * every frame value `t` present in `registers`, the estimate over the
    * MAX-merge of frames `[t − trailing + 1, t]` — the sketch answer to
    * "distinct users in the trailing 24 h, per hour" (`events_hll_sliding`;
    * the exact twin is `events_engagement`'s windowed COUNT DISTINCT).
    *
    * This is where mergeability pays at 100 TB: the corpus is scanned
    * ONCE (by [[hllRegisters]], keyed by the frame column); everything
    * here touches only the register table — ≤ frames·m rows however
    * large the corpus — so re-profiling a new window length never
    * rescans the data. Exact sliding COUNT DISTINCT instead re-fans the
    * full event volume `trailing`× through one exchange.
    *
    * Shape: each register row explodes into the `trailing` window ends
    * it serves, semi-joined back to the frames that actually occur —
    * registers·trailing rows through ONE equi-hash exchange
    * (events_engagement's rolling pattern). A frame-range join would
    * read nicer but plans as a frames × registers nested loop: fine at
    * hundreds of frames, catastrophic at ten years of hours.
    *
    * `frameCol` must be an integral frame index (e.g. epoch-hour); the
    * window is closed on both ends in index units. */
  def hllSlidingEstimate(registers: DataFrame, frameCol: String,
                         trailing: Long, m: Int): DataFrame = {
    require(trailing >= 1, s"trailing window must be >= 1 frame: $trailing")
    require(trailing <= 100000L,
      s"trailing=$trailing explodes every register row that many times — re-frame coarser")
    val ends = registers.select(col(frameCol).as("__end")).distinct()
    val merged = registers
      .select(explode(sequence(col(frameCol),
          col(frameCol) + lit(trailing - 1))).as("__end"),
        col("bucket"), col("register"))
      .join(ends, Seq("__end"), "left_semi")
      .groupBy(col("__end"), col("bucket"))
      .agg(max("register").as("register"))
    hllEstimate(merged, Seq("__end"), m).withColumnRenamed("__end", frameCol)
  }

  /** KMV ("k minimum values" / bottom-k, Bar-Yossef et al. 2002) distinct
    * sketch per group: the k smallest DISTINCT [[hash60]] values of
    * `valueCol`. k hashes per group replace per-key distinct state, and
    * sketches of disjoint corpus parts merge LOSSLESSLY — any member of
    * the union's true bottom-k is in its own part's bottom-k, so the
    * bottom-k of the parts' survivor sets is exactly the single-pass
    * sketch ([[kmvMerge]]; oracle-checked by `text_kmv_merged`). The same
    * segment-sidecar story as [[hllRegisters]], built on an order
    * statistic instead of leading-zero ranks — unlike HLL it also
    * supports distinct-count estimates of set INTERSECTIONS downstream
    * (the sketches are comparable value samples, not registers).
    *
    * Plan shape: one explode/distinct pass, then bottom-k in TWO window
    * phases so no single partition ever holds a group's full distinct
    * set: per (group, h mod 64) spread-bucket bottom-k (each window
    * partition ≈ a 64th of the group's distinct values), then bottom-k
    * of the ≤ 64·k survivors. Output: (groupCols..., h), ≤ k rows per
    * group. */
  def kmvSketch(df: DataFrame, groupCols: Seq[String], valueCol: String,
                k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2: $k")
    val g = groupCols.map(col)
    val hashed = df
      .select(g :+ hash60(concat(lit("kmv:"), col(valueCol))).as("__h"): _*)
      .distinct()
    bottomKByHash(hashed, groupCols, Nil, k)
      .withColumnRenamed("__h", "h")
      .select(g :+ col("h"): _*)
  }

  /** The shared two-phase spread-bucket bottom-k behind every
    * hash-ordered sample in the repo ([[kmvSketch]], [[quantileSketch]],
    * [[Curation.stratifiedSample]]): keep each group's k rows with the
    * smallest `__h` (ties broken by `tieCols`) via a per-(group,
    * h mod 64) bottom-k then a bottom-k of the ≤ 64·k survivors — no
    * partition ever holds a group's full row set, and the oracle mirror
    * is a single bottom-k (the phases commute). Requires a `__h`
    * column; keeps `__rn` (the final 1..k hash-order rank). */
  private[graft] def bottomKByHash(df: DataFrame, groupCols: Seq[String],
                                   tieCols: Seq[String], k: Int): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val order = ("__h" +: tieCols).map(col)
    df.withColumn("__b", col("__h") % 64)
      .withColumn("__rn", row_number().over(
        W.partitionBy((groupCols :+ "__b").map(col): _*).orderBy(order: _*)))
      .where(col("__rn") <= k)
      .withColumn("__rn", row_number().over(
        W.partitionBy(groupCols.map(col): _*).orderBy(order: _*)))
      .where(col("__rn") <= k)
      .drop("__b")
  }

  /** Merge bottom-k sketches of corpus parts: bottom-k of the distinct
    * union of the parts' survivor sets (each ≤ k rows per group, so the
    * merge input is parts·k-bounded — sketch-sized work, no corpus). */
  def kmvMerge(parts: Seq[DataFrame], groupCols: Seq[String],
               k: Int): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    parts.reduce(_ unionByName _).distinct()
      .withColumn("__rn", row_number().over(
        W.partitionBy(groupCols.map(col): _*).orderBy("h")))
      .where(col("__rn") <= k)
      .select(groupCols.map(col) :+ col("h"): _*)
  }

  /** KMV estimate per group from a sketch. Fewer than k hashes means the
    * sketch IS the group's whole distinct hash set — the count is exact.
    * Otherwise the classic unbiased estimator (k−1)/U_(k), U_(k) the
    * k-th smallest hash normalized to (0,1] by the 2^60 hash domain:
    * written as the single division ((k−1)·2^60)/h_(k). (k−1)·2^60 is an
    * exactly representable double (mantissa k−1, a power-of-two scale),
    * so both engines perform ONE correctly-rounded division of identical
    * operands — the repo's log-free exactness convention.
    * Output: (groupCols..., n_min_vals, kth_min, kmv_distinct). */
  def kmvEstimate(sketch: DataFrame, groupCols: Seq[String],
                  k: Int): DataFrame = {
    val num = lit((k - 1).toDouble) * lit(math.pow(2.0, 60))
    sketch.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_min_vals"), max(col("h")).as("kth_min"))
      .withColumn("kmv_distinct",
        when(col("n_min_vals") < k, col("n_min_vals").cast("double"))
          .otherwise(num / col("kth_min").cast("double")))
  }

  /** One-call per-group KMV distinct estimate. */
  def kmvDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
                  k: Int = 64): DataFrame =
    kmvEstimate(kmvSketch(df, groupCols, valueCol, k), groupCols, k)

  /** Count-min sketch of `valueCol` occurrences: (row, col, cnt) cells,
    * `depth` hash rows × `width` columns. ONE [[hash60]] (md5) per value
    * — the depth row hashes are disjoint 15-bit SLICES of the single
    * 60-bit digest (md5 bits are uniform; slice independence is the
    * standard CMS pairwise-independence assumption), so the dominant
    * per-token cost no longer multiplies by depth (r7 verdict finding:
    * the old row-seeded md5 paid 4× the hashing it needed). The explode
    * fans out AFTER the hash; each task's map-side combine still caps
    * its shuffle output at depth·width cells regardless of input size.
    * Constraints: depth ≤ 4 (60 bits / 15), width ≤ 32768 (slice
    * domain); powers of two divide 32768 evenly, so the cell modulo is
    * bias-free for the usual power-of-two widths. */
  def cmsBuild(df: DataFrame, valueCol: String, depth: Int,
               width: Int): DataFrame = {
    requireCmsShape(depth, width)
    df.select(hash60(concat(lit("cms:"), col(valueCol))).as("__h"),
        explode(sequence(lit(0), lit(depth - 1))).as("row"))
      .select(col("row"), cmsCol(col("row"), col("__h"), width).as("col"))
      .groupBy("row", "col").agg(count(lit(1)).as("cnt"))
  }

  private def requireCmsShape(depth: Int, width: Int): Unit =
    require(depth >= 1 && depth <= 4 && width >= 1 && width <= 32768,
      s"bad sketch shape: $depth x $width (depth <= 4, width <= 32768 — " +
        "the rows are 15-bit slices of one 60-bit hash)")

  /** Merge sketches of disjoint corpus parts: per-cell SUM (exact —
    * counts are additive), same shape required. */
  def cmsMerge(parts: Seq[DataFrame]): DataFrame =
    parts.reduce(_ unionByName _)
      .groupBy("row", "col").agg(sum("cnt").as("cnt"))

  /** Frequency estimates for a (small, broadcast) watchlist of items:
    * per item the MIN over its depth cells, absent cells counting 0.
    * One-sided error: estimate ≥ true count always; > only when every
    * row collides. Output: (itemCol, cms_count). */
  def cmsEstimate(cms: DataFrame, items: DataFrame, itemCol: String,
                  depth: Int, width: Int): DataFrame = {
    requireCmsShape(depth, width)
    // Materialize the (≤ depth·width row) sketch ONCE — the shape
    // witness and the probe join both read it; without this each action
    // re-derives the cells from the corpus, doubling the corpus pass.
    val sketch = cms.localCheckpoint(true)
    // shape mismatch (cells built/merged under a different depth×width)
    // would silently under-probe — the cell domain is the cheap witness
    val bounds = sketch.agg(max("row"), max("col")).head()
    require(bounds.isNullAt(0) ||
      (bounds.getAs[Number](0).longValue < depth &&
        bounds.getAs[Number](1).longValue < width),
      s"sketch holds cell (${bounds.get(0)}, ${bounds.get(1)}) outside " +
        s"$depth x $width — built under a different shape")
    val probes = broadcast(items
      .select(col(itemCol), hash60(concat(lit("cms:"), col(itemCol))).as("__h"))
      .select(col(itemCol), explode(sequence(lit(0), lit(depth - 1))).as("row"),
        col("__h"))
      .select(col(itemCol), col("row"),
        cmsCol(col("row"), col("__h"), width).as("col")))
    probes.join(sketch, Seq("row", "col"), "left")
      .groupBy(itemCol)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_count"))
  }

  /** Mergeable quantile sketch: a DETERMINISTIC bottom-k row sample —
    * the k rows whose [[hash60]] of the row's unique id is smallest per
    * group, carrying their values. The profiling-sidecar quantile
    * summary completing the HLL/CMS/KMV family: per-shard sketches
    * merge by re-taking the bottom-k of the union ([[quantileMerge]])
    * into EXACTLY the single-pass sketch (any member of the union's
    * true bottom-k is in its own part's bottom-k), so a 100 TB corpus's
    * per-segment quantile state folds into whole-corpus quantiles
    * without rescans — the same ledger-sidecar story as the other three
    * sketches.
    *
    * Why not KLL/MRL compactors (Karnin et al. 2016; Manku et al.
    * 1998): their buffer compaction is RANDOMIZED (or buffer-boundary-
    * dependent), so the sketch is not a pure function of the input
    * multiset — no exact merge law to oracle-check and no cross-engine
    * mirror. Hash-ordered sampling (bottom-k sampling, Cohen & Kaplan
    * 2007) keeps the identical bounded-state mergeable contract and IS
    * a pure function of the multiset: the "random" sample is re-derived
    * bit-identically by any engine from md5. The trade is rank error
    * O(1/√k) (uniform-sample quantile error) versus KLL's O(1/k) — at
    * k = 256 that is ~±4% rank error, the data-quality-dashboard
    * regime; groups with ≤ k rows are EXACT (the sample is the group).
    *
    * `idCol` must uniquely identify rows (it is what gets hashed —
    * duplicate ids would correlate the sample). Values ride along
    * untouched; ordering ties on equal hashes break by value, so the
    * sketch is deterministic even under (astronomically unlikely)
    * 60-bit collisions.
    *
    * Plan shape: one projection, then bottom-k in TWO window phases so
    * no single partition ever holds a group's full row set: per
    * (group, h mod 64) spread-bucket bottom-k, then bottom-k of the
    * ≤ 64·k survivors (same shape as [[kmvSketch]]; the oracle computes
    * the equivalent single bottom-k). Output: (groupCols..., h, v),
    * ≤ k rows per group. */
  def quantileSketch(df: DataFrame, groupCols: Seq[String], idCol: String,
                     valueCol: String, k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2: $k")
    val g = groupCols.map(col)
    val proj = df.select(
      g :+ hash60(concat(lit("qsk:"), col(idCol).cast("string"))).as("__h") :+
        col(valueCol).as("v"): _*)
    bottomKByHash(proj, groupCols, Seq("v"), k)
      .withColumnRenamed("__h", "h")
      .select(g :+ col("h") :+ col("v"): _*)
  }

  /** Merge quantile sketches built on DISJOINT corpus parts: bottom-k
    * of the union of the survivor sets (each ≤ k rows per group —
    * sketch-sized work). Exactly the single-pass sketch, which is what
    * `text_quantile_merged` oracle-checks. */
  def quantileMerge(parts: Seq[DataFrame], groupCols: Seq[String],
                    k: Int): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    parts.reduce(_ unionByName _)
      .withColumn("__rn", row_number().over(
        W.partitionBy(groupCols.map(col): _*).orderBy("h", "v")))
      .where(col("__rn") <= k)
      .select(groupCols.map(col) :+ col("h") :+ col("v"): _*)
  }

  /** Quantile estimates from a sketch, one row per group per requested
    * probability. `probs` are EXACT rationals (num, den), 1 ≤ num ≤ den:
    * the estimate is the sample value at rank ⌈num·n/den⌉ — rank-based
    * selection on exact integers, NO interpolation (the estimate is an
    * element of the data; `(num·n + den − 1) DIV den` is the only
    * arithmetic, mirrored verbatim), matching the repo's
    * `quantile_disc`/`percentile_approx` discrete convention. Groups
    * whose whole row set fit in the sketch (n < k possible only then)
    * report exact discrete quantiles. Sample order is (v, h) — the hash
    * tie-break keeps equal values deterministic.
    * Output: (groupCols..., q, n_sample, q_value). */
  def quantileEstimate(sketch: DataFrame, groupCols: Seq[String],
                       probs: Seq[(Int, Int)]): DataFrame = {
    require(probs.nonEmpty && probs.forall { case (n, d) => n >= 1 && n <= d },
      s"probs must be rationals in (0, 1]: $probs")
    val W = org.apache.spark.sql.expressions.Window
    val qs = array(probs.map { case (n, d) =>
      struct(lit(n).as("num"), lit(d).as("den")) }: _*)
    sketch
      .withColumn("__vr", row_number().over(
        W.partitionBy(groupCols.map(col): _*).orderBy("v", "h")))
      .withColumn("__n", count(lit(1)).over(
        W.partitionBy(groupCols.map(col): _*)))
      .select(groupCols.map(col) :+ col("v") :+ col("__vr") :+ col("__n") :+
        explode(qs).as("__q"): _*)
      .withColumn("__num", col("__q.num").cast("long"))
      .withColumn("__den", col("__q.den").cast("long"))
      .where(col("__vr") === expr("(__num * __n + __den - 1) DIV __den"))
      .select(groupCols.map(col) :+
        (col("__num").cast("double") / col("__den")).as("q") :+
        col("__n").as("n_sample") :+ col("v").as("q_value"): _*)
  }

  /** One-call per-group discrete quantile estimates. */
  def quantiles(df: DataFrame, groupCols: Seq[String], idCol: String,
                valueCol: String, probs: Seq[(Int, Int)],
                k: Int = 256): DataFrame =
    quantileEstimate(quantileSketch(df, groupCols, idCol, valueCol, k),
      groupCols, probs)

  /** Cell column of row `row` from the item's single 60-bit hash `h`:
    * 15-bit slice `(h >>> 15·row) & 0x7FFF`, then mod width — mirrored
    * verbatim in the oracle
    * (`((h >> (i*15)) & 32767) % width` on the same md5-derived h). */
  private def cmsCol(row: Column, h: Column, width: Int): Column = {
    // functions.shiftrightunsigned takes a literal shift; depth <= 4, so
    // the four slice shifts enumerate (branch folds in codegen)
    val slice = when(row === 0, h)
      .when(row === 1, shiftrightunsigned(h, 15))
      .when(row === 2, shiftrightunsigned(h, 30))
      .otherwise(shiftrightunsigned(h, 45))
    pmod(slice.bitwiseAND(lit(32767L)), lit(width.toLong))
  }
}
