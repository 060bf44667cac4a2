package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Event-stream queries over the `events` table: the batch equivalents of
  * the Structured Streaming operators (tumbling windows, JSON props).
  * `ts` arrives as nanos-since-epoch (see [[Tables.events]]); converting
  * to micros preserves hour boundaries exactly.
  */
object EventQueries {

  /** Gap-based (30 min) per-user sessions: (user_id, session_seq,
    * start_us, end_us, n_events). Shared by the sessionization query and
    * the range-join fixture. */
  private def sessionizeBatch(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts_us", "event_id")
    val gapUs = 1800L * 1000000L
    Tables.events(s, dir)
      .withColumn("ts_us", expr("ts div 1000"))
      .withColumn("prev_us", lag(col("ts_us"), 1).over(w))
      .withColumn("brk",
        when(col("prev_us").isNull || col("ts_us") - col("prev_us") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum(col("brk")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)))
      .groupBy("user_id", "session_seq")
      .agg(min(col("ts_us")).as("start_us"), max(col("ts_us")).as("end_us"),
        count(lit(1)).as("n_events"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Tumbling 1-hour window aggregation per event type (the batch twin of
    // the streaming windowed agg; Structured Streaming runs the same
    // expression via readStream + watermark).
    "events_window_hourly" -> ((s, dir) => {
      // `ts` is nanos-since-epoch LONG (> 2^53, so no double detour): use
      // integer `div` — truncation to micros matches DuckDB's parquet
      // TIMESTAMP(NANOS) read, which truncates to its micro TIMESTAMP.
      val e = Tables.events(s, dir)
        .withColumn("ts_utc", timestamp_micros(expr("ts div 1000")))
      e.groupBy(date_trunc("hour", col("ts_utc")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(18, 2))).cast("double").as("total_value"))
    }),

    // Hourly OHLC bars per event type — the classic time-series
    // downsampling operator (candlesticks / metric rollups). Open and
    // close are the values at the earliest/latest (ts, event_id) in the
    // bar — the globally-unique event_id totalizes the tie-break, so
    // both are deterministic; high/low are raw-double compares. No
    // float arithmetic anywhere → engine-exact. Both row_number passes
    // and the final agg share ONE (hour, type) hash exchange; bar-count
    // state is bounded by hours × types, never by the event volume.
    "events_ohlc" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("hour", "event_type")
      val wAsc = w.orderBy(col("ts_us"), col("event_id"))
      val wDesc = w.orderBy(col("ts_us").desc, col("event_id").desc)
      Tables.events(s, dir)
        .withColumn("ts_us", expr("ts div 1000"))
        .withColumn("hour",
          date_trunc("hour", timestamp_micros(col("ts_us"))))
        .withColumn("__ra", row_number().over(wAsc))
        .withColumn("__rd", row_number().over(wDesc))
        .groupBy("hour", "event_type")
        .agg(count(lit(1)).as("n"),
          max(when(col("__ra") === 1, col("value"))).as("open"),
          max(col("value")).as("high"),
          min(col("value")).as("low"),
          max(when(col("__rd") === 1, col("value"))).as("close"))
    }),

    // DAU/WAU/MAU engagement series: rolling DISTINCT users over 1/7/28
    // trailing days. Rolling distinct is not frame-expressible, so each
    // (user, day) activity pair is exploded onto the days it covers
    // (day..day+6 / day..day+27) and counted per cover day — work is
    // bounded by 35× the DISTINCT user-day pairs, never by raw event
    // volume (the distinct comes first), and the count-distinct aggs
    // are partial before their one exchange. Integer epoch days,
    // timezone-free; at 100 TB swap the exact count-distinct for the
    // mergeable HLL registers (Sketches.hllRegisters) — same explode.
    "events_engagement" -> ((s, dir) => {
      val active = Tables.events(s, dir)
        .select(expr("(ts div 1000) div 86400000000").as("day"),
          col("user_id"))
        .distinct().localCheckpoint(true)
      val days = active.select("day").distinct()
      val dau = active.groupBy("day").agg(countDistinct("user_id").as("dau"))
      def rolling(w: Int, name: String) = active
        .select(explode(sequence(col("day"), col("day") + (w - 1)))
          .as("day"), col("user_id"))
        .groupBy("day").agg(countDistinct("user_id").as(name))
      days.join(dau, "day")
        .join(rolling(7, "wau"), "day")
        .join(rolling(28, "mau"), "day")
    }),

    // Trailing-24h distinct users per hour from MERGED per-hour HLL
    // registers — the sketch dual of events_engagement's exact windowed
    // COUNT DISTINCT. One corpus pass builds the per-hour registers
    // (64/hour); the sliding merge + estimate touch only the register
    // table, so at 100 TB re-windowing never rescans events (see
    // [[graft.ops.Sketches.hllSlidingEstimate]]). The oracle recomputes
    // registers + merge + raw estimate verbatim in SQL — engine-exact
    // (no log/pow; 2^-r as 1/(1<<r)).
    "events_hll_sliding" -> ((s, dir) => {
      val e = Tables.events(s, dir)
        .select(expr("(ts div 1000) div 3600000000").as("hour"),
          col("user_id").cast("string").as("uid"))
      val regs = graft.ops.Sketches.hllRegisters(e, Seq("hour"), "uid", m = 64)
      graft.ops.Sketches.hllSlidingEstimate(regs, "hour", trailing = 24L, m = 64)
    }),

    // Audience overlap from HLL registers alone (inclusion–exclusion):
    // distinct clickers, distinct purchasers, their union via the
    // lossless MAX-merge, and |A∩B| ≈ |A| + |B| − |A∪B| — the
    // segment-overlap question answered from two 64-register sketches a
    // profiling sidecar already keeps, never by re-scanning events or
    // materializing per-user sets. Raw estimates (engine-exact: no
    // log/pow), identical IEEE arithmetic order in the oracle; the
    // estimator difference can in principle go negative on tiny
    // overlaps — reported as-is, the standard sketch caveat.
    "events_hll_overlap" -> ((s, dir) => {
      // residue-class segment predicates make the overlap PARTIAL (the
      // raw fixture's every user does everything, which would degenerate
      // A = B = A∪B): A = mod-3 clickers, B = mod-2 purchasers,
      // true overlap = the mod-6 class.
      val e = Tables.events(s, dir)
        .select(col("event_type"), col("user_id"),
          col("user_id").cast("string").as("uid"))
      def regs(t: String, modBase: Int, g: String) =
        graft.ops.Sketches.hllRegisters(
          e.where(col("event_type") === t && col("user_id") % modBase === 0)
            .withColumn("g", lit(g)),
          Seq("g"), "uid", m = 64)
      def est(r: org.apache.spark.sql.DataFrame, as: String) =
        graft.ops.Sketches.hllEstimate(r, Seq("g"), m = 64)
          .select(col("hll_distinct").as(as))
      val ra = regs("click", 3, "a")
      val rb = regs("purchase", 2, "b")
      val ru = graft.ops.Sketches.hllMerge(
        Seq(ra.withColumn("g", lit("u")), rb.withColumn("g", lit("u"))), Seq("g"))
      est(ra, "est_click").crossJoin(est(rb, "est_purchase"))
        .crossJoin(est(ru, "est_union"))
        .withColumn("est_overlap",
          col("est_click") + col("est_purchase") - col("est_union"))
    }),

    // CUSUM level-shift detection over the hourly series per type: the
    // clamped recurrence C_t = max(0, C_{t-1} + (n_t − mean)) has the
    // closed form C_t = P_t − min(0, min_{j≤t} P_j) with P the plain
    // prefix sum of deviations — so the sequential-looking detector is
    // two window passes, no recursion. Deviations are cross-multiplied
    // by the hour count (d_t = n_t·T − N) so the mean never becomes a
    // float: everything is exact LONG arithmetic, engine-portable.
    // Shift flag at C_t > 5·T ≈ five sustained excess events.
    "events_cusum" -> ((s, dir) => {
      // the hourly count table is the (additive, mergeable) summary the
      // streaming twin maintains per delivery — DetectorStreamSpec pins
      // stream ≡ this batch pass through the shared finisher
      val hourly = Tables.events(s, dir)
        .withColumn("ts_utc", timestamp_micros(expr("ts div 1000")))
        .groupBy(date_trunc("hour", col("ts_utc")).as("hour"),
          col("event_type"))
        .agg(count(lit(1)).as("n"))
      graft.ops.Detectors.cusumOverHourly(hourly)
    }),

    // Naive seasonal forecast + backtest: hold out the last epoch-week,
    // forecast each (dow, hour) cell as its train-weeks hourly mean,
    // score against the held-out actuals — the baseline every fancier
    // forecaster must beat, and the same integer epoch axes as the
    // seasonality profile. All-exact counts; the mean and |err| are the
    // only float steps, each one mirrored division/abs. Bounded 7×24
    // output from two partial aggs.
    "events_seasonal_forecast" -> ((s, dir) => {
      val e = Tables.events(s, dir)
        .withColumn("ts_us", expr("ts div 1000"))
        .withColumn("wk", expr("ts_us div 604800000000"))
        .withColumn("dow", expr("(ts_us div 86400000000) % 7"))
        .withColumn("hod", expr("(ts_us % 86400000000) div 3600000000"))
      val maxWk = e.groupBy().agg(max("wk").as("__mw"))
      val ew = e.crossJoin(broadcast(maxWk))
      val train = ew.where(col("wk") < col("__mw"))
        .groupBy("dow", "hod")
        .agg(count(lit(1)).as("train_n"),
          countDistinct("wk").as("train_weeks"))
      val test = ew.where(col("wk") === col("__mw"))
        .groupBy("dow", "hod").agg(count(lit(1)).as("actual"))
      train.join(test, Seq("dow", "hod"), "left")
        .withColumn("actual", coalesce(col("actual"), lit(0L)))
        .withColumn("forecast",
          col("train_n").cast("double") / col("train_weeks").cast("double"))
        .withColumn("abs_err",
          abs(col("actual").cast("double") - col("forecast")))
        .select("dow", "hod", "train_n", "train_weeks", "actual",
          "forecast", "abs_err")
    }),

    // Trailing-window burst detection per user: events in the last hour
    // at each event, via a RANGE frame on the micros axis — the
    // rate-limit / abuse-screen primitive. RANGE (not ROWS) so
    // same-timestamp peers count together regardless of row order —
    // that is what makes the frame deterministic without a unique-key
    // tie-break. One (user) exchange, one ordered frame pass; state per
    // user is the trailing window, never the history.
    "events_burst_detect" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts_us")
        .rangeBetween(-3600000000L, 0L)
      Tables.events(s, dir)
        .withColumn("ts_us", expr("ts div 1000"))
        .withColumn("n_trailing_1h", count(lit(1)).over(w))
        .select(col("event_id"), col("user_id"), col("n_trailing_1h"),
          (col("n_trailing_1h") >= 5L).as("is_burst"))
    }),

    // Day-of-week × hour-of-day seasonality profile: the weekly rhythm
    // matrix behind capacity planning and anomaly baselines. Both axes
    // are pure integer arithmetic on the micros epoch (dow 0 =
    // Thursday, 1970-01-01's weekday) — timezone-free and engine-exact,
    // deliberately NOT dayofweek()/dow() whose numbering conventions
    // differ across engines. Bounded 7×24 output from one partial agg;
    // share is one IEEE division of exact longs.
    "events_seasonal_profile" -> ((s, dir) => {
      val e = Tables.events(s, dir)
        .withColumn("ts_us", expr("ts div 1000"))
        .withColumn("dow", expr("(ts_us div 86400000000) % 7"))
        .withColumn("hod", expr("(ts_us % 86400000000) div 3600000000"))
      val total = e.groupBy().agg(count(lit(1)).as("__total"))
      e.groupBy("dow", "hod")
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(18, 2))).cast("double")
            .as("total_value"))
        .crossJoin(broadcast(total))
        .withColumn("share",
          col("n").cast("double") / col("__total").cast("double"))
        .drop("__total")
    }),

    // Hourly-volume anomaly screen per event type: z-score of each hour's
    // count against its type's distribution (exact LONG sums → IEEE
    // z-expression; see Profile.zScores), |z| >= 2 flags the hour.
    "events_anomaly" -> ((s, dir) => {
      val e = Tables.events(s, dir)
        .withColumn("ts_utc", timestamp_micros(expr("ts div 1000")))
      val hourly = e.groupBy(date_trunc("hour", col("ts_utc")).as("hour"),
          col("event_type"))
        .agg(count(lit(1)).as("n"))
      graft.ops.Profile.zScores(hourly, Seq("event_type"), "n", threshold = 2.0)
        .select("hour", "event_type", "n", "z", "is_anomaly")
    }),

    // Interval-overlap self-join: pairs of DIFFERENT users' gap-sessions
    // that overlap in time, with the exact overlap duration — the
    // interval×interval complement of events_range_join's point-in-
    // interval binning (co-presence/concurrency attribution, "who was
    // online together"). Candidates come from exploding each session
    // onto its covered HOUR bins and equi-joining on the bin (fan-out =
    // span/1h + 1, here ≤ 2 — never a cross join or an inequality-only
    // nested loop); the exact closed-interval predicate then filters,
    // and distinct() folds pairs sharing several bins (identical output
    // rows by construction). At 100 TB the bin is the shuffle key — an
    // adversarial mega-bin would salt by sub-bin, the standard binned
    // interval-join remedy.
    "events_interval_join" -> ((s, dir) => {
      val sess = sessionizeBatch(s, dir)
      val binned = sess.withColumn("bin",
        explode(expr("sequence(start_us div 3600000000, end_us div 3600000000)")))
      val a = binned.select(col("bin"), col("user_id").as("user_a"),
        col("session_seq").as("session_a"), col("start_us").as("sa"),
        col("end_us").as("ea"))
      val b = binned.select(col("bin"), col("user_id").as("user_b"),
        col("session_seq").as("session_b"), col("start_us").as("sb"),
        col("end_us").as("eb"))
      a.join(b, Seq("bin"))
        .where(col("user_a") < col("user_b") &&
          col("sa") <= col("eb") && col("sb") <= col("ea"))
        .select(col("user_a"), col("session_a"), col("user_b"), col("session_b"),
          (least(col("ea"), col("eb")) - greatest(col("sa"), col("sb")))
            .as("overlap_us"))
        .distinct()
    }),

    // The z-score screen through the INGEST path: two ledgered
    // deliveries into the DetectorStream sidecars, then the read-side
    // hourly fold + the shared zScores finisher — hash-equal to the
    // batch events_anomaly over the union (hourly counts SUM-merge
    // exactly for any delivery order, so the split is arbitrary). The
    // anomaly screen a 100 TB ingest keeps without rescanning events.
    "events_anomaly_after_ingest" -> ((s, dir) => {
      val t = "det_ingest_anom"
      (Seq(t + "_hourly", t + "_vhist", t + "_events", t + "_burst") :+
        graft.io.SegmentedIndex.ledgerTable(t))
        .foreach(x => s.sql(s"DROP TABLE IF EXISTS $x"))
      val e = Tables.events(s, dir).select(col("event_id"), col("user_id"),
        col("event_type"), expr("ts div 1000").as("ts_us"), col("value"))
      graft.streaming.DetectorStream.ingestBatch(
        e.where(col("event_id") % 2 === 0), "b0", t)
      graft.streaming.DetectorStream.ingestBatch(
        e.where(col("event_id") % 2 === 1), "b1", t)
      graft.streaming.DetectorStream.readZScores(s, t)
    }),

    // Per-hour distinct active users: exact here (the oracle needs exact
    // values); at 100 TB swap count_distinct for approx_count_distinct —
    // the HLL sketch turns the two-phase exact-distinct shuffle (rows ∝
    // distinct pairs) into mergeable constant-size state, same query
    // shape (the dq_profile approx=true pattern).
    "events_unique_users" -> ((s, dir) => {
      val e = Tables.events(s, dir)
        .withColumn("ts_utc", timestamp_micros(expr("ts div 1000")))
      e.groupBy(date_trunc("hour", col("ts_utc")).as("hour"))
        .agg(count_distinct(col("user_id")).as("unique_users"),
          count(lit(1)).as("n_events"))
    }),

    // JSON property extraction + aggregation (semi-structured props).
    "events_json_agg" -> ((s, dir) =>
      Tables.events(s, dir)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("k")).as("sum_k"),
          max(col("k")).as("max_k"))),

    // Batch sessionization: gap-based session assignment (lag + running sum
    // of session-break flags), then per-session aggregation. This is the
    // batch twin of [[graft.streaming.EventStreams.sessionize]] — same
    // 30-minute gap rule, expressed as two window passes over one
    // per-user shuffle (both windows share the user_id partitioning, so
    // Catalyst plans a single Exchange).
    "events_sessionize_batch" -> ((s, dir) => sessionizeBatch(s, dir)),

    // Gaps-and-islands run-length encoding: maximal runs of CONSECUTIVE
    // same-type events per user (island id = event rank − rank within
    // type, the classic two-rank difference — pure integer arithmetic,
    // one user-partitioned window pass). Output = one row per island
    // with its length and time span: the "3 failed payments in a row"
    // shape that sessionization-by-gap cannot express.
    "events_islands" -> ((s, dir) => {
      val e = Tables.events(s, dir)
        .withColumn("ts_us", expr("ts div 1000"))
      val wAll = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
      val wTyp = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id", "event_type").orderBy(col("ts_us"), col("event_id"))
      e.select(col("user_id"), col("event_type"), col("ts_us"), col("event_id"))
        .withColumn("__isl",
          row_number().over(wAll) - row_number().over(wTyp))
        .groupBy(col("user_id"), col("event_type"), col("__isl"))
        .agg(count(lit(1)).as("run_len"),
          min(col("ts_us")).as("start_us"), max(col("ts_us")).as("end_us"),
          min(col("event_id")).as("first_event_id"))
        .drop("__isl")
    }),

    // Global concurrency sweep line: gap-sessions become ±1 boundary
    // points and one GLOBAL running sum (the two-phase parallel prefix
    // sum — never a single-partition window) tracks how many sessions
    // are open at every state change; per-hour MAX summarizes. Point
    // order (t, starts-before-ends, user, session) is mirrored in the
    // oracle; the per-hour MAX is invariant to within-tie permutations
    // anyway (a tie group's prefix values form one monotone run).
    "events_concurrency" -> ((s, dir) => {
      val iv = sessionizeBatch(s, dir)
      val pts = iv.select(col("start_us").as("t"), lit(0).as("dord"),
          lit(1L).as("d"), col("user_id"), col("session_seq"))
        .unionAll(iv.select(col("end_us").as("t"), lit(1).as("dord"),
          lit(-1L).as("d"), col("user_id"), col("session_seq")))
      graft.ops.Curation.parallelRunningSum(pts, Seq.empty,
          Seq("t", "dord", "user_id", "session_seq"), "d", "conc")
        .groupBy((expr("t div 3600000000") * lit(3600000000L)).as("hour_us"))
        .agg(max(col("conc")).as("max_concurrent"),
          count(lit(1)).as("n_points"))
    }),

    // Exact time-weighted average value per user — the statistic a
    // last-observation-carried-forward sensor/billing pipeline needs,
    // where the plain mean over-weights bursts. Each interval
    // contributes value·Δt in EXACT integer arithmetic (cents × µs,
    // summed in DECIMAL(38,0) so a 100 TB stream cannot wrap); the twa
    // is two correctly-rounded divisions on identical operands.
    "events_time_weighted" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts_us", "event_id")
      Tables.events(s, dir)
        .withColumn("ts_us", expr("ts div 1000"))
        .withColumn("cents",
          floor(col("value") * lit(100.0) + lit(0.5)).cast("long"))
        .withColumn("dt", lead(col("ts_us"), 1).over(w) - col("ts_us"))
        .where(col("dt").isNotNull)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_intervals"),
          sum((col("cents") * col("dt")).cast("decimal(38,0)")).as("__num"),
          sum(col("dt")).as("__den"))
        .where(col("__den") > 0)
        .select(col("user_id"), col("n_intervals"),
          (col("__num").cast("double") / col("__den").cast("double")
            / lit(100.0)).as("twa"))
    }),

    // Binned range join: every event matched to its containing session
    // interval via bucket-explosion equi-join instead of the
    // nested-loop plan an inequality join gets (see
    // [[graft.ops.RangeJoin]]).
    "events_range_join" -> ((s, dir) => {
      val sessions = sessionizeBatch(s, dir)
        .select("user_id", "session_seq", "start_us", "end_us")
      val points = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), expr("ts div 1000").as("ts_us"))
      graft.ops.RangeJoin.pointInInterval(points, "ts_us",
        sessions, "start_us", "end_us", Seq("user_id"),
        bucketWidth = 3600L * 1000000L)
        .select("event_id", "user_id", "session_seq")
    }),

    // Pivot: per-user event-type counts as columns. Pivot values are given
    // explicitly, so Spark skips the values-discovery job — one scan, one
    // shuffle (required at any scale; implicit pivot adds a full extra
    // aggregation just to enumerate values).
    "events_pivot_type" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)),

    // Purchase attribution (the batch run of the stream-stream join in
    // [[graft.streaming.EventStreams.attributedPurchases]] — watermarks
    // no-op in batch, semantics identical).
    "events_attribution" -> ((s, dir) =>
      graft.streaming.EventStreams.attributedPurchases(
        Tables.events(s, dir).select(col("event_id"), expr("ts div 1000").as("ts_us"),
          col("user_id"), col("event_type"), col("value")))),

    // As-of join: each purchase enriched with the user's most recent
    // click at-or-before it (union-window formulation — one shuffle,
    // linear; see [[graft.ops.AsOfJoin]]). Oracle: DuckDB's native ASOF.
    "events_asof_click" -> ((s, dir) => {
      val e = Tables.events(s, dir).select(col("event_id"),
        expr("ts div 1000").as("ts_us"), col("user_id"), col("event_type"))
      val purchases = e.where(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"), col("ts_us"))
      val clicks = e.where(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"), col("ts_us"))
      graft.ops.AsOfJoin.asOf(purchases, clicks, Seq("user_id"),
        "ts_us", "ts_us", Seq("click_id"), "click_id")
    }),

    // Theil-Sen robust trend per user over (ts, value): median of
    // pairwise slopes after a deterministic systematic thin to ≤ 100
    // points/key (bounds the quadratic pair set at any corpus size).
    // Lower-median pick ordered by (slope, id_i, id_j) — no
    // interpolation, one IEEE division per pair on exact micros/doubles.
    "events_theilsen" -> ((s, dir) =>
      graft.ops.Experiment.theilSen(
        Tables.events(s, dir)
          .withColumn("ts_us", expr("ts div 1000")),
        "user_id", "event_id", "ts_us", "value", maxPerKey = 100)),

    // Two-sample A/B readout per event type (cohort A = even user_id):
    // Welch's t from one pass of exact DECIMAL sums + Mann-Whitney U
    // with average-rank ties kept exact on the doubled-integer rank
    // axis — the parametric and rank-based experiment answers side by
    // side. One rank window + one partial agg; #event_types rows out.
    "events_ab_test" -> ((s, dir) =>
      graft.ops.Experiment.abTest(Tables.events(s, dir),
        "event_type", "user_id % 2 = 0", "value")),

    // Robust (median/MAD) outlier profile per event type — the
    // heavy-tail-safe twin of events_anomaly's mean/σ z-scores, fully
    // ENGINE-EXACT: medians are lower-median crossings over integer
    // cents computed with the grouped two-phase parallel prefix sum
    // (never a per-type single-partition sort), deviations and the
    // 3×MAD outlier test are pure integer arithmetic — no float ever.
    "events_mad_anomaly" -> ((s, dir) => {
      // r9: the prefix sums now run over the (event_type, cents) VALUE
      // HISTOGRAM instead of corpus rows — same lower-median crossings,
      // identical output, but per-type window state is cents-domain-
      // bounded; the histogram is also the additive summary the
      // streaming twin maintains (DetectorStreamSpec: stream ≡ batch).
      val hist = Tables.events(s, dir)
        .groupBy(col("event_type"),
          floor(col("value") * lit(100.0) + lit(0.5)).cast("long").as("cents"))
        .agg(count(lit(1)).as("cnt"))
      graft.ops.Detectors.madOverHist(hist)
    }),

    // Per-type inter-arrival distribution — the latency/cadence profile
    // an ops pipeline monitors: gaps between successive SAME-TYPE events
    // of a user (exact integer seconds), exact percentiles per type.
    "events_gap_quantiles" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id", "event_type").orderBy("ts_us", "event_id")
      Tables.events(s, dir)
        .withColumn("ts_us", expr("ts div 1000"))
        .withColumn("gap_s",
          ((col("ts_us") - lag(col("ts_us"), 1).over(w)) / 1000000L).cast("long"))
        .where(col("gap_s").isNotNull)
        .groupBy("event_type")
        .agg(percentile(col("gap_s"), lit(0.5)).as("p50"),
          percentile(col("gap_s"), lit(0.9)).as("p90"),
          percentile(col("gap_s"), lit(0.99)).as("p99"),
          count(lit(1)).as("n_gaps"))
    }),

    // FORWARD as-of with tolerance (the other half of the merge_asof
    // surface): each click attaches the NEXT purchase within 2 hours —
    // nulled (click kept) when none lands in the window. Forward is the
    // backward walk on negated timestamps: still one union shuffle +
    // one linear window pass, never a range join.
    "events_asof_next" -> ((s, dir) => {
      val e = Tables.events(s, dir).select(col("event_id"),
        expr("ts div 1000").as("ts_us"), col("user_id"), col("event_type"))
      val clicks = e.where(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"), col("ts_us"))
      val purchases = e.where(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"), col("ts_us"))
      graft.ops.AsOfJoin.asOfDirectional(clicks, purchases, Seq("user_id"),
        "ts_us", "ts_us", Seq("purchase_id"), "purchase_id",
        forward = true, tolerance = Some(7200L * 1000000L))
    }),

    // Sliding (hopping) 1-hour windows every 30 minutes: each event lands
    // in exactly two windows. Same `window()` expression Structured
    // Streaming runs; batch explode of the window set (oracle mirrors the
    // two hop-aligned starts per event).
    "events_window_sliding" -> ((s, dir) => {
      val e = Tables.events(s, dir)
        .withColumn("ts_utc", timestamp_micros(expr("ts div 1000")))
      e.groupBy(window(col("ts_utc"), "1 hour", "30 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(unix_micros(col("window.start")).as("win_start_us"),
          col("event_type"), col("n"))
    }),

    // Per-user activity profile: event counts, distinct active days
    // (integer epoch-day arithmetic — timezone-free, engine-exact),
    // first/last event micros, and the exact decimal value total. One
    // partial-aggregated exchange on user_id; the per-user state is a
    // handful of scalars + a bounded distinct-day set (≤ days in the
    // stream horizon), so the profile scales with users, not events.
    "events_user_profile" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      Tables.events(s, dir)
        .withColumn("ts_us", expr("ts div 1000"))
        .withColumn("day", expr("ts_us div 86400000000"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("day")).as("active_days"),
          min(col("ts_us")).as("first_us"),
          max(col("ts_us")).as("last_us"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
    }),

    // Sessionization-style gap analysis per user via lag window.
    // Goh-Barabási burstiness parameter per event type over per-user
    // inter-arrival gaps: B = (σ − μ)/(σ + μ) ∈ (−1, 1) — bursty
    // human-like traffic reads > 0, a Poisson process 0, a metronome
    // −1. Log-free: moment sums are exact DECIMALs (gap squares would
    // overflow LONG), σ is one sqrt, B one guarded division. One
    // user-window pass + one partial agg; |types| rows out.
    "events_gap_burstiness" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts_us", "event_id")
      val gaps = Tables.events(s, dir)
        .withColumn("ts_us", expr("ts div 1000"))
        .withColumn("prev_us", lag(col("ts_us"), 1).over(w))
        .where(col("prev_us").isNotNull)
        .select(col("event_type"),
          (col("ts_us") - col("prev_us"))
            .cast(org.apache.spark.sql.types.DecimalType(19, 0)).as("g"))
      gaps.groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("g")).as("__s"),
          sum(col("g") * col("g")).as("__ss"))
        .select(col("event_type"), col("n"),
          (col("__s").cast("double") / col("n").cast("double")).as("mean_gap_us"),
          when(col("n") > 1, {
            val m = col("__s").cast("double") / col("n").cast("double")
            val v = (col("__ss").cast("double") -
              col("__s").cast("double") * col("__s").cast("double") /
                col("n").cast("double")) /
              (col("n").cast("double") - lit(1.0))
            (sqrt(v) - m) / (sqrt(v) + m)
          }).as("burstiness"))
    }),

    "events_user_gaps" -> ((s, dir) => {
      // Work in truncated micros (matches DuckDB's ns→µs parquet read) and
      // order by (µs, event_id) so equal-µs ties resolve identically.
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts_us", "event_id")
      Tables.events(s, dir)
        .withColumn("ts_us", expr("ts div 1000"))
        .withColumn("prev_us", lag(col("ts_us"), 1).over(w))
        .withColumn("gap_s", ((col("ts_us") - col("prev_us")) / 1000000L).cast("double"))
        .select("user_id", "event_id", "gap_s")
    }),

    // Truncated exponentially-weighted moving value per user (α = 1/2,
    // 16 taps): the smoothing every monitoring pipeline runs, in the
    // repo's engine-exact formulation. Dyadic weights 2^-(j+1) make the
    // weighted sum EXACT integer arithmetic — values scale to cents
    // (floor(v·100 + 0.5): floor, never CAST, because double→int casts
    // truncate in Spark but round in DuckDB), each tap scales by
    // 2^(15−j), the LONG tap sum is order-free — and only the final
    // rescale divides (÷2^16 exact, ÷100 once correctly rounded). One
    // window pass; per-row state is the 16 lags.
    // Grouped top-k through the native bounded-heap aggregate
    // ([[graft.expressions.TopKAgg]]): top-5 events by value per type
    // with O(k) state per (group, partition) and map-side partials —
    // at most k rows per group per input partition reach the exchange,
    // vs the window formulation shuffling and sorting every row. The
    // oracle is the equivalent row_number window; EventStreamSpec pins
    // the two formulations equal inside Spark too.
    "events_topk_per_type" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(graft.expressions.TopKAgg.topK(
          struct(col("value"), col("event_id")), 5,
          directions = Seq(false, true)).as("__top"))
        .select(col("event_type"),
          posexplode(col("__top")).as(Seq("__i", "__s")))
        .select(col("event_type"), (col("__i") + 1).cast("long").as("rank"),
          col("__s.value").as("value"), col("__s.event_id").as("event_id"))),

    // The maintained top-k leaderboard end-to-end: two
    // SketchStream.ingestTopKBatch deliveries (even then odd event ids)
    // into the `_tpk` state, read back through the monoid fold — the
    // ingest path must be indistinguishable from the batch aggregate
    // over the union, so the TWO queries share one oracle.
    "events_topk_after_ingest" -> ((s, dir) => {
      val t = "events_topk_ingest_q"
      val SI = graft.io.SegmentedIndex
      Seq(t + "_tpk", SI.ledgerTable(t + "_tpk"))
        .foreach(x => s.sql(s"DROP TABLE IF EXISTS $x"))
      val e = Tables.events(s, dir)
        .select(col("event_type"), col("value"), col("event_id"))
      val keys = Seq("value" -> false, "event_id" -> true)
      graft.streaming.SketchStream.ingestTopKBatch(
        e.where(col("event_id") % 2 === 0), "b0", t,
        Seq("event_type"), keys, k = 5)
      graft.streaming.SketchStream.ingestTopKBatch(
        e.where(col("event_id") % 2 === 1), "b1", t,
        Seq("event_type"), keys, k = 5)
      graft.streaming.SketchStream.readTopK(s, t, Seq("event_type"), keys, k = 5)
    }),

    // Rolling DISCRETE median of value over each user's trailing 7
    // events — the robust-center twin of events_ewma (one wild outlier
    // moves a mean; it cannot move a median). The frame sort is over a
    // ROWS-bounded window, so per-row state is the 7-element frame —
    // bounded regardless of corpus size — and the lower-middle element
    // of the sorted frame is a VALUE COPY, never an interpolation: no
    // float arithmetic anywhere, both engines pick the same element.
    "events_rolling_median" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(-6, org.apache.spark.sql.expressions.Window.currentRow)
      Tables.events(s, dir)
        .withColumn("__win", array_sort(collect_list(col("value")).over(w)))
        .select(col("event_id"), col("user_id"), col("value"),
          expr("element_at(__win, CAST((size(__win) + 1) div 2 AS INT))")
            .as("rolling_median"),
          size(col("__win")).cast("long").as("win_n"))
    }),

    // ML feature materialization — the per-event training-feature row a
    // model pipeline writes out: lags, deltas, inter-arrival gap, and a
    // 5-row rolling sum/mean. The rolling sum goes through EXACT
    // DECIMAL(18,2) (the rel_window_range_frame convention): engines
    // disagree on sliding-float summation order (segment trees vs frame
    // re-evaluation), decimal accumulation is order-free. One per-user
    // window pass; every feature is frame arithmetic, no self-joins.
    "events_feature_matrix" -> ((s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
      val w5 = w.rowsBetween(-4, 0)
      Tables.events(s, dir)
        .select(col("user_id"), col("event_id"),
          expr("ts div 1000").as("ts_us"), col("value"))
        .select(col("user_id"), col("event_id"), col("ts_us"), col("value"),
          lag(col("value"), 1).over(w).as("lag1"),
          lag(col("value"), 3).over(w).as("lag3"),
          (col("value") - lag(col("value"), 1).over(w)).as("delta1"),
          (col("ts_us") - lag(col("ts_us"), 1).over(w)).as("gap_us"),
          sum(col("value").cast(DecimalType(18, 2))).over(w5)
            .cast("double").as("rsum5"),
          count(lit(1)).over(w5).cast("long").as("rcnt5"))
        .withColumn("rmean5",
          col("rsum5") / col("rcnt5").cast("double"))
    }),

    // Bot/abuse score per user: peak events-per-minute (burst volume),
    // type-concentration via the Simpson index Σnᵢ²/n² (a bot hammering
    // one endpoint concentrates; the index is exact integers + ONE
    // division — the log-free entropy stand-in), and the composite
    // flag. Two partial aggs (per-minute, per-type) + a per-user join;
    // no per-user arrays or strings, so state is bounded at any scale.
    "events_bot_score" -> ((s, dir) => {
      val e = Tables.events(s, dir)
        .select(col("user_id"), expr("(ts div 1000) div 60000000").as("m"),
          col("event_type"))
      val peak = e.groupBy("user_id", "m").agg(count(lit(1)).as("__c"))
        .groupBy("user_id").agg(max(col("__c")).as("peak_per_min"))
      val types = e.groupBy("user_id", "event_type")
        .agg(count(lit(1)).as("__ni"))
        .groupBy("user_id")
        .agg(sum(col("__ni")).as("n_events"),
          sum(col("__ni") * col("__ni")).as("__sq"),
          count(lit(1)).as("n_types"))
      peak.join(types, "user_id")
        .select(col("user_id"), col("n_events"), col("peak_per_min"),
          col("n_types"),
          (col("__sq").cast("double") /
            (col("n_events") * col("n_events")).cast("double")).as("simpson"))
        .withColumn("suspicious",
          col("peak_per_min") >= 2L || col("simpson") >= 0.22)
    }),

    "events_ewma" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts_us", "event_id")
      val taps = (0 until 16).map(j =>
        coalesce(lag(col("cents"), j).over(w), lit(0L)) * lit(1L << (15 - j)))
        .reduce(_ + _)
      Tables.events(s, dir)
        .withColumn("ts_us", expr("ts div 1000"))
        .withColumn("cents",
          floor(col("value") * lit(100.0) + lit(0.5)).cast("long"))
        .select(col("event_id"), col("user_id"),
          (taps.cast("double") / lit(65536.0) / lit(100.0)).as("ewma"))
    }),

    // First-order Markov transition matrix of the event stream: per-user
    // ordered next-event pairs → (from, to) counts and row-normalized
    // probabilities. One window pass + one pair-sized aggregation; the
    // matrix is |event types|² — driver-safe at any corpus size. The
    // probability is one IEEE division on exact LONG counts.
    "events_transitions" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts_us", "event_id")
      val pairs = Tables.events(s, dir)
        .withColumn("ts_us", expr("ts div 1000"))
        .withColumn("to_type", lead(col("event_type"), 1).over(w))
        .where(col("to_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("to_type"))
        .agg(count(lit(1)).as("n"))
      val byFrom = org.apache.spark.sql.expressions.Window.partitionBy("from_type")
      pairs.withColumn("p",
        col("n").cast("double") / sum(col("n")).over(byFrom).cast("double"))
    }),

    // Stationary distribution of the behavior Markov chain: 8 power-
    // iteration rounds of π ← πP from uniform over the transition
    // matrix (the long-run "where do users spend their time" readout
    // behind events_transitions). One corpus pass builds P; every round
    // after is |types|²-row arithmetic with contributor-ordered folds
    // (sorted by from_type — bit-stable under any partitioning) and
    // per-round lineage truncation.
    "events_markov_stationary" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts_us", "event_id")
      val pairs = Tables.events(s, dir)
        .withColumn("ts_us", expr("ts div 1000"))
        .withColumn("to_type", lead(col("event_type"), 1).over(w))
        .where(col("to_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("to_type"))
        .agg(count(lit(1)).as("n"))
      val byFrom = org.apache.spark.sql.expressions.Window.partitionBy("from_type")
      val P = pairs.withColumn("p",
          col("n").cast("double") / sum(col("n")).over(byFrom).cast("double"))
        .select("from_type", "to_type", "p").localCheckpoint(true)
      val states = P.select(col("from_type").as("state")).distinct()
      var v = states
        .crossJoin(broadcast(states.agg(count(lit(1)).as("__k"))))
        .select(col("state"), (lit(1.0) / col("__k").cast("double")).as("prob"))
        .localCheckpoint(true)
      for (_ <- 1 to 8) {
        v = P.join(v, P("from_type") === v("state"))
          .select(col("from_type"), col("to_type"),
            (col("prob") * col("p")).as("__m"))
          .groupBy(col("to_type"))
          .agg(aggregate(
            array_sort(collect_list(struct(col("from_type"), col("__m").as("m")))),
            lit(0.0), (acc, x) => acc + x.getField("m")).as("prob"))
          .select(col("to_type").as("state"), col("prob"))
          .localCheckpoint(true)
      }
      v
    }),

    // Top user journeys: each session's first-5 event-type path, ranked
    // by frequency — the path-mining readout over the same gap
    // sessionization. Per-session state is ≤ 5 ordered types (bounded
    // fold); the path table is session-sized and the global top-20 plans
    // as TakeOrderedAndProject.
    "events_top_paths" -> ((s, dir) => {
      val W = org.apache.spark.sql.expressions.Window
      val w = W.partitionBy("user_id").orderBy("ts_us", "event_id")
      val gapUs = 1800L * 1000000L
      val rows = Tables.events(s, dir)
        .withColumn("ts_us", expr("ts div 1000"))
        .withColumn("prev_us", lag(col("ts_us"), 1).over(w))
        .withColumn("brk",
          when(col("prev_us").isNull || col("ts_us") - col("prev_us") > gapUs, 1L)
            .otherwise(0L))
        .withColumn("session_seq", sum(col("brk")).over(
          w.rowsBetween(W.unboundedPreceding, W.currentRow)))
        .withColumn("rn", row_number().over(
          W.partitionBy("user_id", "session_seq").orderBy("ts_us", "event_id")))
        .where(col("rn") <= 5)
      rows.groupBy("user_id", "session_seq")
        .agg(array_join(transform(
          array_sort(collect_list(struct(col("rn"), col("event_type")))),
          x => x.getField("event_type")), ">").as("path"))
        .groupBy("path").agg(count(lit(1)).as("n_sessions"))
        .orderBy(col("n_sessions").desc, col("path"))
        .limit(20)
    }),

    // MATCH_RECOGNIZE-lite sequence-pattern detection: count, per user,
    // the non-overlapping occurrences of `view (click)* purchase` —
    // browse-to-buy runs with nothing else in between — by folding each
    // user's (ts, event_id)-ordered type sequence into a code string
    // (the five fixture types have distinct initials) and counting
    // leftmost regex matches. For THIS pattern greedy-vs-longest regex
    // semantics coincide (after the v, the c-run is forced by the
    // following p), so Java regex and DuckDB's RE2 agree. Unlike the
    // capped-array path family (top_paths' rn<=5), the folded state here
    // is a STRING, so per-user activity is HARD-capped: only the first
    // 10k events (ts, event_id order) enter the fold — a 10⁸-event bot
    // account costs one 10 KB buffer, not a multi-GB string — and the
    // cut is surfaced as `truncated` (n_events stays the TOTAL). The cap
    // rides the same (user) exchange: row_number and the groupBy share
    // hash(user_id) partitioning, and collect_list skips the NULLs the
    // over-cap rows become, so it is one window + one agg, no extra
    // shuffle. Match counting is per-row scan work.
    "events_pattern_match" -> ((s, dir) => {
      val cap = 10000
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
      val seqs = Tables.events(s, dir)
        .withColumn("ts_us", expr("ts div 1000"))
        .withColumn("rn", row_number().over(w))
        .select(col("user_id"), col("rn"),
          when(col("rn") <= cap, struct(col("ts_us"), col("event_id"),
            substring(col("event_type"), 1, 1).as("c"))).as("k"))
        .groupBy("user_id")
        .agg(concat_ws("", transform(array_sort(collect_list(col("k"))),
          x => x.getField("c"))).as("seq"),
          count(lit(1)).as("n_events"))
      seqs.select(col("user_id"), col("n_events"),
          size(expr("regexp_extract_all(seq, 'vc*p', 0)")).cast("long").as("n_matches"),
          (col("n_events") > cap).as("truncated"))
        .where(col("n_matches") > 0)
    }),

    // Ordered funnel view → click → purchase: earliest completion time
    // per step, each step strictly after its predecessor (see
    // [[graft.ops.Funnel]] — min-aggregates per step, co-partitioned
    // joins, no per-user arrays).
    "events_funnel" -> ((s, dir) =>
      graft.ops.Funnel.funnel(
        Tables.events(s, dir).withColumn("ts_us", expr("ts div 1000")),
        "user_id", "ts_us", "event_type", Seq("view", "click", "purchase"))),

    // Funnel A/B: per step, the two-proportion z statistic between the
    // even/odd-user cohorts on step conversion (completed ≥ i given
    // ≥ i−1) — the experiment readout product analytics runs on every
    // funnel change. Exact counts from ONE funnel pass + one agg row;
    // the z is one guarded IEEE expression per step (null when a
    // cohort is empty or the pooled rate is degenerate).
    "events_funnel_ab" -> ((s, dir) => {
      val f = graft.ops.Funnel.funnel(
        Tables.events(s, dir).withColumn("ts_us", expr("ts div 1000")),
        "user_id", "ts_us", "event_type", Seq("view", "click", "purchase"))
        .select(col("user_id"), col("steps_completed"),
          (col("user_id") % 2 === 0).as("__a"))
      def cnt(a: Boolean, atLeast: Int) =
        sum(when(col("__a") === a && col("steps_completed") >= atLeast, 1L)
          .otherwise(0L))
      val g = f.agg(
        cnt(true, 1).as("na1"), cnt(true, 2).as("na2"), cnt(true, 3).as("na3"),
        cnt(false, 1).as("nb1"), cnt(false, 2).as("nb2"), cnt(false, 3).as("nb3"))
        .localCheckpoint(true)
      def stepRow(i: Int) = {
        val (nA, xA) = (col(s"na${i - 1}"), col(s"na$i"))
        val (nB, xB) = (col(s"nb${i - 1}"), col(s"nb$i"))
        val pA = xA.cast("double") / nA.cast("double")
        val pB = xB.cast("double") / nB.cast("double")
        val pp = (xA + xB).cast("double") / (nA + nB).cast("double")
        g.select(lit(i.toLong).as("step"),
          nA.as("n_a"), xA.as("x_a"), pA.as("p_a"),
          nB.as("n_b"), xB.as("x_b"), pB.as("p_b"),
          when(nA > 0 && nB > 0 && pp > 0.0 && pp < 1.0,
            (pA - pB) / sqrt(pp * (lit(1.0) - pp) *
              (lit(1.0) / nA.cast("double") + lit(1.0) / nB.cast("double"))))
            .as("z"))
      }
      stepRow(2).unionByName(stepRow(3))
    }),

    // The same funnel with a ONE-DAY conversion window (between the p25
    // and p50 of this table's first-click delay, so the gate genuinely
    // splits the population): steps count only within entry + window
    // (inclusive) — the "converted within N" definition, batch twin of
    // the streaming funnel's window-gated crediting.
    "events_funnel_window" -> ((s, dir) =>
      graft.ops.Funnel.funnel(
        Tables.events(s, dir).withColumn("ts_us", expr("ts div 1000")),
        "user_id", "ts_us", "event_type", Seq("view", "click", "purchase"),
        conversionWindow = Some(86400000000L))),

    // Cohort retention: users grouped by first-seen week, activity
    // counted per week offset — the classic retention triangle. Weeks
    // are pure integer arithmetic on epoch micros (`div 7·86400·10^6`,
    // Thursday-aligned), not calendar truncation, so the bucketing is
    // engine-exact and timezone-free. Plan shape: one user-keyed
    // partial-agg shuffle for cohorts, a user-keyed join (co-partitioned
    // with it), one (cohort, offset) agg — the distinct-count runs
    // map-side partial on (cohort, offset, user).
    "events_cohort_retention" -> ((s, dir) => {
      val e = Tables.events(s, dir)
        .withColumn("week", expr("(ts div 1000) div 604800000000"))
      val cohorts = e.groupBy("user_id").agg(min(col("week")).as("cohort_week"))
      e.join(cohorts, "user_id")
        .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_events"))
    }),

    // Time-series RESAMPLE + forward fill: per-user hourly totals, the
    // missing hours inside each user's [first, last] active span
    // materialized from a generated spine (sequence + explode — fully
    // distributed, state per user bounded by the dataset's duration in
    // hours), gaps carrying the last observed hour's value forward.
    // The ffill window is rows-unbounded-preceding per user — the same
    // bounded-by-key contract as every other window in this family.
    "events_gapfill" -> ((s, dir) => {
      val W = org.apache.spark.sql.expressions.Window
      val e = Tables.events(s, dir)
        .withColumn("ts_utc", timestamp_micros(expr("ts div 1000")))
      val hourly = e
        .groupBy(col("user_id"), date_trunc("hour", col("ts_utc")).as("hour"))
        .agg(sum(col("value").cast(DecimalType(18, 2))).cast("double").as("hour_value"))
      val spine = hourly.groupBy("user_id")
        .agg(min("hour").as("__mn"), max("hour").as("__mx"))
        .select(col("user_id"),
          explode(sequence(col("__mn"), col("__mx"), expr("INTERVAL 1 HOUR"))).as("hour"))
      spine.join(hourly, Seq("user_id", "hour"), "left")
        .withColumn("observed", col("hour_value").isNotNull)
        .withColumn("filled_value",
          last(col("hour_value"), ignoreNulls = true).over(
            W.partitionBy("user_id").orderBy("hour")
              .rowsBetween(W.unboundedPreceding, W.currentRow)))
        .select("user_id", "hour", "observed", "filled_value")
    })
  )

  /** Shared sessionization CTEs (g → s → sess), mirroring
    * [[sessionizeBatch]]. */
  private val sessCtes =
    """g AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
      |         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
      |  FROM events
      |), s AS (
      |  SELECT user_id, ts_us,
      |         sum(CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800000000 THEN 1 ELSE 0 END)
      |           OVER (PARTITION BY user_id ORDER BY ts_us, event_id
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
      |  FROM g
      |), sess AS (
      |  SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
      |         min(ts_us) AS start_us, max(ts_us) AS end_us, count(*) AS n_events
      |  FROM s GROUP BY 1, 2)""".stripMargin

  /** Shared by `events_anomaly` and `events_anomaly_after_ingest`: the
    * ingest path must hash-match the same single-pass statement. */
  private val anomalySql =
    """WITH h AS (
      |  SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |st AS (
      |  SELECT event_type, count(*)::BIGINT AS cnt,
      |         sum(n)::BIGINT AS s1, sum(n * n)::BIGINT AS s2
      |  FROM h GROUP BY 1),
      |z AS (
      |  SELECT hour, h.event_type, n,
      |    CASE WHEN ((s2::DOUBLE - ((s1::DOUBLE * s1::DOUBLE) / cnt::DOUBLE)) / cnt::DOUBLE) <= 0.0
      |         THEN 0.0
      |         ELSE (n::DOUBLE - (s1::DOUBLE / cnt::DOUBLE))
      |              / sqrt((s2::DOUBLE - ((s1::DOUBLE * s1::DOUBLE) / cnt::DOUBLE)) / cnt::DOUBLE)
      |    END AS z
      |  FROM h JOIN st USING (event_type))
      |SELECT hour, event_type, n, z, abs(z) >= 2.0 AS is_anomaly FROM z""".stripMargin

  val oracles: Map[String, String] = Map(
    "events_cohort_retention" ->
      """WITH e AS (
        |  SELECT user_id, (epoch_us(ts) // 604800000000) AS week FROM events),
        |c AS (SELECT user_id, min(week) AS cohort_week FROM e GROUP BY user_id)
        |SELECT cohort_week, week - cohort_week AS week_offset,
        |  count(DISTINCT user_id) AS n_users, count(*) AS n_events
        |FROM e JOIN c USING (user_id)
        |GROUP BY 1, 2""".stripMargin,

    "events_window_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2""".stripMargin,

    "events_ohlc" ->
      """WITH e AS (
        |  SELECT date_trunc('hour', ts) AS hour, event_type, value, ts, event_id
        |  FROM events),
        |r AS (
        |  SELECT *,
        |    row_number() OVER (PARTITION BY hour, event_type
        |                       ORDER BY ts, event_id) AS ra,
        |    row_number() OVER (PARTITION BY hour, event_type
        |                       ORDER BY ts DESC, event_id DESC) AS rd
        |  FROM e)
        |SELECT hour, event_type, count(*) AS n,
        |  max(CASE WHEN ra = 1 THEN value END) AS open,
        |  max(value) AS high, min(value) AS low,
        |  max(CASE WHEN rd = 1 THEN value END) AS close
        |FROM r GROUP BY 1, 2""".stripMargin,

    "events_engagement" ->
      """WITH active AS (
        |  SELECT DISTINCT epoch_us(ts) // 86400000000 AS day, user_id
        |  FROM events),
        |days AS (SELECT DISTINCT day FROM active),
        |dau AS (SELECT day, count(DISTINCT user_id) AS dau
        |        FROM active GROUP BY 1),
        |wau AS (SELECT day + unnest(range(0, 7)) AS day, user_id FROM active),
        |wauc AS (SELECT day, count(DISTINCT user_id) AS wau FROM wau GROUP BY 1),
        |mau AS (SELECT day + unnest(range(0, 28)) AS day, user_id FROM active),
        |mauc AS (SELECT day, count(DISTINCT user_id) AS mau FROM mau GROUP BY 1)
        |SELECT day, dau, wau, mau
        |FROM days JOIN dau USING (day) JOIN wauc USING (day)
        |          JOIN mauc USING (day)""".stripMargin,

    // Registers per type, union via MAX-merge, three raw estimates with
    // the verbatim fold, then the same inclusion–exclusion arithmetic.
    "events_hll_overlap" ->
      """WITH e AS (
        |  SELECT CASE WHEN event_type = 'click' THEN 'click' ELSE 'purchase' END AS seg,
        |         ('0x'||substr(md5('hll:'||user_id::VARCHAR),1,15))::BIGINT AS h
        |  FROM events
        |  WHERE (event_type = 'click' AND user_id % 3 = 0)
        |     OR (event_type = 'purchase' AND user_id % 2 = 0)),
        |r AS (SELECT seg, h % 64 AS bucket,
        |        CASE WHEN (h // 64) = 0 THEN 55
        |             ELSE 55 - length(bin(h // 64)) END AS rho
        |      FROM e),
        |regs AS (SELECT seg, bucket, max(rho)::BIGINT AS register
        |         FROM r GROUP BY 1, 2),
        |uregs AS (SELECT bucket, max(register) AS register FROM regs GROUP BY 1),
        |alln AS (
        |  SELECT 'click' AS s, bucket, register FROM regs WHERE seg = 'click'
        |  UNION ALL
        |  SELECT 'purchase', bucket, register FROM regs WHERE seg = 'purchase'
        |  UNION ALL
        |  SELECT 'union', bucket, register FROM uregs),
        |est AS (SELECT s, count(*)::BIGINT AS nb,
        |        list_reduce(list_prepend(0.0::DOUBLE,
        |          list((1.0::DOUBLE / ((1::BIGINT << register::INT)::DOUBLE)) ORDER BY bucket)),
        |          (a, x) -> a + x) AS fold
        |      FROM alln GROUP BY 1),
        |vals AS (SELECT s,
        |        ((0.7213::DOUBLE / (1.0::DOUBLE + 1.079::DOUBLE / 64.0::DOUBLE))
        |          * 64.0::DOUBLE * 64.0::DOUBLE)
        |        / ((64 - nb)::DOUBLE + fold) AS v
        |      FROM est)
        |SELECT
        |  (SELECT v FROM vals WHERE s = 'click') AS est_click,
        |  (SELECT v FROM vals WHERE s = 'purchase') AS est_purchase,
        |  (SELECT v FROM vals WHERE s = 'union') AS est_union,
        |  (SELECT v FROM vals WHERE s = 'click')
        |    + (SELECT v FROM vals WHERE s = 'purchase')
        |    - (SELECT v FROM vals WHERE s = 'union') AS est_overlap""".stripMargin,

    // HLL registers + sliding MAX-merge + raw estimate recomputed
    // verbatim (same mirror conventions as text_hll_distinct: 60-bit
    // md5 hash, m=64/p=6, rho = 55 − bitlen, 2^-r as 1/(1<<r), fold in
    // bucket order — no log/pow anywhere).
    "events_hll_sliding" ->
      """WITH e AS (
        |  SELECT (epoch_us(ts) // 3600000000) AS hour,
        |         ('0x'||substr(md5('hll:'||user_id::VARCHAR),1,15))::BIGINT AS h
        |  FROM events),
        |r AS (SELECT hour, h % 64 AS bucket,
        |        CASE WHEN (h // 64) = 0 THEN 55
        |             ELSE 55 - length(bin(h // 64)) END AS rho
        |      FROM e),
        |regs AS (SELECT hour, bucket, max(rho)::BIGINT AS register
        |         FROM r GROUP BY 1, 2),
        |ends AS (SELECT DISTINCT hour AS e_hour FROM regs),
        |mg AS (SELECT e_hour, bucket, max(register) AS register
        |       FROM ends JOIN regs ON regs.hour BETWEEN e_hour - 23 AND e_hour
        |       GROUP BY 1, 2),
        |est AS (SELECT e_hour, count(*)::BIGINT AS n_buckets_set,
        |        list_reduce(list_prepend(0.0::DOUBLE,
        |          list((1.0::DOUBLE / ((1::BIGINT << register::INT)::DOUBLE)) ORDER BY bucket)),
        |          (a, x) -> a + x) AS fold
        |      FROM mg GROUP BY 1)
        |SELECT e_hour AS hour, n_buckets_set,
        |  ((0.7213::DOUBLE / (1.0::DOUBLE + 1.079::DOUBLE / 64.0::DOUBLE))
        |    * 64.0::DOUBLE * 64.0::DOUBLE)
        |  / ((64 - n_buckets_set)::DOUBLE + fold) AS hll_distinct
        |FROM est""".stripMargin,

    "events_cusum" ->
      """WITH hourly AS (
        |  SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |st AS (
        |  SELECT *,
        |    count(*) OVER (PARTITION BY event_type) AS t,
        |    sum(n) OVER (PARTITION BY event_type)::BIGINT AS tot
        |  FROM hourly),
        |p AS (
        |  SELECT *,
        |    sum(n * t - tot) OVER (PARTITION BY event_type ORDER BY hour
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS pp
        |  FROM st)
        |SELECT event_type, hour, n,
        |  (pp - least(0, min(pp) OVER (PARTITION BY event_type ORDER BY hour
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)))::BIGINT AS cusum,
        |  pp - least(0, min(pp) OVER (PARTITION BY event_type ORDER BY hour
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) > 5 * t AS is_shift
        |FROM p""".stripMargin,

    "events_seasonal_forecast" ->
      """WITH e AS (
        |  SELECT epoch_us(ts) // 604800000000 AS wk,
        |         (epoch_us(ts) // 86400000000) % 7 AS dow,
        |         (epoch_us(ts) % 86400000000) // 3600000000 AS hod
        |  FROM events),
        |mw AS (SELECT max(wk) AS m FROM e),
        |train AS (
        |  SELECT dow, hod, count(*) AS train_n,
        |         count(DISTINCT wk) AS train_weeks
        |  FROM e, mw WHERE wk < m GROUP BY 1, 2),
        |test AS (
        |  SELECT dow, hod, count(*) AS actual
        |  FROM e, mw WHERE wk = m GROUP BY 1, 2)
        |SELECT t.dow, t.hod, t.train_n, t.train_weeks,
        |  coalesce(ts.actual, 0)::BIGINT AS actual,
        |  t.train_n::DOUBLE / t.train_weeks::DOUBLE AS forecast,
        |  abs(coalesce(ts.actual, 0)::DOUBLE
        |      - t.train_n::DOUBLE / t.train_weeks::DOUBLE) AS abs_err
        |FROM train t LEFT JOIN test ts ON t.dow = ts.dow AND t.hod = ts.hod""".stripMargin,

    "events_burst_detect" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events)
        |SELECT event_id, user_id,
        |  count(*) OVER (PARTITION BY user_id ORDER BY ts_us
        |                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |    AS n_trailing_1h,
        |  count(*) OVER (PARTITION BY user_id ORDER BY ts_us
        |                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |    >= 5 AS is_burst
        |FROM e""".stripMargin,

    "events_seasonal_profile" ->
      """WITH e AS (
        |  SELECT epoch_us(ts) AS ts_us, value FROM events),
        |c AS (
        |  SELECT (ts_us // 86400000000) % 7 AS dow,
        |         (ts_us % 86400000000) // 3600000000 AS hod,
        |         count(*) AS n,
        |         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |  FROM e GROUP BY 1, 2)
        |SELECT dow, hod, n, total_value,
        |       n::DOUBLE / (SELECT count(*) FROM e)::DOUBLE AS share
        |FROM c""".stripMargin,

    "events_unique_users" ->
      """SELECT date_trunc('hour', ts) AS hour,
        |  count(DISTINCT user_id) AS unique_users, count(*) AS n_events
        |FROM events GROUP BY 1""".stripMargin,

    // Mirrors Profile.zScores exactly: exact LONG sums, then the same
    // parenthesized IEEE expression (one correctly-rounded sqrt).
    "events_anomaly" -> anomalySql,

    // The ingest path proves itself against the IDENTICAL single-pass
    // oracle (hourly counts SUM-merge exactly).
    "events_anomaly_after_ingest" -> anomalySql,

    "events_json_agg" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(json_extract_string(props, '$.k')::BIGINT) AS BIGINT) AS sum_k,
        |  max(json_extract_string(props, '$.k')::BIGINT) AS max_k
        |FROM events GROUP BY event_type""".stripMargin,

    "events_sessionize_batch" ->
      s"""WITH $sessCtes
         |SELECT user_id, session_seq, start_us, end_us, n_events FROM sess""".stripMargin,

    // Interval-join mirror: DuckDB states the overlap predicate
    // directly (the planner handles the small session table); the Spark
    // side's bin+distinct must produce the identical pair set.
    "events_interval_join" ->
      s"""WITH $sessCtes
         |SELECT a.user_id AS user_a, a.session_seq AS session_a,
         |       b.user_id AS user_b, b.session_seq AS session_b,
         |       least(a.end_us, b.end_us) - greatest(a.start_us, b.start_us)
         |         AS overlap_us
         |FROM sess a JOIN sess b
         |  ON a.user_id < b.user_id
         | AND a.start_us <= b.end_us AND b.start_us <= a.end_us""".stripMargin,

    "events_concurrency" ->
      s"""WITH $sessCtes,
         |pts AS (
         |  SELECT start_us AS t, 0 AS dord, 1::BIGINT AS d, user_id, session_seq
         |  FROM sess
         |  UNION ALL
         |  SELECT end_us AS t, 1 AS dord, -1::BIGINT AS d, user_id, session_seq
         |  FROM sess),
         |run AS (
         |  SELECT t, sum(d) OVER (ORDER BY t, dord, user_id, session_seq
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conc
         |  FROM pts)
         |SELECT (t // 3600000000) * 3600000000 AS hour_us,
         |       max(conc)::BIGINT AS max_concurrent, count(*)::BIGINT AS n_points
         |FROM run GROUP BY 1""".stripMargin,

    "events_time_weighted" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
        |  FROM events),
        |iv AS (
        |  SELECT user_id, cents,
        |         lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
        |           - ts_us AS dt
        |  FROM e),
        |g AS (
        |  SELECT user_id, count(*)::BIGINT AS n_intervals,
        |         sum(cents * dt) AS num, sum(dt)::BIGINT AS den
        |  FROM iv WHERE dt IS NOT NULL GROUP BY user_id)
        |SELECT user_id, n_intervals, num::DOUBLE / den::DOUBLE / 100.0 AS twa
        |FROM g WHERE den > 0""".stripMargin,

    "events_range_join" ->
      s"""WITH $sessCtes,
         |pts AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events)
         |SELECT p.event_id, p.user_id, sess.session_seq
         |FROM pts p JOIN sess
         |  ON p.user_id = sess.user_id
         | AND p.ts_us BETWEEN sess.start_us AND sess.end_us""".stripMargin,

    "events_top_paths" ->
      """WITH g AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
        |         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
        |  FROM events),
        |s AS (
        |  SELECT user_id, event_id, event_type, ts_us,
        |         sum(CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800000000 THEN 1 ELSE 0 END)
        |           OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
        |  FROM g),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY user_id, session_seq
        |                               ORDER BY ts_us, event_id) AS rn
        |  FROM s),
        |paths AS (
        |  SELECT user_id, session_seq,
        |         string_agg(event_type, '>' ORDER BY rn) AS path
        |  FROM r WHERE rn <= 5 GROUP BY 1, 2)
        |SELECT path, count(*) AS n_sessions
        |FROM paths GROUP BY 1
        |ORDER BY n_sessions DESC, path
        |LIMIT 20""".stripMargin,

    "events_pattern_match" ->
      """WITH ranked AS (
        |  SELECT user_id, substr(event_type, 1, 1) AS c,
        |         epoch_us(ts) AS tu, event_id,
        |         row_number() OVER (PARTITION BY user_id
        |                            ORDER BY epoch_us(ts), event_id) AS rn
        |  FROM events),
        |seqs AS (
        |  SELECT user_id,
        |         string_agg(CASE WHEN rn <= 10000 THEN c END, ''
        |           ORDER BY tu, event_id) AS seq,
        |         count(*) AS n_total
        |  FROM ranked GROUP BY user_id)
        |SELECT user_id, n_total::BIGINT AS n_events,
        |       len(regexp_extract_all(seq, 'vc*p'))::BIGINT AS n_matches,
        |       n_total > 10000 AS truncated
        |FROM seqs WHERE len(regexp_extract_all(seq, 'vc*p')) > 0""".stripMargin,

    "events_pivot_type" ->
      """SELECT user_id,
        |  count(*) FILTER (event_type = 'click') AS click,
        |  count(*) FILTER (event_type = 'error') AS error,
        |  count(*) FILTER (event_type = 'purchase') AS purchase,
        |  count(*) FILTER (event_type = 'signup') AS signup,
        |  count(*) FILTER (event_type = 'view') AS view
        |FROM events GROUP BY user_id""".stripMargin,

    "events_attribution" ->
      """SELECT p.user_id, p.event_id AS purchase_id, c.event_id AS click_id,
        |       p.value AS purchase_value
        |FROM events p JOIN events c
        |  ON p.user_id = c.user_id
        | AND p.event_type = 'purchase' AND c.event_type = 'click'
        | AND epoch_us(c.ts) <= epoch_us(p.ts)
        | AND epoch_us(c.ts) >= epoch_us(p.ts) - 1800000000""".stripMargin,

    "events_asof_click" ->
      """WITH p AS (
        |  SELECT user_id, event_id AS purchase_id, epoch_us(ts) AS ts_us
        |  FROM events WHERE event_type = 'purchase'),
        |c0 AS (
        |  SELECT user_id, event_id AS click_id, epoch_us(ts) AS ts_us
        |  FROM events WHERE event_type = 'click'),
        |c AS (
        |  SELECT * FROM c0
        |  QUALIFY row_number() OVER (PARTITION BY user_id, ts_us ORDER BY click_id DESC) = 1)
        |SELECT p.user_id, p.purchase_id, p.ts_us,
        |       c.click_id, c.ts_us AS ts_us_matched
        |FROM p ASOF LEFT JOIN c
        |  ON p.user_id = c.user_id AND p.ts_us >= c.ts_us""".stripMargin,

    // Islands mirror: the same two-rank difference and per-island agg.
    "events_islands" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id FROM events),
        |r AS (
        |  SELECT *,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
        |    - row_number() OVER (PARTITION BY user_id, event_type
        |                         ORDER BY ts_us, event_id) AS isl
        |  FROM e)
        |SELECT user_id, event_type, count(*)::BIGINT AS run_len,
        |       min(ts_us) AS start_us, max(ts_us) AS end_us,
        |       min(event_id) AS first_event_id
        |FROM r GROUP BY user_id, event_type, isl""".stripMargin,

    // Theil-Sen mirror: same systematic thin (stride ⌈n/100⌉ over the
    // (ts, id) order), same strict-ts pair set, same lower-median pick.
    "events_theilsen" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS t, value FROM events),
        |rn AS (
        |  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY t, event_id) AS rn,
        |         count(*) OVER (PARTITION BY user_id) AS n
        |  FROM e),
        |th AS (SELECT user_id, event_id, t, value FROM rn
        |       WHERE (rn - 1) % ((n + 99) // 100) = 0),
        |np AS (SELECT user_id, count(*) AS n_points FROM th GROUP BY 1),
        |p AS (
        |  SELECT a.user_id, a.event_id AS ia, b.event_id AS ib,
        |         (b.value - a.value) / CAST(b.t - a.t AS DOUBLE) AS slope
        |  FROM th a JOIN th b ON a.user_id = b.user_id AND a.t < b.t),
        |r AS (
        |  SELECT user_id, slope,
        |         row_number() OVER (PARTITION BY user_id ORDER BY slope, ia, ib) AS rk,
        |         count(*) OVER (PARTITION BY user_id) AS m
        |  FROM p)
        |SELECT r.user_id, np.n_points, r.m AS n_pairs,
        |       r.slope AS theil_sen_slope
        |FROM r JOIN np ON r.user_id = np.user_id
        |WHERE r.rk = (r.m + 1) // 2""".stripMargin,

    // A/B mirror: same doubled-rank tie axis (2·rank + ties − 1 summed
    // in BIGINT), same exact-DECIMAL moment sums feeding the identical
    // IEEE Welch expression tree.
    "events_ab_test" ->
      """WITH r AS (
        |  SELECT event_type, (user_id % 2 = 0) AS a, value,
        |         CAST(value AS DECIMAL(18,2)) AS vd,
        |         2*rank() OVER (PARTITION BY event_type ORDER BY value)
        |           + count(*) OVER (PARTITION BY event_type, value) - 1 AS r2
        |  FROM events),
        |g AS (
        |  SELECT event_type,
        |    count(*) FILTER (WHERE a) AS n_a,
        |    count(*) FILTER (WHERE NOT a) AS n_b,
        |    sum(vd) FILTER (WHERE a) AS sxa,
        |    sum(vd) FILTER (WHERE NOT a) AS sxb,
        |    sum(vd*vd) FILTER (WHERE a) AS sxxa,
        |    sum(vd*vd) FILTER (WHERE NOT a) AS sxxb,
        |    CAST(sum(r2) FILTER (WHERE a) AS BIGINT) AS r2a
        |  FROM r GROUP BY 1)
        |SELECT event_type, n_a, n_b,
        |  CAST(sxa AS DOUBLE) / CAST(n_a AS DOUBLE) AS mean_a,
        |  CAST(sxb AS DOUBLE) / CAST(n_b AS DOUBLE) AS mean_b,
        |  CASE WHEN n_a > 1 AND n_b > 1 THEN
        |    (CAST(sxa AS DOUBLE) / CAST(n_a AS DOUBLE)
        |      - CAST(sxb AS DOUBLE) / CAST(n_b AS DOUBLE)) /
        |    sqrt(((CAST(sxxa AS DOUBLE)
        |           - CAST(sxa AS DOUBLE) * CAST(sxa AS DOUBLE) / CAST(n_a AS DOUBLE))
        |          / (CAST(n_a AS DOUBLE) - 1.0)) / CAST(n_a AS DOUBLE)
        |       + ((CAST(sxxb AS DOUBLE)
        |           - CAST(sxb AS DOUBLE) * CAST(sxb AS DOUBLE) / CAST(n_b AS DOUBLE))
        |          / (CAST(n_b AS DOUBLE) - 1.0)) / CAST(n_b AS DOUBLE))
        |  END AS welch_t,
        |  CAST(r2a - n_a*(n_a+1) AS DOUBLE) / 2.0 AS u_stat
        |FROM g""".stripMargin,

    "events_mad_anomaly" ->
      """WITH e AS (
        |  SELECT event_type, event_id,
        |         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
        |  FROM events),
        |n AS (SELECT event_type, count(*)::BIGINT AS n FROM e GROUP BY 1),
        |r1 AS (SELECT event_type, cents,
        |         row_number() OVER (PARTITION BY event_type ORDER BY cents, event_id) AS rk
        |       FROM e),
        |med AS (SELECT r1.event_type, min(cents) AS med_cents
        |        FROM r1 JOIN n USING (event_type) WHERE 2 * rk >= n GROUP BY 1),
        |d AS (SELECT e.event_type, e.event_id,
        |        abs(e.cents - m.med_cents) AS dev, m.med_cents
        |      FROM e JOIN med m USING (event_type)),
        |r2 AS (SELECT event_type, dev,
        |         row_number() OVER (PARTITION BY event_type ORDER BY dev, event_id) AS rk
        |       FROM d),
        |mad AS (SELECT r2.event_type, min(dev) AS mad_cents
        |        FROM r2 JOIN n USING (event_type) WHERE 2 * rk >= n GROUP BY 1)
        |SELECT d.event_type, count(*)::BIGINT AS n,
        |       max(d.med_cents) AS med_cents, max(ma.mad_cents) AS mad_cents,
        |       sum(CASE WHEN d.dev > 3 * ma.mad_cents THEN 1 ELSE 0 END)::BIGINT AS n_outliers
        |FROM d JOIN mad ma USING (event_type) GROUP BY 1""".stripMargin,

    "events_gap_quantiles" ->
      """WITH g AS (
        |  SELECT event_type,
        |         (epoch_us(ts) - lag(epoch_us(ts), 1)
        |            OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id))
        |         // 1000000 AS gap_s
        |  FROM events)
        |SELECT event_type,
        |  quantile_cont(gap_s, 0.5) AS p50,
        |  quantile_cont(gap_s, 0.9) AS p90,
        |  quantile_cont(gap_s, 0.99) AS p99,
        |  count(*) AS n_gaps
        |FROM g WHERE gap_s IS NOT NULL GROUP BY event_type""".stripMargin,

    "events_asof_next" ->
      """WITH c AS (
        |  SELECT user_id, event_id AS click_id, epoch_us(ts) AS ts_us
        |  FROM events WHERE event_type = 'click'),
        |p0 AS (
        |  SELECT user_id, event_id AS purchase_id, epoch_us(ts) AS ts_us
        |  FROM events WHERE event_type = 'purchase'),
        |p AS (
        |  SELECT * FROM p0
        |  QUALIFY row_number() OVER (PARTITION BY user_id, ts_us ORDER BY purchase_id DESC) = 1)
        |SELECT c.user_id, c.click_id, c.ts_us,
        |       CASE WHEN p.ts_us - c.ts_us <= 7200000000 THEN p.purchase_id END AS purchase_id,
        |       CASE WHEN p.ts_us - c.ts_us <= 7200000000 THEN p.ts_us END AS ts_us_matched
        |FROM c ASOF LEFT JOIN p
        |  ON c.user_id = p.user_id AND c.ts_us <= p.ts_us""".stripMargin,

    "events_window_sliding" ->
      """WITH e AS (SELECT epoch_us(ts) AS t, event_type FROM events),
        |w AS (
        |  SELECT (t // 1800000000) * 1800000000 - k * 1800000000 AS win_start_us,
        |         event_type
        |  FROM e, (VALUES (0), (1)) AS hops(k))
        |SELECT win_start_us, event_type, count(*) AS n
        |FROM w GROUP BY 1, 2""".stripMargin,

    "events_user_profile" ->
      """SELECT user_id,
        |  count(*)::BIGINT AS n_events,
        |  count(DISTINCT epoch_us(ts) // 86400000000)::BIGINT AS active_days,
        |  min(epoch_us(ts)) AS first_us,
        |  max(epoch_us(ts)) AS last_us,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY user_id""".stripMargin,

    // Burstiness mirror: same lagged gaps as DECIMAL(19,0) moments,
    // same guarded (σ − μ)/(σ + μ).
    "events_gap_burstiness" -> {
      val m = "(CAST(s AS DOUBLE) / CAST(n AS DOUBLE))"
      val v = """((CAST(ss AS DOUBLE)
                 |      - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                 |     / (CAST(n AS DOUBLE) - 1.0))""".stripMargin
      s"""WITH g0 AS (
         |  SELECT event_type,
         |    CAST(epoch_us(ts) - lag(epoch_us(ts)) OVER (
         |      PARTITION BY user_id ORDER BY ts, event_id) AS DECIMAL(19,0)) AS g
         |  FROM events),
         |a AS (
         |  SELECT event_type, count(*)::BIGINT AS n, sum(g) AS s, sum(g*g) AS ss
         |  FROM g0 WHERE g IS NOT NULL GROUP BY 1)
         |SELECT event_type, n, $m AS mean_gap_us,
         |  CASE WHEN n > 1 THEN
         |    (sqrt($v) - $m) / (sqrt($v) + $m)
         |  END AS burstiness
         |FROM a""".stripMargin
    },

    "events_user_gaps" ->
      """SELECT user_id, event_id,
        |  CAST((epoch_us(ts) - lag(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY ts, event_id))
        |       / 1000000 AS DOUBLE) AS gap_s
        |FROM events""".stripMargin,

    // Top-k mirror: the window formulation the bounded aggregate
    // replaces — (value desc, event_id asc), rank ≤ 5.
    "events_topk_per_type" ->
      """SELECT event_type, CAST(rn AS BIGINT) AS rank, value, event_id
        |FROM (
        |  SELECT event_type, value, event_id,
        |         row_number() OVER (PARTITION BY event_type
        |                            ORDER BY value DESC, event_id) AS rn
        |  FROM events)
        |WHERE rn <= 5""".stripMargin,

    // The maintained leaderboard must equal the batch top-k over the
    // union corpus — same mirror verbatim.
    "events_topk_after_ingest" ->
      """SELECT event_type, CAST(rn AS BIGINT) AS rank, value, event_id
        |FROM (
        |  SELECT event_type, value, event_id,
        |         row_number() OVER (PARTITION BY event_type
        |                            ORDER BY value DESC, event_id) AS rn
        |  FROM events)
        |WHERE rn <= 5""".stripMargin,

    // Rolling-median mirror: same ROWS frame, same sorted-frame
    // lower-middle element copy.
    "events_rolling_median" ->
      """WITH w AS (
        |  SELECT event_id, user_id, value,
        |         list_sort(list(value) OVER (
        |           PARTITION BY user_id ORDER BY ts, event_id
        |           ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS win
        |  FROM events)
        |SELECT event_id, user_id, value,
        |       win[((len(win) + 1) // 2)::INT] AS rolling_median,
        |       len(win)::BIGINT AS win_n
        |FROM w""".stripMargin,

    // Feature-matrix mirror: identical window order, lags, exact
    // decimal rolling sum, one mean division.
    "events_feature_matrix" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us, value FROM events),
        |f AS (
        |  SELECT user_id, event_id, ts_us, value,
        |    lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS lag1,
        |    lag(value, 3) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS lag3,
        |    value - lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS delta1,
        |    ts_us - lag(ts_us, 1) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS gap_us,
        |    CAST(sum(CAST(value AS DECIMAL(18,2)))
        |         OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |               ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS DOUBLE) AS rsum5,
        |    count(*) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |                   ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS rcnt5
        |  FROM e)
        |SELECT *, rsum5 / rcnt5::DOUBLE AS rmean5 FROM f""".stripMargin,

    // Bot-score mirror: per-minute and per-type partial counts, the
    // same single Simpson division, the same composite flag.
    "events_bot_score" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) // 60000000 AS m, event_type
        |  FROM events),
        |pm AS (SELECT user_id, m, count(*) AS c FROM e GROUP BY 1, 2),
        |peak AS (SELECT user_id, CAST(max(c) AS BIGINT) AS peak_per_min
        |         FROM pm GROUP BY 1),
        |bt AS (SELECT user_id, event_type, count(*) AS ni FROM e GROUP BY 1, 2),
        |s AS (SELECT user_id, CAST(sum(ni) AS BIGINT) AS n_events,
        |             CAST(sum(ni * ni) AS BIGINT) AS sq,
        |             count(*) AS n_types
        |      FROM bt GROUP BY 1)
        |SELECT p.user_id, n_events, peak_per_min, n_types,
        |       sq::DOUBLE / (n_events * n_events)::DOUBLE AS simpson,
        |       (peak_per_min >= 2 OR sq::DOUBLE / (n_events * n_events)::DOUBLE >= 0.22)
        |         AS suspicious
        |FROM peak p JOIN s USING (user_id)""".stripMargin,

    "events_ewma" -> {
      val taps = (0 until 16).map(j =>
        s"coalesce(lag(cents, $j) OVER (PARTITION BY user_id ORDER BY ts, event_id), 0) * ${1L << (15 - j)}")
        .mkString(" + ")
      s"""WITH e AS (
         |  SELECT event_id, user_id, ts,
         |         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
         |  FROM events),
         |w AS (SELECT event_id, user_id, $taps AS ws FROM e)
         |SELECT event_id, user_id, ws::DOUBLE / 65536.0 / 100.0 AS ewma
         |FROM w""".stripMargin
    },

    "events_transitions" ->
      """WITH seq AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
        |  FROM events),
        |pairs AS (
        |  SELECT from_type, to_type, count(*) AS n
        |  FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n,
        |  (n::DOUBLE / CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE)) AS p
        |FROM pairs""".stripMargin,

    // Stationary mirror: the transitions CTEs, then 8 unrolled rounds
    // with from_type-ordered list_reduce folds.
    "events_markov_stationary" -> {
      val rounds = (1 to 8).map { i =>
        s"""v$i AS (
           |  SELECT to_type AS state,
           |    list_reduce(list_prepend(0.0, list(prob * p ORDER BY from_type)),
           |      (a, x) -> a + x) AS prob
           |  FROM P JOIN v${i - 1} v ON P.from_type = v.state
           |  GROUP BY to_type)""".stripMargin
      }.mkString(",\n")
      s"""WITH seq AS (
         |  SELECT event_type AS from_type,
         |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
         |  FROM events),
         |pairs AS (
         |  SELECT from_type, to_type, count(*) AS n
         |  FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2),
         |P AS (
         |  SELECT from_type, to_type,
         |    (n::DOUBLE / CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE)) AS p
         |  FROM pairs),
         |st AS (SELECT DISTINCT from_type AS state FROM P),
         |k AS (SELECT count(*)::BIGINT AS k FROM st),
         |v0 AS (SELECT state, 1.0 / k AS prob FROM st CROSS JOIN k),
         |$rounds
         |SELECT state, prob FROM v8""".stripMargin
    },

    "events_funnel" ->
      """WITH s1 AS (
        |  SELECT user_id, min(epoch_us(ts)) AS t1
        |  FROM events WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (
        |  SELECT e.user_id, min(epoch_us(e.ts)) AS t2
        |  FROM events e JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'click' AND epoch_us(e.ts) > s1.t1
        |  GROUP BY e.user_id),
        |s3 AS (
        |  SELECT e.user_id, min(epoch_us(e.ts)) AS t3
        |  FROM events e JOIN s2 ON e.user_id = s2.user_id
        |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s2.t2
        |  GROUP BY e.user_id)
        |SELECT s1.user_id, s1.t1, s2.t2, s3.t3,
        |  (1 + CASE WHEN s2.t2 IS NULL THEN 0 ELSE 1 END
        |     + CASE WHEN s3.t3 IS NULL THEN 0 ELSE 1 END)::BIGINT AS steps_completed
        |FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id
        |        LEFT JOIN s3 ON s1.user_id = s3.user_id""".stripMargin,

    // Funnel-A/B mirror: the funnel CTEs + cohort tag, one counter agg,
    // the same guarded two-proportion z per step.
    "events_funnel_ab" -> {
      def z(i: Int) = {
        val (nA, xA, nB, xB) = (s"na${i - 1}", s"na$i", s"nb${i - 1}", s"nb$i")
        val pA = s"(CAST($xA AS DOUBLE) / CAST($nA AS DOUBLE))"
        val pB = s"(CAST($xB AS DOUBLE) / CAST($nB AS DOUBLE))"
        val pp = s"(CAST($xA + $xB AS DOUBLE) / CAST($nA + $nB AS DOUBLE))"
        s"""SELECT CAST($i AS BIGINT) AS step,
           |  $nA AS n_a, $xA AS x_a, $pA AS p_a,
           |  $nB AS n_b, $xB AS x_b, $pB AS p_b,
           |  CASE WHEN $nA > 0 AND $nB > 0 AND $pp > 0.0 AND $pp < 1.0 THEN
           |    ($pA - $pB) / sqrt($pp * (1.0 - $pp)
           |      * (1.0 / CAST($nA AS DOUBLE) + 1.0 / CAST($nB AS DOUBLE)))
           |  END AS z
           |FROM g""".stripMargin
      }
      s"""WITH s1 AS (
         |  SELECT user_id, min(epoch_us(ts)) AS t1
         |  FROM events WHERE event_type = 'view' GROUP BY user_id),
         |s2 AS (
         |  SELECT e.user_id, min(epoch_us(e.ts)) AS t2
         |  FROM events e JOIN s1 ON e.user_id = s1.user_id
         |  WHERE e.event_type = 'click' AND epoch_us(e.ts) > s1.t1
         |  GROUP BY e.user_id),
         |s3 AS (
         |  SELECT e.user_id, min(epoch_us(e.ts)) AS t3
         |  FROM events e JOIN s2 ON e.user_id = s2.user_id
         |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s2.t2
         |  GROUP BY e.user_id),
         |f AS (
         |  SELECT s1.user_id, (s1.user_id % 2 = 0) AS a,
         |    (1 + CASE WHEN s2.t2 IS NULL THEN 0 ELSE 1 END
         |       + CASE WHEN s3.t3 IS NULL THEN 0 ELSE 1 END) AS sc
         |  FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id
         |          LEFT JOIN s3 ON s1.user_id = s3.user_id),
         |g AS (
         |  SELECT
         |    sum(CASE WHEN a AND sc >= 1 THEN 1 ELSE 0 END)::BIGINT AS na1,
         |    sum(CASE WHEN a AND sc >= 2 THEN 1 ELSE 0 END)::BIGINT AS na2,
         |    sum(CASE WHEN a AND sc >= 3 THEN 1 ELSE 0 END)::BIGINT AS na3,
         |    sum(CASE WHEN NOT a AND sc >= 1 THEN 1 ELSE 0 END)::BIGINT AS nb1,
         |    sum(CASE WHEN NOT a AND sc >= 2 THEN 1 ELSE 0 END)::BIGINT AS nb2,
         |    sum(CASE WHEN NOT a AND sc >= 3 THEN 1 ELSE 0 END)::BIGINT AS nb3
         |  FROM f)
         |${z(2)}
         |UNION ALL
         |${z(3)}""".stripMargin
    },

    // Windowed mirror: each later step additionally bounded by
    // t1 + 1 day (inclusive).
    "events_funnel_window" ->
      """WITH s1 AS (
        |  SELECT user_id, min(epoch_us(ts)) AS t1
        |  FROM events WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (
        |  SELECT e.user_id, min(epoch_us(e.ts)) AS t2
        |  FROM events e JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'click' AND epoch_us(e.ts) > s1.t1
        |    AND epoch_us(e.ts) <= s1.t1 + 86400000000
        |  GROUP BY e.user_id),
        |s3 AS (
        |  SELECT e.user_id, min(epoch_us(e.ts)) AS t3
        |  FROM events e JOIN s2 ON e.user_id = s2.user_id
        |                JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s2.t2
        |    AND epoch_us(e.ts) <= s1.t1 + 86400000000
        |  GROUP BY e.user_id)
        |SELECT s1.user_id, s1.t1, s2.t2, s3.t3,
        |  (1 + CASE WHEN s2.t2 IS NULL THEN 0 ELSE 1 END
        |     + CASE WHEN s3.t3 IS NULL THEN 0 ELSE 1 END)::BIGINT AS steps_completed
        |FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id
        |        LEFT JOIN s3 ON s1.user_id = s3.user_id""".stripMargin,

    "events_gapfill" ->
      """WITH hourly AS (
        |  SELECT user_id, date_trunc('hour', ts) AS hour,
        |         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS hour_value
        |  FROM events GROUP BY 1, 2),
        |spine AS (
        |  SELECT user_id,
        |         unnest(generate_series(min(hour), max(hour), INTERVAL 1 HOUR)) AS hour
        |  FROM hourly GROUP BY user_id),
        |j AS (
        |  SELECT s.user_id, s.hour, h.hour_value
        |  FROM spine s LEFT JOIN hourly h
        |    ON s.user_id = h.user_id AND s.hour = h.hour)
        |SELECT user_id, hour, hour_value IS NOT NULL AS observed,
        |  last_value(hour_value IGNORE NULLS) OVER (
        |    PARTITION BY user_id ORDER BY hour
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value
        |FROM j""".stripMargin
  )
}
