package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Per-operator relational queries over the TPC-H-ish testdata, one per
  * SURVEY.md §2 inventory row that is SQL-expressible (S1-S3, P1-P8, J1-J2,
  * A1-A2, W1-W2, U1). Sums go through exact DECIMAL accumulation and back
  * to DOUBLE so Spark's partial-aggregate tree and DuckDB's sequential sum
  * produce bit-identical results (double summation is order-sensitive;
  * decimal is exact).
  */
object RelationalQueries {

  private def dec(c: org.apache.spark.sql.Column, scale: Int) =
    c.cast(DecimalType(18, scale))

  /** rel_stats_prune fixture, built once per (session, sf dir): the
    * range-clustered orders copy + its checkpointed stats index. A real
    * deployment maintains this layout continuously (sorted writes +
    * [[graft.io.StatsIndex.refresh]]); rebuilding it inside every query
    * run would time fixture construction, not the indexed read path. */
  private val statsFixtures =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def statsPruneFixture(s: SparkSession, dir: String): (String, DataFrame) = {
    // cache PATHS, not DataFrames — a cached frame would pin the session
    // that built it, and the dirs are deleted on JVM exit
    val base = statsFixtures.computeIfAbsent(s"${s.sparkContext.applicationId}:$dir", _ => {
      val b = java.nio.file.Paths.get(QueryTmp.dir("statsprune"))
      Tables(s, dir, "orders")
        .repartitionByRange(8, col("o_orderkey"))
        .write.mode("overwrite").parquet(s"$b/orders")
      // The index persists as a (tiny) parquet table, like a deployment
      // would keep it — immune to the harness's between-query cache
      // clearing, which would evict a checkpointed frame's blocks.
      // min/max on the clustering key; bloom sidecar on the UNCLUSTERED
      // customer key — the point-probe access path min/max cannot prune
      // (every file's [min,max] spans the whole custkey domain).
      graft.io.StatsIndex.build(s, s"$b/orders", Seq("o_orderkey"),
          bloomCols = Seq("o_custkey"))
        .coalesce(1).write.parquet(s"$b/stats")
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        import java.nio.file.{Files, Path}
        import java.util.Comparator
        try Files.walk(b).sorted(Comparator.reverseOrder[Path]())
          .forEach(p => Files.deleteIfExists(p): Unit)
        catch { case _: Throwable => () }
      }))
      b.toString
    })
    (s"$base/orders", s.read.parquet(s"$base/stats"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S1+P6+P3: scan with projection + filter (predicate/projection pushdown
    // reach the parquet scan — verified in BenchPlans).
    "rel_scan_filter" -> ((s, dir) =>
      Tables(s, dir, "lineitem")
        .where(col("l_shipdate") < lit("1996-01-01").cast("timestamp") && col("l_discount") > 0.05)
        .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount")),

    // A2-style grouped aggregation (TPC-H Q1 shape) with exact decimal sums.
    "rel_agg_q1" -> ((s, dir) =>
      Tables(s, dir, "lineitem")
        .where(col("l_shipdate") <= lit("2001-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(dec(col("l_quantity"), 2)).cast("double").as("sum_qty"),
          sum(dec(col("l_extendedprice"), 2)).cast("double").as("sum_base_price"),
          sum(dec(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6)).cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))),

    // Approximate-first aggregation with an honest error readout: the
    // same revenue rollup from a deterministic 1-in-100 hash sample of
    // orderkeys (scaled ×100) NEXT TO the exact answer and the relative
    // error — the "is a 1% scan good enough for this dashboard"
    // measurement. The sample gate is the mirrored 60-bit hash, so the
    // drawn subset (and thus the estimate) is identical cross-engine;
    // both sums are exact DECIMAL until the final casts.
    "rel_approx_agg" -> ((s, dir) => {
      val TF = graft.functions.TextFunctions
      val li = Tables(s, dir, "lineitem")
      val sampled = li.where(TF.hash60(
        concat(lit("ap:"), col("l_orderkey").cast("string"))) % 100 === 0)
      val ex = li.groupBy("l_returnflag")
        .agg(sum(dec(col("l_extendedprice"), 2)).cast("double").as("exact_rev"),
          count(lit(1)).as("exact_n"))
      val ap = sampled.groupBy("l_returnflag")
        .agg((sum(dec(col("l_extendedprice"), 2)) * 100).cast("double").as("est_rev"),
          (count(lit(1)) * 100).as("est_n"))
      ex.join(ap, Seq("l_returnflag"), "left")
        .select(col("l_returnflag"), col("exact_rev"), col("est_rev"),
          col("exact_n"), col("est_n"),
          ((col("est_rev") - col("exact_rev")) / col("exact_rev"))
            .as("rel_err"))
    }),

    // J1: PK equi-join, small dimension broadcast.
    "rel_join_pk" -> ((s, dir) =>
      Tables(s, dir, "orders").join(
        broadcast(Tables(s, dir, "customer")),
        col("o_custkey") === col("c_custkey"))
        .select("o_orderkey", "o_totalprice", "c_name", "c_mktsegment")),

    // J1 composed 3-way with aggregation (join order + partial aggs).
    "rel_join_agg" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
      val o = Tables(s, dir, "orders")
      val c = Tables(s, dir, "customer")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
          sum(dec(col("l_extendedprice"), 2)).cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    // J2: left-semi join (the reference's impacted-file join shape).
    "rel_semi_join" -> ((s, dir) =>
      Tables(s, dir, "customer")
        .join(Tables(s, dir, "orders").where(col("o_totalprice") > 300000.0),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")),

    // Anti-join complement (customers with no qualifying order).
    "rel_anti_join" -> ((s, dir) =>
      Tables(s, dir, "customer")
        .join(Tables(s, dir, "orders").where(col("o_totalprice") > 300000.0),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")),

    // A1: DISTINCT projection dedup.
    "rel_distinct" -> ((s, dir) =>
      Tables(s, dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()),

    // A2: scalar COUNT(DISTINCT) — the reference's repartition-count probe.
    "rel_count_distinct" -> ((s, dir) =>
      Tables(s, dir, "orders").agg(
        countDistinct(col("o_custkey")).as("n_cust"),
        countDistinct(col("o_orderstatus")).as("n_status"),
        count(lit(1)).as("n_rows"))),

    // W1: row_number latest-per-key (the merge's sequencing window).
    "rel_window_rownum" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      Tables(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    }),

    // W2: rank with the reference's tie semantics (desc ordering).
    "rel_window_rank" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_orderstatus")).orderBy(col("o_totalprice").desc)
      Tables(s, dir, "orders")
        .withColumn("rnk", rank().over(w).cast("long"))
        .where(col("rnk") <= 5)
        .select("o_orderstatus", "o_orderkey", "o_totalprice", "rnk")
    }),

    // Aggregate-over-window (running sum per key, rows frame).
    "rel_window_running" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, dir)
        .withColumn("running_value",
          sum(dec(col("value"), 2)).over(w).cast("double"))
        .select("user_id", "event_id", "running_value")
    }),

    // U1: union-by-name with missing columns null-filled (schema evolution).
    "rel_union_by_name" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
      val a = o.where(col("o_orderstatus") === "F").select("o_orderkey", "o_totalprice")
      val b = o.where(col("o_orderstatus") === "O").select("o_orderkey", "o_orderpriority")
      a.unionByName(b, allowMissingColumns = true)
    }),

    // Multi-way sort-merge join across the star schema (region→nation→
    // customer→orders), mixing broadcast and shuffle joins.
    // TPC-H Q5 shape: the canonical 6-table regional-revenue join — two
    // fact-fact equi-joins (lineitem ⋈ orders ⋈ customer, shuffle on
    // their keys), the supplier co-nationality condition, and the
    // nation/region dims broadcast with the region filter pushed into
    // the broadcast side. Revenue folds in exact DECIMAL
    // (price·(1−discount)) and casts once at the end.
    "rel_tpch_q5" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
      val o = Tables(s, dir, "orders")
      val c = Tables(s, dir, "customer")
      val su = Tables(s, dir, "supplier")
      val n = Tables(s, dir, "nation")
      val r = Tables(s, dir, "region")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(su, col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r.where(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(sum(dec(col("l_extendedprice"), 2) *
            (dec(lit(1), 2) - dec(col("l_discount"), 2)))
          .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    // TPC-H Q3 shape (shipping-priority top-N): date-filtered fact-fact
    // join (lineitem ⋈ orders shuffle on the order key — both filters
    // pushed to the scans), the segment-filtered customer join (customer
    // scales with the corpus, so NOT broadcast — AQE picks the strategy
    // at runtime sizes), exact-DECIMAL revenue fold, and a global top-10
    // with the unique order key as tie-break (TakeOrderedAndProject —
    // per-partition top-10, never a full sort).
    "rel_tpch_q3" -> ((s, dir) => {
      val cut = lit("1998-06-01").cast("timestamp")
      val li = Tables(s, dir, "lineitem")
      val o = Tables(s, dir, "orders")
      val c = Tables(s, dir, "customer")
      li.where(col("l_shipdate") > cut)
        .join(o.where(col("o_orderdate") < cut),
          col("l_orderkey") === col("o_orderkey"))
        .join(c.where(col("c_mktsegment") === "BUILDING"),
          col("o_custkey") === col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(sum(dec(col("l_extendedprice"), 2) *
            (dec(lit(1), 2) - dec(col("l_discount"), 2)))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),

    // TPC-H Q10 shape (returned-item revenue per customer, one quarter):
    // returnflag + date filters at the scans, two fact-sized equi-joins,
    // the nation dim broadcast, top-20 losers by exact-DECIMAL revenue
    // with the unique customer key as tie-break.
    "rel_tpch_q10" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
      val o = Tables(s, dir, "orders")
      val c = Tables(s, dir, "customer")
      val n = Tables(s, dir, "nation")
      li.where(col("l_returnflag") === "R")
        .join(o.where(col("o_orderdate") >= lit("1998-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1998-04-01").cast("timestamp")),
          col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(sum(dec(col("l_extendedprice"), 2) *
            (dec(lit(1), 2) - dec(col("l_discount"), 2)))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),

    // TPC-H Q18 shape (large-volume customers): the having-subquery
    // pattern as a self-semi-join — lineitem aggregates once to find
    // big orders (map-side partial agg), re-joins itself on the order
    // key, then orders + customer attach. Exact DECIMAL threshold and
    // quantity fold; global top-100 by totalprice with the unique order
    // key as tie-break (TakeOrderedAndProject).
    "rel_tpch_q18" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
      val o = Tables(s, dir, "orders")
      val c = Tables(s, dir, "customer")
      val big = li.groupBy("l_orderkey")
        .agg(sum(dec(col("l_quantity"), 2)).as("__sq"))
        .where(col("__sq") > 250)
        .select("l_orderkey")
      li.join(big, "l_orderkey")
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(sum(dec(col("l_quantity"), 2)).cast("double").as("total_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    }),

    "rel_star_join" -> ((s, dir) => {
      val r = Tables(s, dir, "region")
      val n = Tables(s, dir, "nation")
      val c = Tables(s, dir, "customer")
      val o = Tables(s, dir, "orders")
      o.join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(count(lit(1)).as("n_orders"),
          sum(dec(col("o_totalprice"), 2)).cast("double").as("total"))
    }),

    // Salted two-phase aggregation (skew path): the salt is internal, the
    // result equals a plain grouped count — which is exactly the oracle.
    "rel_salted_agg" -> ((s, dir) =>
      graft.ops.Skew.saltedCount(Tables(s, dir, "lineitem"), Seq("l_returnflag", "l_linestatus"))),

    // Salted join for a skewed fact vs a small-but-unbroadcastable dim:
    // result ≡ the plain equi-join (the oracle — salts only spread the
    // shuffle; every fact row meets each matching dim row exactly once
    // because the dim replicates to ALL salt shards).
    "rel_salted_join" -> ((s, dir) => {
      val fact = Tables(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey").as("custkey"),
          col("o_totalprice"))
      val dim = Tables(s, dir, "customer")
        .select(col("c_custkey").as("custkey"), col("c_nationkey"))
      graft.ops.Skew.saltedJoin(fact, dim, "custkey", salts = 8)
    }),

    // ROLLUP hierarchy totals (subtotal rows carry NULL keys).
    "rel_rollup" -> ((s, dir) =>
      Tables(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"),
          sum(dec(col("l_quantity"), 2)).cast("double").as("qty"))),

    // Scalar-function surface: string/date/conditional functions commonly
    // used in lake queries (all deterministic, engine-portable).
    "rel_scalar_funcs" -> ((s, dir) =>
      Tables(s, dir, "orders").select(
        col("o_orderkey"),
        upper(col("o_orderpriority")).as("prio_upper"),
        substring(col("o_orderpriority"), 1, 1).as("prio_code"),
        concat_ws("#", col("o_orderstatus"), col("o_orderpriority")).as("status_tag"),
        length(col("o_orderpriority")).cast("long").as("prio_len"),
        year(col("o_orderdate")).cast("long").as("o_year"),
        month(col("o_orderdate")).cast("long").as("o_month"),
        when(col("o_totalprice") > 200000.0, lit("big")).otherwise(lit("small")).as("size_class"))),

    // Wide-to-long unpivot (the melt shape feature pipelines feed to
    // generic per-metric aggregators): four lineitem measures → (metric,
    // value) rows via the native unpivot operator — an Expand node, one
    // scan, no join/shuffle; 4× row fan-out stays partition-local.
    "rel_unpivot" -> ((s, dir) =>
      Tables(s, dir, "lineitem")
        .where(col("l_orderkey") % 50 === 0)
        .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
          col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax"))
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax")),
          "metric", "value")),

    // Join-key skew diagnostics: the shape metrics that decide whether
    // l_partkey needs salting before a fact-fact join at scale.
    "rel_key_skew" -> ((s, dir) =>
      graft.ops.Skew.keyStats(Tables(s, dir, "lineitem"), "l_partkey")),

    // Min/max/avg aggregate surface (avg via exact decimal sum / count).
    "rel_agg_minmax" -> ((s, dir) =>
      Tables(s, dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
          min(col("o_totalprice")).as("min_price"),
          max(col("o_totalprice")).as("max_price"),
          (sum(dec(col("o_totalprice"), 2)).cast("double") / count(lit(1))).as("avg_price"),
          min(col("o_orderdate")).as("first_order"),
          max(col("o_orderdate")).as("last_order"))),

    // Two broadcast dimensions on the fact table (part + supplier).
    "rel_part_supplier" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
      val p = Tables(s, dir, "part")
      val su = Tables(s, dir, "supplier")
      li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
        .groupBy("p_brand", "s_name")
        .agg(count(lit(1)).as("n"),
          sum(dec(col("l_quantity"), 2)).cast("double").as("qty"))
    }),

    // Grouped HAVING-style post-aggregation filter.
    "rel_group_having" -> ((s, dir) =>
      Tables(s, dir, "lineitem")
        .groupBy("l_partkey")
        .agg(count(lit(1)).as("n"), sum(dec(col("l_quantity"), 2)).cast("double").as("qty"))
        .where(col("n") >= 3)),

    // Bloom-pre-filtered semi join: the sketch prunes the fact scan before
    // its shuffle; the exact semi join that follows removes false
    // positives, so the result equals the plain semi join the oracle runs
    // (see [[graft.ops.BloomJoin]] for the 100 TB rationale).
    "rel_bloom_semi_join" -> ((s, dir) =>
      graft.ops.BloomJoin.bloomSemiJoin(
        Tables(s, dir, "lineitem"), "l_orderkey",
        Tables(s, dir, "orders").where(col("o_totalprice") > 400000.0), "o_orderkey",
        expectedItems = 1L << 14)
        .select("l_orderkey", "l_linenumber", "l_quantity")),

    // INTERSECT set semantics (customers in both price bands).
    "rel_intersect" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
      o.where(col("o_totalprice") > 300000.0).select("o_custkey")
        .intersect(o.where(col("o_totalprice") < 50000.0).select("o_custkey"))
    }),

    // EXCEPT set semantics (high-value-only customers).
    "rel_except" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
      o.where(col("o_totalprice") > 300000.0).select("o_custkey")
        .except(o.where(col("o_totalprice") < 50000.0).select("o_custkey"))
    }),

    // CUBE: all grouping-set combinations (subtotals carry NULL keys).
    "rel_cube" -> ((s, dir) =>
      Tables(s, dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"),
          sum(dec(col("l_quantity"), 2)).cast("double").as("qty"))),

    // Explicit GROUPING SETS (the general form CUBE/ROLLUP specialize):
    // one scan expands rows per set, one shuffle — at 100 TB this beats N
    // separate GROUP BYs by N-1 scans.
    "rel_grouping_sets" -> ((s, dir) =>
      Tables(s, dir, "lineitem")
        .groupingSets(
          Seq(Seq(col("l_returnflag"), col("l_linestatus")),
            Seq(col("l_returnflag")), Seq()),
          col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          sum(dec(col("l_quantity"), 2)).cast("double").as("qty"))),

    // Navigation/distribution window functions (lead, first_value, ntile)
    // over a total per-customer order (o_orderkey breaks date ties).
    "rel_window_funcs" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables(s, dir, "orders").select(
        col("o_custkey"), col("o_orderkey"),
        lead(col("o_orderkey"), 1).over(w).as("next_order"),
        first(col("o_totalprice")).over(w).as("first_price"),
        ntile(4).over(w).cast("long").as("quartile"))
    }),

    // RANGE-frame window (value-based, not row-based): 30-day trailing
    // spend per customer. A RANGE frame includes ALL peers at equal order
    // values, so the result is deterministic under ties where a rows-frame
    // would not be; physically still one per-customer shuffle + linear
    // sliding-frame pass.
    "rel_window_range_frame" -> ((s, dir) => {
      val days = datediff(col("o_orderdate"), lit("1970-01-01").cast("date"))
      val w = Window.partitionBy("o_custkey").orderBy(days).rangeBetween(-30, 0)
      Tables(s, dir, "orders").select(
        col("o_custkey"), col("o_orderkey"),
        sum(dec(col("o_totalprice"), 2)).over(w).cast("double").as("sum_30d"),
        count(lit(1)).over(w).cast("long").as("n_30d"))
    }),

    // Global top-N: ORDER BY + LIMIT plans as TakeOrderedAndProject —
    // per-partition heaps of N rows, no global sort, no full-data
    // exchange (the only global-ordering shape that survives 100 TB).
    "rel_topn_global" -> ((s, dir) =>
      Tables(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(100)),

    // Data-quality expectation suite: four row rules in ONE scan/agg pass
    // plus a uniqueness check (see [[graft.ops.Quality]]). Rules chosen so
    // both outcomes appear (not_null/unique pass; range/set/regex fail).
    "dq_orders_suite" -> ((s, dir) => {
      import graft.ops.Quality
      Quality.suite(Tables(s, dir, "orders"),
        Seq(Quality.notNull("o_custkey"),
          Quality.inRange("o_totalprice", 0.0, 400000.0),
          Quality.inSet("o_orderstatus", Seq("O", "F")),
          Quality.matches("o_orderpriority", "^[1-3]-")),
        uniqueKeys = Seq(Seq("o_orderkey")))
    }),

    // Column profiling: per-column null/distinct statistics in one agg
    // pass (see [[graft.ops.Profile]]; exact distincts here for the
    // oracle — the approx=true HLL path is the 100 TB shape).
    "dq_profile_orders" -> ((s, dir) =>
      graft.ops.Profile.profile(Tables(s, dir, "orders"),
        Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"))),

    // Benford first-digit profile: the classic fabricated-amounts audit
    // — genuine transaction amounts lead with 1 far more often than
    // with 9, and a synthetic/tampered feed shows up as a flat digit
    // histogram. The digit comes from the STRING form of the exact
    // cents integer (the repo's floor convention), so there is no
    // log/pow float anywhere; share is the single IEEE division both
    // engines mirror. One partial-agg pass; 9 output rows.
    "dq_benford" -> ((s, dir) =>
      Tables(s, dir, "orders")
        .withColumn("__c",
          expr("CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)"))
        .withColumn("digit",
          substring(col("__c").cast("string"), 1, 1).cast("long"))
        .groupBy("digit")
        .agg(count(lit(1)).as("n_rows"))
        .withColumn("share",
          col("n_rows").cast("double") /
            sum(col("n_rows")).over(Window.partitionBy()).cast("double"))),

    // Functional-dependency audit (source → lang on documents): a
    // single-language crawl source is the expected shape; mixed-language
    // sources flag mis-crawls or contamination. Per source: row count,
    // exact distinct languages, the majority language (count-desc,
    // lang-asc tie-break — deterministic), its share, and the violated
    // bit. One partial-agg over (source, lang) — never a row-level
    // distinct — then a per-source WindowGroupLimit argmax.
    "dq_fd_violations" -> ((s, dir) => {
      val byLang = Tables(s, dir, "documents")
        .groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("__n"))
      val w = Window.partitionBy("source")
      val rn = Window.partitionBy("source")
        .orderBy(col("__n").desc, col("lang"))
      byLang
        .withColumn("n_rows", sum(col("__n")).over(w))
        .withColumn("n_langs", count(lit(1)).over(w))
        .withColumn("__rn", row_number().over(rn))
        .where(col("__rn") === 1)
        .select(col("source"), col("n_rows"), col("n_langs"),
          col("lang").as("top_lang"),
          (col("__n").cast("double") / col("n_rows").cast("double"))
            .as("top_share"),
          (col("n_langs") > 1).as("violated"))
    }),

    // Referential-integrity audit across the star schema: four real FK
    // edges (all clean on TPC-H-shaped data) plus one deliberately
    // broken edge (customer parent restricted to keys ≡ 0 mod 3) so
    // both outcomes appear. Each check is one left-anti join on the
    // key hash against the parent's DISTINCT pruned key column —
    // dimension parents broadcast under AQE, the lineitem→orders
    // fact-fact edge degrades to one co-partitioned shuffle (see
    // [[graft.ops.Quality.checkReferential]]).
    "dq_referential" -> ((s, dir) => {
      import graft.ops.Quality.checkReferential
      Seq(
        checkReferential(Tables(s, dir, "orders"), Tables(s, dir, "customer"),
          Seq("o_custkey"), Seq("c_custkey")),
        checkReferential(Tables(s, dir, "lineitem"), Tables(s, dir, "orders"),
          Seq("l_orderkey"), Seq("o_orderkey")),
        checkReferential(Tables(s, dir, "lineitem"), Tables(s, dir, "part"),
          Seq("l_partkey"), Seq("p_partkey")),
        checkReferential(Tables(s, dir, "customer"), Tables(s, dir, "nation"),
          Seq("c_nationkey"), Seq("n_nationkey")),
        checkReferential(Tables(s, dir, "orders"),
          Tables(s, dir, "customer").where(col("c_custkey") % 3 === 0),
          Seq("o_custkey"), Seq("c_custkey"))
          .withColumn("rule", concat(col("rule"), lit(":mod3"))))
        .reduce(_ unionByName _)
    }),

    // Clustering-quality audit (the "should I re-cluster" advisor): two
    // DETERMINISTIC file layouts of orders — range-clustered (bucket =
    // key·8 div (max+1)) vs scattered (key mod 8), one file per bucket —
    // indexed by StatsIndex, then the max point-probe file fan-in from
    // an endpoint sweep over the per-file [min,max] intervals
    // ([[graft.io.StatsIndex.overlapDepth]]). Clustered → depth 1 (zone
    // maps prune everything); scattered → depth = n_files (they prune
    // nothing). The bucket formulas are pure key arithmetic, so DuckDB
    // re-derives the exact file boundaries and the same sweep.
    "dq_overlap_depth" -> ((s, dir) => {
      val base = statsFixtures.computeIfAbsent(
        s"${s.sparkContext.applicationId}:$dir:overlap", _ => {
          val b = java.nio.file.Paths.get(QueryTmp.dir("overlap"))
          val o = Tables(s, dir, "orders")
          val mx = o.agg(max(col("o_orderkey"))).head().getLong(0)
          def layout(f: org.apache.spark.sql.Column, sub: String): Unit =
            o.withColumn("f", f)
              .repartition(col("f"))
              .write.partitionBy("f").mode("overwrite").parquet(s"$b/$sub")
          layout(expr(s"(o_orderkey * 8) div ${mx + 1L}"), "clustered")
          layout(expr("o_orderkey % 8"), "scattered")
          b.toString
        })
      def depth(sub: String) = graft.io.StatsIndex.overlapDepth(
        graft.io.StatsIndex.build(s, s"$base/$sub", Seq("o_orderkey"))
          .withColumn("layout", lit(sub)),
        "o_orderkey", "layout")
      depth("clustered").unionByName(depth("scattered"))
    }),

    // Cross-table consistency tie-out (does Σ lineitem extended math
    // reproduce o_totalprice?) — the reconciliation audit every
    // warehouse runs between a fact table and its rollup. All money
    // math in EXACT integers: prices to cents, discount/tax to whole
    // percits (both are 2-decimal by contract), so the per-order sum
    // ext_cents·(100−disc)·(100+tax) is an exact BIGINT in 10⁻⁴-cent
    // units and the comparison is equality, not an epsilon. One
    // map-side-combined lineitem rollup + one co-partitioned fact-fact
    // join on the order key + a |status|-row final agg — no row ever
    // leaves its orderkey partition twice. (On this fixture totals are
    // generated independently of lineitems, so every order mismatches
    // — the audit's point is the exact magnitude readout.)
    "dq_consistency" -> ((s, dir) => {
      val cents = (c: org.apache.spark.sql.Column) =>
        floor(c * 100.0 + 0.5).cast("long")
      val li = Tables(s, dir, "lineitem")
        .select(col("l_orderkey"),
          (cents(col("l_extendedprice")) *
            (lit(100L) - cents(col("l_discount"))) *
            (lit(100L) + cents(col("l_tax")))).as("__v"))
        .groupBy("l_orderkey").agg(sum(col("__v")).as("calc_u"))
      Tables(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"),
          (cents(col("o_totalprice")) * lit(10000L)).as("tot_u"))
        .join(li, col("o_orderkey") === col("l_orderkey"), "left")
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_orders"),
          sum(when(col("calc_u").isNull, 1L).otherwise(0L)).as("n_no_lines"),
          sum(when(col("calc_u").isNotNull && col("calc_u") =!= col("tot_u"),
            1L).otherwise(0L)).as("n_mismatched"),
          max(when(col("calc_u").isNotNull, abs(col("calc_u") - col("tot_u"))))
            .as("max_abs_diff_u"))
        .withColumn("max_abs_diff",
          col("max_abs_diff_u").cast("double") / 1.0e6)
    }),

    // String-shape profiling (the "what formats live in this column"
    // audit): collapse letter runs to 'A' and digit runs to '9', then
    // count shapes per column — one malformed feed row shows up as a
    // second shape where production expects exactly one. Four columns
    // stacked in one pass each (union of column-pruned scans), shapes
    // counted with a map-side-combined agg; share is one division off
    // an exact integer window sum, example is the per-shape min (byte
    // order — ASCII-identical in both engines).
    "dq_value_shapes" -> ((s, dir) => {
      def shaped(t: String, c: String) =
        Tables(s, dir, t).select(lit(c).as("column"),
          regexp_replace(regexp_replace(col(c), "[A-Za-z]+", "A"),
            "[0-9]+", "9").as("shape"),
          col(c).as("__v"))
      val stacked = shaped("customer", "c_name")
        .unionAll(shaped("part", "p_brand"))
        .unionAll(shaped("part", "p_type"))
        .unionAll(shaped("orders", "o_orderpriority"))
      stacked.groupBy("column", "shape")
        .agg(count(lit(1)).as("n_rows"), min(col("__v")).as("example"))
        .withColumn("share", col("n_rows").cast("double") /
          sum(col("n_rows")).over(Window.partitionBy("column")).cast("double"))
    }),

    // Distribution-drift audit between two cohorts (even/odd custkey —
    // the stand-in for yesterday/today): o_totalprice over 10
    // equal-width bins from the global [min,max]. Per bin both counts,
    // both shares, the total-variation term and the chi-square-distance
    // term; the TOTAL TV distance is computed in EXACT rational form —
    // Σ|n_a·t_b − n_b·t_a| is an exact BIGINT, divided once by
    // 2·t_a·t_b — because a float window-sum of the per-bin terms would
    // be accumulation-order-sensitive (the repo's no-float-refold rule).
    // One scan + one 10-row agg; min/max from a single partial-agg pass.
    "dq_drift" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
        .select(col("o_custkey"), col("o_totalprice"))
      val mm = o.agg(min(col("o_totalprice")).as("__mn"),
        max(col("o_totalprice")).as("__mx"))
      val binned = o.crossJoin(broadcast(mm))
        // degenerate range (mx == mn, e.g. a constant-valued column) would
        // divide by zero → NaN → floor null → least skips nulls = bin 9 in
        // Spark while DuckDB's BIGINT cast of NaN errors; pin bin 0 in both
        .withColumn("bin", when(col("__mx") === col("__mn"), lit(0L))
          .otherwise(least(lit(9L),
            floor((col("o_totalprice") - col("__mn")) * 10.0 /
              (col("__mx") - col("__mn"))))))
        .groupBy("bin")
        .agg(sum(when(col("o_custkey") % 2 === 0, 1L).otherwise(0L)).as("n_a"),
          sum(when(col("o_custkey") % 2 =!= 0, 1L).otherwise(0L)).as("n_b"))
      val w = Window.partitionBy(lit(1))
      binned
        .withColumn("__ta", sum(col("n_a")).over(w))
        .withColumn("__tb", sum(col("n_b")).over(w))
        .withColumn("pa", col("n_a").cast("double") / col("__ta").cast("double"))
        .withColumn("pb", col("n_b").cast("double") / col("__tb").cast("double"))
        .withColumn("tv_term", abs(col("pa") - col("pb")) / 2.0)
        .withColumn("chi2_term",
          when(col("pa") + col("pb") === 0.0, 0.0)
            .otherwise((col("pa") - col("pb")) * (col("pa") - col("pb")) /
              (col("pa") + col("pb"))))
        .withColumn("tv_total",
          (sum(abs(col("n_a") * col("__tb") - col("n_b") * col("__ta"))).over(w))
            .cast("double") /
            (lit(2.0) * col("__ta").cast("double") * col("__tb").cast("double")))
        .select("bin", "n_a", "n_b", "pa", "pb", "tv_term", "chi2_term",
          "tv_total")
    }),

    // Label-balance audit over the embeddings table (is the training
    // mix still uniform across classes?): per label the observed count,
    // the uniform expectation, its ratio, and the chi-square term; the
    // TOTAL chi-square statistic in closed form — k·Σn²/t − t needs ONE
    // division off exact integers (Σ(n−t/k)²/(t/k) algebraically), so
    // no order-sensitive float refold. One |labels|-row partial agg.
    "dq_class_balance" -> ((s, dir) => {
      val w = Window.partitionBy(lit(1))
      Tables(s, dir, "embeddings")
        .groupBy("label").agg(count(lit(1)).as("n_rows"))
        .withColumn("__k", count(lit(1)).over(w))
        .withColumn("__t", sum(col("n_rows")).over(w))
        .withColumn("__sumsq", sum(col("n_rows") * col("n_rows")).over(w))
        .withColumn("expected",
          col("__t").cast("double") / col("__k").cast("double"))
        .withColumn("ratio", col("n_rows").cast("double") / col("expected"))
        .withColumn("chi2_term",
          (col("n_rows").cast("double") - col("expected")) *
            (col("n_rows").cast("double") - col("expected")) / col("expected"))
        .withColumn("chi2_total",
          (col("__k") * col("__sumsq")).cast("double") /
            col("__t").cast("double") - col("__t").cast("double"))
        .select("label", "n_rows", "expected", "ratio", "chi2_term",
          "chi2_total")
    }),

    // Candidate-key discovery (the profiling step schema inference and
    // dedup-key selection start from): exact distinct counts for every
    // column plus the (custkey, orderdate) pair in ONE aggregate —
    // Catalyst plans the multi-distinct as one Expand pass. At 100 TB
    // swap countDistinct for approx_count_distinct: same single-scan
    // shape, mergeable HLL state (the dq_profile approx pattern).
    "dq_candidate_keys" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
      val agg = o.agg(count(lit(1)).as("n"),
        countDistinct(col("o_orderkey")).as("d1"),
        countDistinct(col("o_custkey")).as("d2"),
        countDistinct(col("o_orderstatus")).as("d3"),
        countDistinct(col("o_totalprice")).as("d4"),
        countDistinct(col("o_orderdate")).as("d5"),
        countDistinct(col("o_orderpriority")).as("d6"),
        countDistinct(col("o_custkey"), col("o_orderdate")).as("d7"))
      agg.select(col("n"), expr(
        """stack(7,
          |'o_orderkey', d1, 'o_custkey', d2, 'o_orderstatus', d3,
          |'o_totalprice', d4, 'o_orderdate', d5, 'o_orderpriority', d6,
          |'o_custkey,o_orderdate', d7) AS (column_set, n_distinct)""".stripMargin))
        .select(col("column_set"), col("n_distinct"), col("n").as("n_rows"),
          (col("n_distinct").cast("double") / col("n").cast("double"))
            .as("uniqueness"),
          (col("n_distinct") === col("n")).as("is_key"))
    }),

    // K-anonymity audit over the (nation, segment) quasi-identifier —
    // the privacy readout before releasing derived data: any group
    // smaller than k re-identifies its members. Per group the exact
    // size and the below-k flag; globally the smallest group (the
    // table's actual k) and the share of rows at risk — integers
    // through one window, one final division. One partial-agg pass.
    "dq_k_anonymity" -> ((s, dir) => {
      val k = 5L
      val w = Window.partitionBy(lit(1))
      Tables(s, dir, "customer")
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(count(lit(1)).as("n_rows"))
        .withColumn("below_k", col("n_rows") < k)
        .withColumn("k_min", min(col("n_rows")).over(w))
        .withColumn("risk_share",
          sum(when(col("n_rows") < k, col("n_rows")).otherwise(0L)).over(w)
            .cast("double") / sum(col("n_rows")).over(w).cast("double"))
    }),

    // Z-order (Morton) values for two-dimensional clustering (see
    // [[graft.ops.ZOrder]] — the layout pass that makes parquet min/max
    // prune on BOTH keys). The value function is the oracle-checked part;
    // the repartitionByRange layout is pinned by ZOrderSpec.
    "rel_zorder_value" -> ((s, dir) =>
      Tables(s, dir, "orders").select(col("o_orderkey"),
        graft.ops.ZOrder.zValue(col("o_custkey"), col("o_orderkey")).as("z"))),

    // Data-skipping read through a file-level stats index: orders written
    // range-clustered on o_orderkey (8 files), per-file min/max built with
    // one aggregation scan, then a selective key-range read opens ONLY the
    // files whose interval can match — row-identical to the plain filter
    // (the index changes which files are OPENED, never the answer).
    // The clustered copy + index are a FIXTURE (the table layout a real
    // deployment maintains once via ZOrder/compaction + StatsIndex.refresh)
    // — built once per (session, sf dir) so the query times the indexed
    // READ path, not repeated fixture construction.
    "rel_stats_prune" -> ((s, dir) => {
      val (t, stats) = statsPruneFixture(s, dir)
      graft.io.StatsIndex.prunedRead(s, t, stats, "o_orderkey",
        Some(100L), Some(499L))
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
          "o_orderdate", "o_orderpriority")
    }),

    // Point lookup through the per-file BLOOM sidecar: o_custkey is
    // unclustered in the range-partitioned fixture, so min/max
    // intersects every file — only the bloom prunes (StatsIndexSpec
    // asserts files-actually-read shrinks). False positives are read
    // and filtered by the exact equality; the answer never changes.
    "rel_stats_prune_point" -> ((s, dir) => {
      val (t, stats) = statsPruneFixture(s, dir)
      graft.io.StatsIndex.prunedReadPoint(s, t, stats, "o_custkey", 1L)
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
          "o_orderdate", "o_orderpriority")
    }),

    // Distribution window functions: percent_rank / cume_dist over a
    // total per-status order (both are exact integer-ratio doubles —
    // rank arithmetic, engine-portable bit-for-bit).
    "rel_window_dist" -> ((s, dir) => {
      val w = Window.partitionBy("o_orderstatus")
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      Tables(s, dir, "orders").select(
        col("o_orderstatus"), col("o_orderkey"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"))
    }),

    // Ordered string aggregation (collect_list is unordered in a
    // distributed agg — array_sort makes the result deterministic, which
    // is also the only portable semantics).
    "rel_string_agg" -> ((s, dir) =>
      Tables(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(array_join(array_sort(collect_list(col("o_orderstatus"))), ",").as("statuses"),
          count(lit(1)).as("n"))),

    // TPC-H Q13 shape (customer order-count distribution): LEFT OUTER
    // join customer↔filtered orders, a null-aware count(o_orderkey) that
    // yields 0 for match-less customers (count(col) skips the null-filled
    // right side — exactly where engines disagree), then a second
    // aggregation over the counts. Both sides scale with the corpus, so
    // neither is broadcast: shuffle join on the customer key, then the
    // two shuffles of the double aggregation. The order filter rides in
    // the scan, NOT the join condition, which is equivalent for LEFT
    // OUTER (right-side-only predicate) and keeps it pushed to parquet.
    "rel_tpch_q13" -> ((s, dir) => {
      val c = Tables(s, dir, "customer")
      val o = Tables(s, dir, "orders")
        .where(col("o_orderpriority").startsWith("5-") && col("o_totalprice") > 150000.0)
      c.join(o, col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
    }),

    // Null-key FULL OUTER semantics pin: join keys made nullable on BOTH
    // sides (a null key matches nothing — not even another null — so
    // those rows surface on their own side null-filled), then null-aware
    // aggregates over the join output. Unmatched orders land in the NULL
    // c_mktsegment group; count(col) vs count(*) and null-skipping sum
    // pin the null-fill-through-aggregation contract.
    "rel_outer_join" -> ((s, dir) => {
      val o = Tables(s, dir, "orders").select(
        col("o_orderkey"), col("o_totalprice"),
        when(col("o_orderkey") % 7 === 0, lit(null))
          .otherwise(col("o_custkey")).as("k"))
      val c = Tables(s, dir, "customer").select(
        col("c_custkey"), col("c_mktsegment"),
        when(col("c_custkey") % 5 === 0, lit(null))
          .otherwise(col("c_custkey")).as("ck"))
      o.join(c, col("k") === col("ck"), "full_outer")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_rows"),
          count(col("o_orderkey")).as("n_orders"),
          count(col("c_custkey")).as("n_matched_cust"),
          sum(dec(col("o_totalprice"), 2)).cast("double").as("total"))
    }),

    // Null-safe equality join (<=>): NULL keys MATCH each other — the
    // semantics plain `=` silently drops (rel_outer_join pins the drop;
    // this pins the match). Still an EQUI-join: Spark hashes the
    // null-safe key, so the plan is a broadcast/hash join, never a
    // BroadcastNestedLoopJoin (spec-asserted). The post-join aggregate
    // checks the NULL group's pair arithmetic (null-cust × null-supp),
    // not just row counts. DuckDB: IS NOT DISTINCT FROM.
    "rel_nullsafe_join" -> ((s, dir) => {
      val c = Tables(s, dir, "customer").select(col("c_custkey"),
        when(col("c_acctbal") < 0, lit(null))
          .otherwise(col("c_nationkey")).as("k"))
      val sup = Tables(s, dir, "supplier").select(col("s_suppkey"),
        when(col("s_acctbal") < 0, lit(null))
          .otherwise(col("s_nationkey")).as("k2"))
      c.join(sup, col("k") <=> col("k2"))
        .groupBy("k")
        .agg(count(lit(1)).as("n_pairs"),
          count_distinct(col("c_custkey")).as("n_cust"),
          count_distinct(col("s_suppkey")).as("n_supp"))
    }),

    // EXACT weighted median per group at scale: a grouped two-phase
    // parallel prefix sum over (price, unique key) order gives each row
    // its cumulative weight — never a per-group single-partition sort —
    // and the median is the first row whose doubled cumulative weight
    // reaches the group total, picked by ONE partial-agg MIN over the
    // (price, key) triple. Weights are exact integer quantities; the
    // median is a data value, no interpolation, no float arithmetic.
    "rel_weighted_median" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem").select(col("l_returnflag"),
        col("l_extendedprice").as("price"),
        col("l_quantity").cast("long").as("w"),
        col("l_orderkey").as("ok"), col("l_linenumber").cast("long").as("ln"))
      val run = graft.ops.Curation.parallelRunningSum(li,
        Seq("l_returnflag"), Seq("price", "ok", "ln"), "w", "cumw")
      val tot = li.groupBy("l_returnflag").agg(sum(col("w")).as("totw"))
      run.join(broadcast(tot), "l_returnflag")
        .where(lit(2L) * col("cumw") >= col("totw"))
        .groupBy("l_returnflag")
        .agg(min(struct(col("price"), col("ok"), col("ln"))).as("__m"),
          max(col("totw")).as("total_weight"))
        .select(col("l_returnflag"), col("total_weight"),
          col("__m").getField("price").as("weighted_median"))
    }),

    // NOT IN vs NULLs — the classic three-valued-logic trap, pinned:
    // against a null-free key set NOT IN behaves like an anti join;
    // one NULL in the set and NOT IN returns ZERO rows (x <> NULL is
    // UNKNOWN for every x). Spark plans the single-column case as a
    // null-aware BroadcastHashJoin, not a nested loop (spec-asserted).
    "rel_not_in_null" -> ((s, dir) => {
      Tables(s, dir, "customer").createOrReplaceTempView("__nin_c")
      Tables(s, dir, "supplier").createOrReplaceTempView("__nin_s")
      s.sql(
        """SELECT
          |  (SELECT count(*) FROM __nin_c
          |   WHERE c_nationkey NOT IN
          |     (SELECT s_nationkey FROM __nin_s WHERE s_nationkey < 10))
          |    AS n_not_in_clean,
          |  (SELECT count(*) FROM __nin_c
          |   WHERE c_nationkey NOT IN
          |     (SELECT CASE WHEN s_acctbal < 0 THEN NULL ELSE s_nationkey END
          |      FROM __nin_s WHERE s_nationkey < 10 OR s_acctbal < 0))
          |    AS n_not_in_nullable""".stripMargin)
    }),

    // Per-group MODE with deterministic tie-break (count desc, then
    // value) and its share of the group — exact integer counts, one
    // mirrored division. Two partial-agg exchanges, a values-sized
    // window, never a sort of the fact table.
    "rel_mode" -> ((s, dir) => {
      val counts = Tables(s, dir, "orders")
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("cnt"))
      val W = org.apache.spark.sql.expressions.Window
        .partitionBy("o_orderstatus")
        .orderBy(col("cnt").desc, col("o_orderpriority"))
      counts
        .withColumn("total", sum(col("cnt")).over(
          org.apache.spark.sql.expressions.Window.partitionBy("o_orderstatus")))
        .withColumn("__rn", row_number().over(W)).where(col("__rn") === 1)
        .select(col("o_orderstatus"), col("o_orderpriority").as("mode_priority"),
          col("cnt").as("n_mode"), col("total").as("n_total"),
          (col("cnt").cast("double") / col("total").cast("double")).as("share"))
    }),

    // Equi-width histogram per group (zero-anchored 20k bins): the
    // single-pass distribution profile — bin index is one exact-double
    // division + floor (identical IEEE ops), counts and the per-bin
    // DECIMAL revenue total are exact, one partial-aggregated exchange.
    "rel_price_histogram" -> ((s, dir) =>
      Tables(s, dir, "orders")
        .groupBy(col("o_orderpriority"),
          floor(col("o_totalprice") / lit(20000.0)).cast("long").as("bin"))
        .agg(count(lit(1)).as("n_orders"),
          sum(dec(col("o_totalprice"), 2)).cast("double").as("total"))),

    // Per-group winsorized statistics: clip each line's exact-cents
    // price to its return-flag's [p05, p95] discrete quantiles, then
    // report the clipped sum and clip counts — the outlier-robust
    // aggregate a metrics pipeline uses where a raw SUM would let one
    // fat-finger row move the number. Cutoffs come from
    // percentile_approx in its EXACT regime (≡ DuckDB quantile_disc
    // bit-for-bit, the text_quality_cutoff argument) — a group-count
    // table broadcast back over the scan, so the clip pass is
    // scan-speed; everything after the cutoff is LONG arithmetic.
    "rel_winsorize" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem").withColumn("__cents",
        expr("CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)"))
      val cuts = li.groupBy("l_returnflag")
        .agg(expr("percentile_approx(__cents, 0.05, 1000000)").as("lo"),
          expr("percentile_approx(__cents, 0.95, 1000000)").as("hi"))
      li.join(broadcast(cuts), "l_returnflag")
        .withColumn("__w", least(greatest(col("__cents"), col("lo")), col("hi")))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(col("__w")).as("sum_winsorized_cents"),
          sum(when(col("__cents") < col("lo"), 1L).otherwise(0L)).as("n_clipped_low"),
          sum(when(col("__cents") > col("hi"), 1L).otherwise(0L)).as("n_clipped_high"),
          max(col("lo")).as("lo_cents"), max(col("hi")).as("hi_cents"))
    }),

    // IGNORE NULLS window semantics pin — the LOCF / last-known-value
    // family every gap-tolerant time series needs: last_value and
    // first_value skipping nulls over a running frame, and
    // null-skipping lag. Heavy lines (quantity >= 25) carry a price,
    // the rest are the nulls being carried over; one (orderkey)
    // exchange shared by all three windows.
    "rel_window_ignore_nulls" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .where(col("l_orderkey") < 3000)
        .withColumn("pv",
          when(col("l_quantity") >= 25, col("l_extendedprice")))
        .createOrReplaceTempView("__win_li")
      s.sql(
        """SELECT l_orderkey, l_linenumber, pv,
          |  last(pv, true) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber
          |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf,
          |  first(pv, true) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber
          |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_nn,
          |  lag(pv) IGNORE NULLS OVER (PARTITION BY l_orderkey
          |    ORDER BY l_linenumber) AS prev_nn
          |FROM __win_li""".stripMargin)
    }),

    // 2-D skyline (Pareto frontier): orders no other order beats on
    // BOTH price (lower-or-equal) and recency (newer-or-equal, strictly
    // better on one) — the multi-criteria shortlist operator
    // (Börzsönyi et al. 2001). Distributed sort-filter: per-price
    // candidate reduction, two-phase sliced running max (no single-task
    // corpus window — the only global window runs over #slices rows),
    // broadcast join back. Dates compare as exact micros.
    "rel_skyline" -> ((s, dir) =>
      graft.ops.Skyline.skyline2d(
        Tables(s, dir, "orders")
          .select(col("o_orderkey"), col("o_totalprice"),
            expr("unix_micros(CAST(o_orderdate AS TIMESTAMP))").as("odate_us")),
        "o_totalprice", "odate_us")),

    // String-function surface sweep: the everyday scalar kit pinned
    // cross-engine in one scan (names differ — Spark instr ≡ DuckDB
    // strpos — but 1-based semantics match; all per-row, no shuffle).
    "rel_string_funcs" -> ((s, dir) =>
      Tables(s, dir, "customer").where(col("c_custkey") < 100)
        .select(col("c_custkey"),
          length(col("c_name")).as("len"),
          upper(col("c_name")).as("up"),
          lower(col("c_name")).as("lo"),
          expr("substr(c_name, 3, 8)").as("sub"),
          lpad(col("c_name"), 25, "*").as("lp"),
          rpad(col("c_name"), 25, "*").as("rp"),
          reverse(col("c_name")).as("rev"),
          regexp_replace(col("c_name"), "0", "#").as("repl"),
          expr("split_part(c_name, '#', 2)").as("sp"),
          expr("instr(c_name, '#')").as("pos"),
          expr("left(c_name, 4)").as("l4"),
          expr("right(c_name, 4)").as("r4"),
          expr("repeat('ab', 3)").as("rep"))),

    // Datetime-function surface sweep: calendar arithmetic pinned
    // cross-engine — ISO week numbers, end-of-month clamping in
    // add_months, quarter truncation, day diffs against an epoch.
    "rel_datetime_funcs" -> ((s, dir) =>
      Tables(s, dir, "orders").where(col("o_orderkey") < 1000)
        .select(col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"),
          quarter(col("o_orderdate")).as("q"),
          dayofyear(col("o_orderdate")).as("doy"),
          weekofyear(col("o_orderdate")).as("iso_week"),
          last_day(col("o_orderdate")).as("eom"),
          datediff(col("o_orderdate"), lit("1995-01-01")).as("days_since"),
          add_months(col("o_orderdate"), 1).as("next_month"),
          date_trunc("quarter", col("o_orderdate")).cast("date")
            .as("q_start"))),

    // Signed integer division/modulo portability pin: `div` truncates
    // toward zero and `%` follows the dividend's sign in BOTH engines
    // (unlike Python's floor semantics); pmod's always-positive result
    // mirrors as ((a % b) + b) % b. The arithmetic every partitioner
    // and bucketing scheme depends on.
    "rel_arith_semantics" -> ((s, dir) =>
      Tables(s, dir, "lineitem").where(col("l_orderkey") < 2000)
        .select(col("l_orderkey"), col("l_linenumber"))
        .distinct()
        .withColumn("a", col("l_orderkey") - 1000L)
        .select(col("l_orderkey"), col("l_linenumber"), col("a"),
          expr("a div 7").as("tdiv"),
          (col("a") % 7).as("tmod"),
          pmod(col("a"), lit(7)).as("pm"),
          abs(col("a")).as("ab"),
          signum(col("a")).cast("long").as("sgn"),
          greatest(col("a"), lit(0L)).as("gr"),
          least(col("a"), lit(0L)).as("ls"))),

    // Pairwise association rules over order baskets (the frequent-
    // itemset / market-basket classic, pair level): co-occurrence
    // counts from one basket self-join on the order key (pair fan-out
    // is bounded by lines-per-order², ~7² — never corpus²), then
    // support / confidence / lift as divisions of exact LONG counts.
    // The n_ab ≥ 3 floor is applied BEFORE the item-count joins, so
    // the rule table the joins see is already tiny; item counts
    // broadcast (2k parts).
    "rel_basket_rules" -> ((s, dir) => {
      val b = Tables(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey")).distinct()
        .localCheckpoint(true)
      val no = b.agg(countDistinct("l_orderkey").as("__no"))
      val items = b.groupBy(col("l_partkey")).agg(count(lit(1)).as("__cnt"))
      b.as("x").join(b.as("y"),
          col("x.l_orderkey") === col("y.l_orderkey") &&
            col("x.l_partkey") < col("y.l_partkey"))
        .groupBy(col("x.l_partkey").as("part_a"),
          col("y.l_partkey").as("part_b"))
        .agg(count(lit(1)).as("n_ab"))
        .where(col("n_ab") >= 3)
        .join(broadcast(items.select(col("l_partkey").as("part_a"),
          col("__cnt").as("__na"))), Seq("part_a"))
        .join(broadcast(items.select(col("l_partkey").as("part_b"),
          col("__cnt").as("__nb"))), Seq("part_b"))
        .crossJoin(broadcast(no))
        .select(col("part_a"), col("part_b"), col("n_ab"),
          (col("n_ab").cast("double") / col("__no").cast("double"))
            .as("support"),
          (col("n_ab").cast("double") / col("__na").cast("double"))
            .as("confidence"),
          ((col("n_ab") * col("__no")).cast("double") /
            (col("__na") * col("__nb")).cast("double")).as("lift"))
    }),

    // RFM customer segmentation (recency / frequency / monetary): the
    // classic lifecycle-marketing cut, each dimension scored 1-4 by
    // global quartile. Metrics are one partial-agg pass over orders
    // (monetary in exact cents, the repo's floor(v·100 + 0.5)
    // convention); each quartile rank is the two-phase
    // parallelRunningSum — no single-task global window (the
    // rel_equidepth_hist argument) — and the score is pure integer
    // arithmetic on the exact rank, ascending order so the TOP quartile
    // scores 4. Ties break on the unique customer key in BOTH engines.
    "rel_rfm_segments" -> ((s, dir) => {
      def ranked(df: DataFrame, keep: Seq[String],
                 orderCols: Seq[String], rankCol: String) =
        graft.ops.Curation.parallelRunningSum(
            df.withColumn("__one", lit(1L)), Nil, orderCols, "__one", rankCol)
          .select((keep :+ rankCol).map(col): _*)
      val cust = Tables(s, dir, "orders")
        .withColumn("__cents",
          expr("CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)"))
        .groupBy(col("o_custkey"))
        .agg(max(col("o_orderdate")).as("last_order"),
          count(lit(1)).as("frequency"),
          sum(col("__cents")).as("monetary_cents"))
        .localCheckpoint(true) // three rank passes + the size agg read it
      val n = cust.groupBy().agg(count(lit(1)).as("__n"))
      val base = Seq("o_custkey", "last_order", "frequency", "monetary_cents")
      val withR = ranked(cust, base, Seq("last_order", "o_custkey"), "__rr")
      val withF = ranked(withR, base :+ "__rr",
        Seq("frequency", "o_custkey"), "__fr")
      val withM = ranked(withF, base ++ Seq("__rr", "__fr"),
        Seq("monetary_cents", "o_custkey"), "__mr")
      withM.crossJoin(broadcast(n))
        .select(col("o_custkey"), col("last_order"), col("frequency"),
          col("monetary_cents"),
          expr("((__rr - 1) * 4) div __n + 1").as("r_score"),
          expr("((__fr - 1) * 4) div __n + 1").as("f_score"),
          expr("((__mr - 1) * 4) div __n + 1").as("m_score"))
        .withColumn("segment", concat(col("r_score").cast("string"),
          col("f_score").cast("string"), col("m_score").cast("string")))
    }),

    // Equi-depth histogram: every bucket holds (within one row) the same
    // COUNT regardless of value skew — the planner-statistics /
    // percentile-binning twin of the equi-width rel_price_histogram.
    // The global rank is the two-phase parallelRunningSum over the
    // deterministic (price, orderkey) order — range-partitioned slices
    // plus a broadcast offset join, so there is NO single-task global
    // window (a plain ntile() would funnel the corpus through one
    // partition). bucket = ((rank-1)*k) div n + 1 is pure integer
    // arithmetic on the exact rank (it reproduces ntile's first-buckets-
    // get-the-remainder sizes only approximately, so BOTH engines use
    // this formula, not ntile); lo/hi compare raw doubles — no float
    // arithmetic anywhere, engine-exact.
    "rel_equidepth_hist" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
        .select(col("o_totalprice"), col("o_orderkey"))
        .withColumn("__one", lit(1L))
      val n = o.groupBy().agg(count(lit(1)).as("__n"))
      graft.ops.Curation.parallelRunningSum(o, Nil,
          Seq("o_totalprice", "o_orderkey"), "__one", "__rank")
        .crossJoin(broadcast(n))
        .withColumn("bucket", expr("((__rank - 1) * 8) div __n + 1"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_orders"),
          min(col("o_totalprice")).as("lo"),
          max(col("o_totalprice")).as("hi"))
    }),

    // explode_outer null-row semantics pin: per order, the array of its
    // heavy (quantity >= 45) linenumbers; explode_outer keeps array-less
    // orders as one NULL-element row — exactly the left outer join the
    // SQL mirror states (each array element came from one lineitem row,
    // so the exploded stream IS the join's right side). Aggregated per
    // priority so the oracle is order-free: exploded row count, orders
    // with no match, exact integer linenumber sum.
    "rel_explode_outer" -> ((s, dir) => {
      val heavy = Tables(s, dir, "lineitem").where(col("l_quantity") >= 45)
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_list(col("l_linenumber"))).as("__lns"))
      Tables(s, dir, "orders")
        .join(heavy, col("o_orderkey") === col("l_orderkey"), "left")
        .select(col("o_orderpriority"), explode_outer(col("__lns")).as("__ln"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col("__ln").isNull, 1L).otherwise(0L)).as("n_unmatched"),
          coalesce(sum(col("__ln")), lit(0L)).as("sum_ln"))
    }),

    // TPC-H Q17 shape (small-quantity-order revenue): the correlated
    // scalar subquery `l_quantity < 0.2 * avg(l_quantity per part)`
    // decorrelated into ONE per-part aggregate joined back on the part
    // key — the subquery runs once as a grouped agg, never per row. The
    // brand dim filter broadcasts and is applied BEFORE both the agg and
    // the probe side (restricting to the filtered partkeys leaves the
    // per-part avg unchanged). The 0.2·avg comparison is cross-multiplied
    // into exact decimals (5·n·qty < Σqty) so no engine-specific decimal
    // division rounding can flip a row.
    "rel_tpch_q17" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
      val p = Tables(s, dir, "part").where(col("p_brand") === "Brand#23")
      val liF = li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .select("l_partkey", "l_quantity", "l_extendedprice")
      val perPart = liF.groupBy(col("l_partkey").as("pk"))
        .agg(sum(dec(col("l_quantity"), 2)).as("__sumq"),
          count(lit(1)).cast("decimal(10,0)").as("__nq"))
      liF.join(perPart, col("l_partkey") === col("pk"))
        .where(col("l_quantity").cast(DecimalType(9, 2)) * lit(5) * col("__nq") < col("__sumq"))
        .agg((sum(dec(col("l_extendedprice"), 2)).cast("double") / lit(7.0)).as("avg_yearly"),
          count(lit(1)).as("n_cheap"))
    }),

    // TPC-H Q4 shape (order-priority checking): correlated EXISTS whose
    // predicate references BOTH sides (late lineitem vs ITS order's
    // date) — decorrelated into one left-SEMI join with the equi key
    // plus the lateness residual; the quarter filter stays pushed to
    // the orders scan. One fact-fact semi join, one grouped count.
    "rel_tpch_q4" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
        .where(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-10-01").cast("timestamp"))
      val li = Tables(s, dir, "lineitem")
      o.join(li, col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
          "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
    }),

    // TPC-H Q16 shape (supplier relationship count): NOT IN subquery as
    // a broadcast left-ANTI join (the excluded supplier set is tiny and
    // null-free, so anti ≡ NOT IN), distinct-count aggregation per part
    // attribute pair, top-50 by (count desc, brand, size).
    "rel_tpch_q16" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
      val p = Tables(s, dir, "part").where(col("p_brand") =!= "Brand#45")
      val excl = Tables(s, dir, "supplier").where(col("s_acctbal") < 0)
        .select(col("s_suppkey"))
      li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(broadcast(excl), col("l_suppkey") === col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_size")
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_size"))
        .limit(50)
    }),

    // TPC-H Q20 shape (excess-share suppliers): the NESTED subquery
    // chain — suppliers semi-join (part, supplier) volume shares whose
    // own scalar-per-group subquery (1/7 of the part's total) is
    // decorrelated into a second aggregation joined back on the part
    // key. The share comparison cross-multiplies in exact decimals.
    "rel_tpch_q20" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
      val pf = Tables(s, dir, "part").where(col("p_size") <= 15)
        .select("p_partkey")
      val ps = li.join(broadcast(pf), col("l_partkey") === col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(sum(dec(col("l_quantity"), 2)).cast(DecimalType(18, 2)).as("__q"))
      val pt = ps.groupBy(col("l_partkey").as("__pk"))
        .agg(sum(col("__q")).as("__tq"))
      val bigShare = ps.join(pt, col("l_partkey") === col("__pk"))
        .where(col("__q") * lit(7) > col("__tq"))
        .select(col("l_suppkey"))
      Tables(s, dir, "supplier")
        .join(bigShare, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name", "s_acctbal")
    }),

    // TPC-H Q22 shape (global-sales opportunity): scalar SUBQUERY
    // (average positive balance) decorrelated to a one-row broadcast
    // cross join, NOT EXISTS as a left-ANTI join against the high-value
    // orders, then a null-free grouped count/sum. The avg is the exact
    // decimal sum over the exact count — ONE IEEE division, portable.
    "rel_tpch_q22" -> ((s, dir) => {
      val c = Tables(s, dir, "customer")
      val avgBal = c.where(col("c_acctbal") > 0.0)
        .agg((sum(dec(col("c_acctbal"), 2)).cast("double") / count(lit(1))).as("__a"))
      c.crossJoin(broadcast(avgBal))
        .where(col("c_acctbal") > col("__a"))
        .join(Tables(s, dir, "orders").where(col("o_totalprice") > 400000.0),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy((col("c_nationkey") % 5).as("cntrycode"))
        .agg(count(lit(1)).as("numcust"),
          sum(dec(col("c_acctbal"), 2)).cast("double").as("totacctbal"))
    }),

    // TPC-H Q15 shape (top supplier): the CREATE VIEW + scalar max
    // subquery decorrelated to one revenue aggregation reused twice —
    // grouped per supplier, then a ONE-ROW global max broadcast back as
    // an exact-DECIMAL equality (ties all surface, deterministically).
    "rel_tpch_q15" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
        .where(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
      val rev = li.groupBy(col("l_suppkey"))
        .agg(sum(dec(col("l_extendedprice"), 2) *
          (dec(lit(1), 2) - dec(col("l_discount"), 2))).as("__r"))
      rev.crossJoin(broadcast(rev.agg(max(col("__r")).as("__mx"))))
        .where(col("__r") === col("__mx"))
        .join(Tables(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          col("__r").cast("double").as("total_revenue"))
    }),

    // TPC-H Q2 shape (min-cost supplier per part): the correlated
    // MIN-per-group subquery decorrelated to a second aggregation joined
    // back on (part, exact-DECIMAL min). The part-supplier cost table is
    // derived from lineitem (no partsupp in the schema): min observed
    // extendedprice per (part, supplier). Dimension chain broadcast.
    "rel_tpch_q2" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
      val pf = Tables(s, dir, "part").where(col("p_size") === 15)
        .select("p_partkey")
      val ps = li.join(broadcast(pf), col("l_partkey") === col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(min(dec(col("l_extendedprice"), 2)).as("__cost"))
      val mn = ps.groupBy(col("l_partkey").as("__pk"))
        .agg(min(col("__cost")).as("__mn"))
      ps.join(mn, col("l_partkey") === col("__pk") && col("__cost") === col("__mn"))
        .join(Tables(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("l_partkey").as("p_partkey"), col("s_suppkey"),
          col("s_name"), col("n_name"), col("__cost").cast("double").as("min_cost"))
    }),

    // TPC-H Q6 shape (forecast revenue change): the single-scan
    // conditional aggregate — every filter pushed to the scan, exact
    // DECIMAL price×discount fold, no joins at all.
    "rel_tpch_q6" -> ((s, dir) =>
      Tables(s, dir, "lineitem")
        .where(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .agg(sum(dec(col("l_extendedprice"), 2) * dec(col("l_discount"), 2))
          .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))),

    // TPC-H Q7 shape (volume shipping between two nations): both nation
    // dims pre-filtered to the two trading partners BEFORE their joins
    // (the OR pair predicate then only EXCLUDES same-nation pairs as a
    // residual), exact-DECIMAL revenue per (supp, cust, year).
    "rel_tpch_q7" -> ((s, dir) => {
      val pair = Seq("NATION_1", "NATION_2")
      val n1 = Tables(s, dir, "nation").where(col("n_name").isin(pair: _*))
        .select(col("n_nationkey").as("__sk"), col("n_name").as("supp_nation"))
      val n2 = Tables(s, dir, "nation").where(col("n_name").isin(pair: _*))
        .select(col("n_nationkey").as("__ck"), col("n_name").as("cust_nation"))
      Tables(s, dir, "lineitem")
        .join(Tables(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(Tables(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(Tables(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n1), col("s_nationkey") === col("__sk"))
        .join(broadcast(n2), col("c_nationkey") === col("__ck"))
        .where(col("supp_nation") =!= col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(sum(dec(col("l_extendedprice"), 2) *
          (dec(lit(1), 2) - dec(col("l_discount"), 2)))
          .cast("double").as("revenue"))
    }),

    // TPC-H Q8 shape (national market share): one conditional and one
    // total exact-DECIMAL volume fold per order year, the share being
    // their single IEEE division — no self-join, no second scan.
    "rel_tpch_q8" -> ((s, dir) => {
      val rev = dec(col("l_extendedprice"), 2) *
        (dec(lit(1), 2) - dec(col("l_discount"), 2))
      Tables(s, dir, "lineitem")
        .join(broadcast(Tables(s, dir, "part")
          .where(col("p_type") === "STANDARD").select("p_partkey")),
          col("l_partkey") === col("p_partkey"))
        .join(Tables(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(Tables(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(sum(when(col("n_name") === "NATION_3", rev)).cast("double").as("__nat"),
          sum(rev).cast("double").as("__all"))
        .select(col("o_year"), (col("__nat") / col("__all")).as("mkt_share"))
    }),

    // TPC-H Q9 shape (product-type profit): part-filtered fact joins
    // with revenue minus a retail-price cost stand-in (no partsupp in
    // the schema), exact DECIMAL arithmetic per (nation, year).
    "rel_tpch_q9" -> ((s, dir) =>
      Tables(s, dir, "lineitem")
        .join(broadcast(Tables(s, dir, "part")
          .where(col("p_name").contains("gizmo"))
          .select("p_partkey", "p_retailprice")),
          col("l_partkey") === col("p_partkey"))
        .join(Tables(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"), year(col("l_shipdate")).as("o_year"))
        .agg(sum(dec(col("l_extendedprice"), 2) *
            (dec(lit(1), 2) - dec(col("l_discount"), 2)) -
            dec(col("p_retailprice"), 2) * dec(col("l_quantity"), 2))
          .cast("double").as("sum_profit"))),

    // TPC-H Q11 shape (important stock): per-part value aggregation
    // gated by a GLOBAL-fraction scalar subquery — the one-row total
    // broadcasts back and the threshold comparison is one mirrored
    // IEEE multiply+compare on exact-DECIMAL sums cast to double.
    "rel_tpch_q11" -> ((s, dir) => {
      val pv = Tables(s, dir, "lineitem")
        .groupBy(col("l_partkey"))
        .agg(sum(dec(col("l_extendedprice"), 2) * dec(col("l_quantity"), 2))
          .as("__v"))
      pv.crossJoin(broadcast(pv.agg(sum(col("__v")).as("__t"))))
        .where(col("__v").cast("double") * lit(1500.0) > col("__t").cast("double"))
        .select(col("l_partkey").as("p_partkey"),
          col("__v").cast("double").as("part_value"))
    }),

    // TPC-H Q12 shape (shipping-delay priority check, adapted to this
    // schema's columns: lateness = shipped > 60 days after order):
    // one fact-fact join, exact conditional LONG counts per returnflag.
    "rel_tpch_q12" -> ((s, dir) =>
      Tables(s, dir, "lineitem")
        .join(Tables(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .where(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .groupBy("l_returnflag")
        .agg(sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("high_line_count"),
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
            .otherwise(1L)).as("low_line_count"))),

    // TPC-H Q14 shape (promotion-revenue share, one month): conditional
    // vs total exact-DECIMAL revenue, ONE mirrored IEEE expression.
    "rel_tpch_q14" -> ((s, dir) => {
      val rev = dec(col("l_extendedprice"), 2) *
        (dec(lit(1), 2) - dec(col("l_discount"), 2))
      Tables(s, dir, "lineitem")
        .where(col("l_shipdate") >= lit("1997-03-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
        .join(broadcast(Tables(s, dir, "part").select("p_partkey", "p_type")),
          col("l_partkey") === col("p_partkey"))
        .agg(sum(when(col("p_type") === "PROMO", rev)).cast("double").as("__promo"),
          sum(rev).cast("double").as("__all"))
        .select((lit(100.0) * col("__promo") / col("__all")).as("promo_revenue"))
    }),

    // TPC-H Q19 shape (disjunctive discounted revenue): the OR-of-ANDs
    // predicate rides the broadcast part join as a residual — the equi
    // key still extracts, so the plan stays a hash join, never a
    // nested loop (spec-asserted).
    "rel_tpch_q19" -> ((s, dir) =>
      Tables(s, dir, "lineitem")
        .join(broadcast(Tables(s, dir, "part").select("p_partkey", "p_brand")),
          col("l_partkey") === col("p_partkey") &&
            ((col("p_brand") === "Brand#12" &&
              col("l_quantity") >= 1 && col("l_quantity") <= 11) ||
              (col("p_brand") === "Brand#23" &&
                col("l_quantity") >= 10 && col("l_quantity") <= 20) ||
              (col("p_brand") === "Brand#24" &&
                col("l_quantity") >= 20 && col("l_quantity") <= 30)))
        .agg(sum(dec(col("l_extendedprice"), 2) *
          (dec(lit(1), 2) - dec(col("l_discount"), 2)))
          .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))),

    // Statistical aggregates with the engine's exactness contract: all
    // SUMS are exact DECIMAL folds (order-independent), the final
    // mean / sample-variance / stddev / correlation are ONE parenthesized
    // IEEE expression over those exact sums (textbook n·Σxy − Σx·Σy
    // forms), mirrored token-for-token in the oracle — so the values are
    // bit-identical regardless of row order or partitioning.
    "rel_stat_aggs" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
      val sums = li.groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(dec(col("l_quantity"), 2)).cast("double").as("__sx"),
          sum(dec(col("l_extendedprice"), 2)).cast("double").as("__sy"),
          sum(dec(col("l_quantity"), 2) * dec(col("l_quantity"), 2))
            .cast("double").as("__sxx"),
          sum(dec(col("l_extendedprice"), 2) * dec(col("l_extendedprice"), 2))
            .cast("double").as("__syy"),
          sum(dec(col("l_quantity"), 2) * dec(col("l_extendedprice"), 2))
            .cast("double").as("__sxy"))
      sums.select(col("l_returnflag"), col("n"),
        (col("__sx") / col("n")).as("mean_qty"),
        ((col("n") * col("__sxx") - col("__sx") * col("__sx"))
          / (col("n").cast("double") * (col("n") - 1))).as("var_qty"),
        sqrt((col("n") * col("__sxx") - col("__sx") * col("__sx"))
          / (col("n").cast("double") * (col("n") - 1))).as("std_qty"),
        ((col("n") * col("__sxy") - col("__sx") * col("__sy"))
          / (sqrt(col("n") * col("__sxx") - col("__sx") * col("__sx"))
            * sqrt(col("n") * col("__syy") - col("__sy") * col("__sy"))))
          .as("corr_qty_price"))
    }),

    // TPC-H Q21 shape (suppliers who kept orders waiting): the
    // EXISTS / NOT EXISTS chain as left-SEMI + left-ANTI self-joins over
    // one shared lateness-flagged fact (computed once, reused three
    // times). Equi-key on the order key with the supplier inequality as
    // a residual condition — hash/sort-merge joins, never a nested loop.
    // "Late" adapts the reference's receipt-vs-commit lag to this
    // schema: shipped >90 days after the order date. Global top-100 by
    // (numwait desc, s_name) plans as TakeOrderedAndProject.
    "rel_tpch_q21" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
      val o = Tables(s, dir, "orders").where(col("o_orderstatus") === "F")
      val su = Tables(s, dir, "supplier")
      val f = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_suppkey"),
          (col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS")).as("late"))
      val l2 = f.select(col("l_orderkey").as("ok2"), col("l_suppkey").as("sk2"))
      val l3 = f.where(col("late"))
        .select(col("l_orderkey").as("ok3"), col("l_suppkey").as("sk3"))
      f.where(col("late"))
        .join(l2, col("l_orderkey") === col("ok2") && col("l_suppkey") =!= col("sk2"), "left_semi")
        .join(l3, col("l_orderkey") === col("ok3") && col("l_suppkey") =!= col("sk3"), "left_anti")
        .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_name")
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(100)
    })
  )

  val oracles: Map[String, String] = Map(
    "rel_scan_filter" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount
        |FROM lineitem
        |WHERE l_shipdate < TIMESTAMP '1996-01-01' AND l_discount > 0.05""".stripMargin,

    "rel_agg_q1" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-01'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    // Approx-agg mirror: same md5-hash sample gate, same ×100 scale,
    // same exact-DECIMAL sums and final error division.
    "rel_approx_agg" ->
      """WITH ex AS (
        |  SELECT l_returnflag,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS exact_rev,
        |    count(*) AS exact_n
        |  FROM lineitem GROUP BY 1),
        |ap AS (
        |  SELECT l_returnflag,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS DOUBLE) AS est_rev,
        |    count(*) * 100 AS est_n
        |  FROM lineitem
        |  WHERE ('0x'||substr(md5('ap:'||l_orderkey::VARCHAR),1,15))::BIGINT % 100 = 0
        |  GROUP BY 1)
        |SELECT ex.l_returnflag, ex.exact_rev, ap.est_rev, ex.exact_n, ap.est_n,
        |       (ap.est_rev - ex.exact_rev) / ex.exact_rev AS rel_err
        |FROM ex LEFT JOIN ap ON ex.l_returnflag = ap.l_returnflag""".stripMargin,

    "rel_join_pk" ->
      """SELECT o_orderkey, o_totalprice, c_name, c_mktsegment
        |FROM orders JOIN customer ON o_custkey = c_custkey""".stripMargin,

    "rel_join_agg" ->
      """SELECT c_mktsegment,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,

    "rel_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)""".stripMargin,

    "rel_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)""".stripMargin,

    "rel_distinct" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",

    "rel_count_distinct" ->
      """SELECT count(DISTINCT o_custkey) AS n_cust,
        |       count(DISTINCT o_orderstatus) AS n_status,
        |       count(*) AS n_rows FROM orders""".stripMargin,

    "rel_window_rownum" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |  SELECT *, row_number() OVER (PARTITION BY o_custkey
        |            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |  FROM orders) WHERE rn = 1""".stripMargin,

    "rel_window_rank" ->
      """SELECT o_orderstatus, o_orderkey, o_totalprice, rnk FROM (
        |  SELECT o_orderstatus, o_orderkey, o_totalprice,
        |         rank() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC) AS rnk
        |  FROM orders) WHERE rnk <= 5""".stripMargin,

    "rel_window_running" ->
      """SELECT user_id, event_id,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id
        |       ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |       AS DOUBLE) AS running_value
        |FROM events""".stripMargin,

    "rel_union_by_name" ->
      """SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderstatus = 'F'
        |UNION ALL BY NAME
        |SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderstatus = 'O'""".stripMargin,

    "rel_tpch_q5" ->
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |           * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name""".stripMargin,

    "rel_tpch_q3" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |           * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE l_shipdate > TIMESTAMP '1998-06-01'
        |  AND o_orderdate < TIMESTAMP '1998-06-01'
        |  AND c_mktsegment = 'BUILDING'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,

    "rel_tpch_q10" ->
      """SELECT c_custkey, c_name, c_acctbal, n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |           * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1998-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-04-01'
        |GROUP BY 1, 2, 3, 4
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 20""".stripMargin,

    "rel_tpch_q18" ->
      """WITH big AS (
        |  SELECT l_orderkey FROM lineitem
        |  GROUP BY 1
        |  HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 250)
        |SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
        |FROM lineitem
        |JOIN big USING (l_orderkey)
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1, 2, 3, 4, 5
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 100""".stripMargin,

    "rel_star_join" ->
      """SELECT r_name, n_name, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin,

    "rel_salted_agg" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "rel_salted_join" ->
      """SELECT o_orderkey, o_custkey AS custkey, o_totalprice, c_nationkey
        |FROM orders JOIN customer ON o_custkey = c_custkey""".stripMargin,

    "rel_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,

    "rel_scalar_funcs" ->
      """SELECT o_orderkey,
        |  upper(o_orderpriority) AS prio_upper,
        |  substring(o_orderpriority, 1, 1) AS prio_code,
        |  concat_ws('#', o_orderstatus, o_orderpriority) AS status_tag,
        |  length(o_orderpriority)::BIGINT AS prio_len,
        |  year(o_orderdate)::BIGINT AS o_year,
        |  month(o_orderdate)::BIGINT AS o_month,
        |  CASE WHEN o_totalprice > 200000.0 THEN 'big' ELSE 'small' END AS size_class
        |FROM orders""".stripMargin,

    // UNION ALL mirror of the unpivot (metric names in the Spark
    // operator's declared measure order; row multiset is order-free).
    "rel_unpivot" ->
      """WITH src AS (
        |  SELECT l_orderkey, l_linenumber::BIGINT AS l_linenumber,
        |         l_quantity, l_extendedprice, l_discount, l_tax
        |  FROM lineitem WHERE l_orderkey % 50 = 0)
        |SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS value FROM src
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM src
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM src
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM src""".stripMargin,

    "rel_key_skew" ->
      """WITH c AS (SELECT l_partkey, count(*)::BIGINT AS n FROM lineitem GROUP BY 1)
        |SELECT count(*)::BIGINT AS n_keys,
        |       sum(n)::BIGINT AS n_rows,
        |       max(n)::BIGINT AS max_key_rows,
        |       max(n)::DOUBLE / sum(n)::DOUBLE AS top_share,
        |       sum(n)::DOUBLE / count(*)::DOUBLE AS mean_key_rows
        |FROM c""".stripMargin,

    "rel_agg_minmax" ->
      """SELECT o_orderstatus,
        |  min(o_totalprice) AS min_price,
        |  max(o_totalprice) AS max_price,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
        |  min(o_orderdate) AS first_order,
        |  max(o_orderdate) AS last_order
        |FROM orders GROUP BY o_orderstatus""".stripMargin,

    "rel_part_supplier" ->
      """SELECT p_brand, s_name, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY p_brand, s_name""".stripMargin,

    "rel_group_having" ->
      """SELECT l_partkey, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        |FROM lineitem GROUP BY l_partkey HAVING count(*) >= 3""".stripMargin,

    "rel_bloom_semi_join" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_orderkey = l_orderkey AND o_totalprice > 400000.0)""".stripMargin,

    "rel_intersect" ->
      """SELECT o_custkey FROM orders WHERE o_totalprice > 300000.0
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_totalprice < 50000.0""".stripMargin,

    "rel_except" ->
      """SELECT o_custkey FROM orders WHERE o_totalprice > 300000.0
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_totalprice < 50000.0""".stripMargin,

    "rel_cube" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin,

    "rel_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())""".stripMargin,

    "rel_window_funcs" ->
      """SELECT o_custkey, o_orderkey,
        |  lead(o_orderkey, 1) OVER w AS next_order,
        |  first_value(o_totalprice) OVER w AS first_price,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin,

    "rel_topn_global" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,

    "rel_window_dist" ->
      """SELECT o_orderstatus, o_orderkey,
        |  percent_rank() OVER w AS pct_rank,
        |  cume_dist() OVER w AS cume
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)""".stripMargin,

    "rel_string_agg" ->
      """SELECT o_custkey,
        |  string_agg(o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses,
        |  count(*) AS n
        |FROM orders GROUP BY o_custkey""".stripMargin,

    "rel_window_range_frame" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_30d,
        |  count(*) OVER w AS n_30d
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |             ORDER BY datediff('day', TIMESTAMP '1970-01-01', o_orderdate)
        |             RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)""".stripMargin,

    "rel_zorder_value" ->
      """WITH s AS (
        |  SELECT o_orderkey,
        |         o_custkey & 65535 AS a, o_orderkey & 65535 AS b
        |  FROM orders),
        |m1 AS (SELECT o_orderkey, (a | (a << 8)) & 16711935 AS a, (b | (b << 8)) & 16711935 AS b FROM s),
        |m2 AS (SELECT o_orderkey, (a | (a << 4)) & 252645135 AS a, (b | (b << 4)) & 252645135 AS b FROM m1),
        |m3 AS (SELECT o_orderkey, (a | (a << 2)) & 858993459 AS a, (b | (b << 2)) & 858993459 AS b FROM m2),
        |m4 AS (SELECT o_orderkey, (a | (a << 1)) & 1431655765 AS a, (b | (b << 1)) & 1431655765 AS b FROM m3)
        |SELECT o_orderkey, CAST(a | (b << 1) AS BIGINT) AS z FROM m4""".stripMargin,

    "rel_stats_prune" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |       o_orderdate, o_orderpriority
        |FROM orders WHERE o_orderkey BETWEEN 100 AND 499""".stripMargin,

    // Bloom pruning changes which files are OPENED, never the answer —
    // the oracle is the plain point lookup.
    "rel_stats_prune_point" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |       o_orderdate, o_orderpriority
        |FROM orders WHERE o_custkey = 1""".stripMargin,

    "dq_profile_orders" ->
      """WITH w AS (
        |  SELECT count(*) AS n,
        |    count(*) - count(o_orderkey) AS null1, count(DISTINCT o_orderkey) AS dist1,
        |    count(*) - count(o_custkey) AS null2, count(DISTINCT o_custkey) AS dist2,
        |    count(*) - count(o_orderstatus) AS null3, count(DISTINCT o_orderstatus) AS dist3,
        |    count(*) - count(o_totalprice) AS null4, count(DISTINCT o_totalprice) AS dist4
        |  FROM orders)
        |SELECT 'o_orderkey' AS "column", n AS n_rows,
        |       CAST(null1 AS BIGINT) AS n_nulls, CAST(dist1 AS BIGINT) AS n_distinct FROM w
        |UNION ALL SELECT 'o_custkey', n, CAST(null2 AS BIGINT), CAST(dist2 AS BIGINT) FROM w
        |UNION ALL SELECT 'o_orderstatus', n, CAST(null3 AS BIGINT), CAST(dist3 AS BIGINT) FROM w
        |UNION ALL SELECT 'o_totalprice', n, CAST(null4 AS BIGINT), CAST(dist4 AS BIGINT) FROM w""".stripMargin,

    "dq_orders_suite" ->
      """WITH w AS (
        |  SELECT count(*) AS n,
        |    CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v1,
        |    CAST(sum(CASE WHEN o_totalprice IS NOT NULL
        |                   AND (o_totalprice < 0.0 OR o_totalprice > 400000.0)
        |             THEN 1 ELSE 0 END) AS BIGINT) AS v2,
        |    CAST(sum(CASE WHEN o_orderstatus IS NOT NULL
        |                   AND o_orderstatus NOT IN ('O','F')
        |             THEN 1 ELSE 0 END) AS BIGINT) AS v3,
        |    CAST(sum(CASE WHEN o_orderpriority IS NOT NULL
        |                   AND NOT regexp_matches(o_orderpriority, '^[1-3]-')
        |             THEN 1 ELSE 0 END) AS BIGINT) AS v4
        |  FROM orders)
        |SELECT 'not_null:o_custkey' AS rule, v1 AS violations, n AS n_rows, v1 = 0 AS pass FROM w
        |UNION ALL
        |SELECT 'range:o_totalprice', v2, n, v2 = 0 FROM w
        |UNION ALL
        |SELECT 'in_set:o_orderstatus', v3, n, v3 = 0 FROM w
        |UNION ALL
        |SELECT 'matches:o_orderpriority', v4, n, v4 = 0 FROM w
        |UNION ALL
        |SELECT 'unique:o_orderkey',
        |       CAST(coalesce(sum(k - 1), 0) AS BIGINT),
        |       CAST(coalesce(sum(k), 0) AS BIGINT),
        |       coalesce(sum(k - 1), 0) = 0
        |FROM (SELECT count(*) AS k FROM orders GROUP BY o_orderkey) g""".stripMargin,

    // Benford mirror: same string-form first digit of the exact cents
    // integer, same single share division.
    "dq_benford" ->
      """WITH d AS (
        |  SELECT CAST(substr(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)::VARCHAR,
        |                     1, 1) AS BIGINT) AS digit
        |  FROM orders)
        |SELECT digit, count(*) AS n_rows,
        |       count(*)::DOUBLE / (sum(count(*)) OVER ())::DOUBLE AS share
        |FROM d GROUP BY 1""".stripMargin,

    // FD mirror: per-(source, lang) partial counts, majority pick via
    // the same (count desc, lang asc) tie-break, one share division.
    // Per-bucket min/max re-derived from the SAME bucket arithmetic the
    // fixture wrote (one file per bucket), then the identical endpoint
    // sweep.
    "dq_overlap_depth" ->
      """WITH mx AS (SELECT max(o_orderkey) AS m FROM orders),
        |b AS (
        |  SELECT 'clustered' AS layout, (o_orderkey * 8) // (m + 1) AS f, o_orderkey
        |  FROM orders, mx
        |  UNION ALL
        |  SELECT 'scattered', o_orderkey % 8, o_orderkey FROM orders),
        |iv AS (SELECT layout, f, min(o_orderkey) AS lo, max(o_orderkey) AS hi
        |       FROM b GROUP BY 1, 2),
        |ev AS (SELECT layout, lo AS p, 1 AS d FROM iv
        |       UNION ALL SELECT layout, hi + 1, -1 FROM iv),
        |byp AS (SELECT layout, p, sum(d) AS dd FROM ev GROUP BY 1, 2),
        |run AS (SELECT layout, sum(dd) OVER (PARTITION BY layout ORDER BY p
        |                 ROWS UNBOUNDED PRECEDING) AS depth FROM byp),
        |nf AS (SELECT layout, count(*) AS n_files FROM iv GROUP BY 1),
        |md AS (SELECT layout, max(depth) AS max_depth FROM run GROUP BY 1)
        |SELECT nf.layout, n_files::BIGINT AS n_files, max_depth::BIGINT AS max_depth
        |FROM nf JOIN md ON nf.layout = md.layout""".stripMargin,

    "dq_referential" ->
      """WITH checks AS (
        |  SELECT 'fk:o_custkey->c_custkey' AS rule,
        |    (SELECT count(*) FROM orders WHERE o_custkey IS NOT NULL
        |       AND o_custkey NOT IN (SELECT c_custkey FROM customer WHERE c_custkey IS NOT NULL)) AS violations,
        |    (SELECT count(*) FROM orders WHERE o_custkey IS NULL) AS n_nulls,
        |    (SELECT count(*) FROM orders) AS n_rows
        |  UNION ALL
        |  SELECT 'fk:l_orderkey->o_orderkey',
        |    (SELECT count(*) FROM lineitem WHERE l_orderkey IS NOT NULL
        |       AND l_orderkey NOT IN (SELECT o_orderkey FROM orders WHERE o_orderkey IS NOT NULL)),
        |    (SELECT count(*) FROM lineitem WHERE l_orderkey IS NULL),
        |    (SELECT count(*) FROM lineitem)
        |  UNION ALL
        |  SELECT 'fk:l_partkey->p_partkey',
        |    (SELECT count(*) FROM lineitem WHERE l_partkey IS NOT NULL
        |       AND l_partkey NOT IN (SELECT p_partkey FROM part WHERE p_partkey IS NOT NULL)),
        |    (SELECT count(*) FROM lineitem WHERE l_partkey IS NULL),
        |    (SELECT count(*) FROM lineitem)
        |  UNION ALL
        |  SELECT 'fk:c_nationkey->n_nationkey',
        |    (SELECT count(*) FROM customer WHERE c_nationkey IS NOT NULL
        |       AND c_nationkey NOT IN (SELECT n_nationkey FROM nation WHERE n_nationkey IS NOT NULL)),
        |    (SELECT count(*) FROM customer WHERE c_nationkey IS NULL),
        |    (SELECT count(*) FROM customer)
        |  UNION ALL
        |  SELECT 'fk:o_custkey->c_custkey:mod3',
        |    (SELECT count(*) FROM orders WHERE o_custkey IS NOT NULL
        |       AND o_custkey NOT IN (SELECT c_custkey FROM customer WHERE c_custkey % 3 = 0)),
        |    (SELECT count(*) FROM orders WHERE o_custkey IS NULL),
        |    (SELECT count(*) FROM orders))
        |SELECT rule, violations::BIGINT AS violations, n_nulls::BIGINT AS n_nulls,
        |       n_rows::BIGINT AS n_rows, violations = 0 AS pass
        |FROM checks""".stripMargin,

    "dq_fd_violations" ->
      """WITH bl AS (
        |  SELECT source, lang, count(*) AS n FROM documents GROUP BY 1, 2),
        |s AS (
        |  SELECT source, lang, n,
        |         sum(n) OVER (PARTITION BY source) AS n_rows,
        |         count(*) OVER (PARTITION BY source) AS n_langs,
        |         row_number() OVER (PARTITION BY source
        |                            ORDER BY n DESC, lang) AS rn
        |  FROM bl)
        |SELECT source, CAST(n_rows AS BIGINT) AS n_rows, n_langs,
        |       lang AS top_lang,
        |       n::DOUBLE / n_rows::DOUBLE AS top_share,
        |       n_langs > 1 AS violated
        |FROM s WHERE rn = 1""".stripMargin,

    // Consistency mirror: identical exact-integer money pipeline (cents,
    // whole percents, 10⁻⁴-cent sum units), LEFT JOIN + per-status agg.
    "dq_consistency" ->
      """WITH li AS (
        |  SELECT l_orderkey,
        |    sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)
        |        * (100 - CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT))
        |        * (100 + CAST(floor(l_tax * 100.0 + 0.5) AS BIGINT))) AS calc_u
        |  FROM lineitem GROUP BY 1),
        |j AS (
        |  SELECT o_orderstatus,
        |         CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) * 10000 AS tot_u,
        |         calc_u
        |  FROM orders LEFT JOIN li ON o_orderkey = l_orderkey),
        |g AS (
        |  SELECT o_orderstatus, count(*) AS n_orders,
        |    CAST(sum(CASE WHEN calc_u IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_no_lines,
        |    CAST(sum(CASE WHEN calc_u IS NOT NULL AND calc_u <> tot_u
        |             THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatched,
        |    CAST(max(CASE WHEN calc_u IS NOT NULL
        |             THEN abs(calc_u - tot_u) END) AS BIGINT) AS max_abs_diff_u
        |  FROM j GROUP BY 1)
        |SELECT *, max_abs_diff_u::DOUBLE / 1000000.0 AS max_abs_diff FROM g""".stripMargin,

    // Shape mirror: same two global regex collapses, same per-column
    // share division, min example (ASCII byte order on both engines).
    "dq_value_shapes" ->
      """WITH stacked AS (
        |  SELECT 'c_name' AS "column",
        |    regexp_replace(regexp_replace(c_name, '[A-Za-z]+', 'A', 'g'), '[0-9]+', '9', 'g') AS shape,
        |    c_name AS v FROM customer
        |  UNION ALL SELECT 'p_brand',
        |    regexp_replace(regexp_replace(p_brand, '[A-Za-z]+', 'A', 'g'), '[0-9]+', '9', 'g'),
        |    p_brand FROM part
        |  UNION ALL SELECT 'p_type',
        |    regexp_replace(regexp_replace(p_type, '[A-Za-z]+', 'A', 'g'), '[0-9]+', '9', 'g'),
        |    p_type FROM part
        |  UNION ALL SELECT 'o_orderpriority',
        |    regexp_replace(regexp_replace(o_orderpriority, '[A-Za-z]+', 'A', 'g'), '[0-9]+', '9', 'g'),
        |    o_orderpriority FROM orders)
        |SELECT "column", shape, count(*) AS n_rows, min(v) AS example,
        |  count(*)::DOUBLE / (sum(count(*)) OVER (PARTITION BY "column"))::DOUBLE AS share
        |FROM stacked GROUP BY 1, 2""".stripMargin,

    // Drift mirror: identical binning arithmetic, per-bin IEEE terms in
    // the same op order, exact-rational total TV (BIGINT numerator, one
    // division).
    "dq_drift" ->
      """WITH mm AS (SELECT min(o_totalprice) AS mn, max(o_totalprice) AS mx FROM orders),
        |b AS (
        |  SELECT CASE WHEN mx = mn THEN 0
        |              ELSE least(9, CAST(floor((o_totalprice - mn) * 10.0 / (mx - mn)) AS BIGINT)) END AS bin,
        |         CASE WHEN o_custkey % 2 = 0 THEN 1 ELSE 0 END AS a
        |  FROM orders, mm),
        |c AS (SELECT bin, CAST(sum(a) AS BIGINT) AS n_a,
        |             CAST(sum(1 - a) AS BIGINT) AS n_b FROM b GROUP BY 1),
        |t1 AS (SELECT *, (sum(n_a) OVER ())::BIGINT AS ta,
        |              (sum(n_b) OVER ())::BIGINT AS tb FROM c),
        |t2 AS (SELECT *, (sum(abs(n_a * tb - n_b * ta)) OVER ())::BIGINT AS num FROM t1),
        |p AS (SELECT *, n_a::DOUBLE / ta::DOUBLE AS pa,
        |             n_b::DOUBLE / tb::DOUBLE AS pb FROM t2)
        |SELECT bin, n_a, n_b, pa, pb,
        |  abs(pa - pb) / 2.0 AS tv_term,
        |  CASE WHEN pa + pb = 0.0 THEN 0.0
        |       ELSE (pa - pb) * (pa - pb) / (pa + pb) END AS chi2_term,
        |  num::DOUBLE / (2.0 * ta::DOUBLE * tb::DOUBLE) AS tv_total
        |FROM p""".stripMargin,

    // Candidate-key mirror: one aggregate row, stacked to the same grain.
    "dq_candidate_keys" ->
      """WITH w AS (
        |  SELECT count(*) AS n,
        |    count(DISTINCT o_orderkey) AS d1, count(DISTINCT o_custkey) AS d2,
        |    count(DISTINCT o_orderstatus) AS d3, count(DISTINCT o_totalprice) AS d4,
        |    count(DISTINCT o_orderdate) AS d5, count(DISTINCT o_orderpriority) AS d6,
        |    count(DISTINCT (o_custkey, o_orderdate)) AS d7
        |  FROM orders),
        |s AS (
        |  SELECT 'o_orderkey' AS column_set, d1 AS n_distinct, n FROM w
        |  UNION ALL SELECT 'o_custkey', d2, n FROM w
        |  UNION ALL SELECT 'o_orderstatus', d3, n FROM w
        |  UNION ALL SELECT 'o_totalprice', d4, n FROM w
        |  UNION ALL SELECT 'o_orderdate', d5, n FROM w
        |  UNION ALL SELECT 'o_orderpriority', d6, n FROM w
        |  UNION ALL SELECT 'o_custkey,o_orderdate', d7, n FROM w)
        |SELECT column_set, CAST(n_distinct AS BIGINT) AS n_distinct,
        |       n AS n_rows,
        |       n_distinct::DOUBLE / n::DOUBLE AS uniqueness,
        |       n_distinct = n AS is_key
        |FROM s""".stripMargin,

    // K-anonymity mirror: same grouping, integer windows, one division.
    "dq_k_anonymity" ->
      """WITH g AS (
        |  SELECT c_nationkey, c_mktsegment, count(*) AS n_rows
        |  FROM customer GROUP BY 1, 2),
        |w AS (SELECT *, (min(n_rows) OVER ())::BIGINT AS k_min,
        |        (sum(CASE WHEN n_rows < 5 THEN n_rows ELSE 0 END) OVER ())::BIGINT AS risk,
        |        (sum(n_rows) OVER ())::BIGINT AS total FROM g)
        |SELECT c_nationkey, c_mktsegment, n_rows, n_rows < 5 AS below_k,
        |       k_min, risk::DOUBLE / total::DOUBLE AS risk_share
        |FROM w""".stripMargin,

    // Class-balance mirror: same closed-form chi-square off exact
    // integer window sums, one division per float column.
    "dq_class_balance" ->
      """WITH c AS (SELECT label, count(*) AS n_rows FROM embeddings GROUP BY 1),
        |w AS (SELECT *, (count(*) OVER ())::BIGINT AS k,
        |             (sum(n_rows) OVER ())::BIGINT AS t,
        |             (sum(n_rows * n_rows) OVER ())::BIGINT AS sumsq FROM c),
        |e AS (SELECT *, t::DOUBLE / k::DOUBLE AS expected FROM w)
        |SELECT label, n_rows, expected,
        |  n_rows::DOUBLE / expected AS ratio,
        |  (n_rows::DOUBLE - expected) * (n_rows::DOUBLE - expected) / expected AS chi2_term,
        |  (k * sumsq)::DOUBLE / t::DOUBLE - t::DOUBLE AS chi2_total
        |FROM e""".stripMargin,

    "rel_tpch_q13" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN orders
        |    ON c_custkey = o_custkey
        |   AND o_orderpriority LIKE '5-%' AND o_totalprice > 150000.0
        |  GROUP BY c_custkey) t
        |GROUP BY c_count""".stripMargin,

    "rel_outer_join" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_totalprice,
        |         CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_custkey END AS k
        |  FROM orders),
        |c AS (
        |  SELECT c_custkey, c_mktsegment,
        |         CASE WHEN c_custkey % 5 = 0 THEN NULL ELSE c_custkey END AS ck
        |  FROM customer)
        |SELECT c_mktsegment, count(*) AS n_rows,
        |       count(o_orderkey) AS n_orders,
        |       count(c_custkey) AS n_matched_cust,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM o FULL OUTER JOIN c ON k = ck
        |GROUP BY c_mktsegment""".stripMargin,

    "rel_nullsafe_join" ->
      """WITH a AS (
        |  SELECT c_custkey,
        |         CASE WHEN c_acctbal < 0 THEN NULL ELSE c_nationkey END AS k
        |  FROM customer),
        |b AS (
        |  SELECT s_suppkey,
        |         CASE WHEN s_acctbal < 0 THEN NULL ELSE s_nationkey END AS k2
        |  FROM supplier)
        |SELECT a.k AS k, count(*) AS n_pairs,
        |       count(DISTINCT c_custkey) AS n_cust,
        |       count(DISTINCT s_suppkey) AS n_supp
        |FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k2
        |GROUP BY a.k""".stripMargin,

    "rel_weighted_median" ->
      """WITH li AS (
        |  SELECT l_returnflag, l_extendedprice AS price,
        |         CAST(l_quantity AS BIGINT) AS w, l_orderkey AS ok,
        |         CAST(l_linenumber AS BIGINT) AS ln
        |  FROM lineitem),
        |run AS (
        |  SELECT l_returnflag, price, ok, ln,
        |         sum(w) OVER (PARTITION BY l_returnflag ORDER BY price, ok, ln
        |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw
        |  FROM li),
        |tot AS (SELECT l_returnflag, sum(w)::BIGINT AS totw FROM li GROUP BY 1),
        |x AS (
        |  SELECT r.l_returnflag, r.price, r.ok, r.ln, t.totw
        |  FROM run r JOIN tot t USING (l_returnflag)
        |  WHERE 2 * r.cumw >= t.totw),
        |m AS (
        |  SELECT l_returnflag, totw AS total_weight, price,
        |         row_number() OVER (PARTITION BY l_returnflag ORDER BY price, ok, ln) AS rn
        |  FROM x)
        |SELECT l_returnflag, total_weight, price AS weighted_median
        |FROM m WHERE rn = 1""".stripMargin,

    "rel_not_in_null" ->
      """SELECT
        |  (SELECT count(*) FROM customer
        |   WHERE c_nationkey NOT IN
        |     (SELECT s_nationkey FROM supplier WHERE s_nationkey < 10))
        |    AS n_not_in_clean,
        |  (SELECT count(*) FROM customer
        |   WHERE c_nationkey NOT IN
        |     (SELECT CASE WHEN s_acctbal < 0 THEN NULL ELSE s_nationkey END
        |      FROM supplier WHERE s_nationkey < 10 OR s_acctbal < 0))
        |    AS n_not_in_nullable""".stripMargin,

    "rel_mode" ->
      """WITH c AS (
        |  SELECT o_orderstatus, o_orderpriority, count(*)::BIGINT AS cnt
        |  FROM orders GROUP BY 1, 2),
        |t AS (SELECT o_orderstatus, sum(cnt)::BIGINT AS total FROM c GROUP BY 1),
        |r AS (
        |  SELECT c.o_orderstatus, c.o_orderpriority, c.cnt, t.total,
        |         row_number() OVER (PARTITION BY c.o_orderstatus
        |                            ORDER BY c.cnt DESC, c.o_orderpriority) AS rn
        |  FROM c JOIN t USING (o_orderstatus))
        |SELECT o_orderstatus, o_orderpriority AS mode_priority,
        |       cnt AS n_mode, total AS n_total,
        |       cnt::DOUBLE / total::DOUBLE AS share
        |FROM r WHERE rn = 1""".stripMargin,

    "rel_price_histogram" ->
      """SELECT o_orderpriority,
        |       CAST(floor(o_totalprice / 20000.0) AS BIGINT) AS bin,
        |       count(*) AS n_orders,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY 1, 2""".stripMargin,

    "rel_winsorize" ->
      """WITH c AS (
        |  SELECT l_returnflag,
        |         CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS cents
        |  FROM lineitem),
        |cuts AS (
        |  SELECT l_returnflag,
        |         quantile_disc(cents, 0.05) AS lo,
        |         quantile_disc(cents, 0.95) AS hi
        |  FROM c GROUP BY 1)
        |SELECT c.l_returnflag, count(*) AS n,
        |       sum(least(greatest(cents, lo), hi))::BIGINT AS sum_winsorized_cents,
        |       count(*) FILTER (cents < lo) AS n_clipped_low,
        |       count(*) FILTER (cents > hi) AS n_clipped_high,
        |       max(lo) AS lo_cents, max(hi) AS hi_cents
        |FROM c JOIN cuts USING (l_returnflag)
        |GROUP BY 1""".stripMargin,

    "rel_window_ignore_nulls" ->
      """WITH li AS (
        |  SELECT l_orderkey, l_linenumber,
        |    CASE WHEN l_quantity >= 25 THEN l_extendedprice END AS pv
        |  FROM lineitem WHERE l_orderkey < 3000)
        |SELECT l_orderkey, l_linenumber, pv,
        |  last_value(pv IGNORE NULLS) OVER (PARTITION BY l_orderkey
        |    ORDER BY l_linenumber
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf,
        |  first_value(pv IGNORE NULLS) OVER (PARTITION BY l_orderkey
        |    ORDER BY l_linenumber
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_nn,
        |  lag(pv IGNORE NULLS) OVER (PARTITION BY l_orderkey
        |    ORDER BY l_linenumber) AS prev_nn
        |FROM li""".stripMargin,

    "rel_skyline" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_totalprice, epoch_us(o_orderdate) AS odate_us
        |  FROM orders),
        |pp AS (SELECT o_totalprice AS p, max(odate_us) AS d FROM o GROUP BY 1),
        |r AS (
        |  SELECT *, max(d) OVER (ORDER BY p
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
        |  FROM pp),
        |sk AS (SELECT p, d FROM r WHERE pm IS NULL OR d > pm)
        |SELECT o.o_orderkey, o.o_totalprice, o.odate_us
        |FROM o JOIN sk ON o.o_totalprice = sk.p AND o.odate_us = sk.d""".stripMargin,

    "rel_string_funcs" ->
      """SELECT c_custkey,
        |  length(c_name)::INT AS len,
        |  upper(c_name) AS up,
        |  lower(c_name) AS lo,
        |  substr(c_name, 3, 8) AS sub,
        |  lpad(c_name, 25, '*') AS lp,
        |  rpad(c_name, 25, '*') AS rp,
        |  reverse(c_name) AS rev,
        |  replace(c_name, '0', '#') AS repl,
        |  split_part(c_name, '#', 2) AS sp,
        |  strpos(c_name, '#')::BIGINT AS pos,
        |  left(c_name, 4) AS l4,
        |  right(c_name, 4) AS r4,
        |  repeat('ab', 3) AS rep
        |FROM customer WHERE c_custkey < 100""".stripMargin,

    "rel_datetime_funcs" ->
      """SELECT o_orderkey,
        |  year(o_orderdate)::INT AS y,
        |  month(o_orderdate)::INT AS m,
        |  quarter(o_orderdate)::INT AS q,
        |  dayofyear(o_orderdate)::INT AS doy,
        |  weekofyear(o_orderdate)::INT AS iso_week,
        |  last_day(o_orderdate::DATE) AS eom,
        |  datediff('day', DATE '1995-01-01', o_orderdate::DATE)::INT
        |    AS days_since,
        |  (o_orderdate + INTERVAL 1 MONTH)::DATE AS next_month,
        |  date_trunc('quarter', o_orderdate)::DATE AS q_start
        |FROM orders WHERE o_orderkey < 1000""".stripMargin,

    "rel_arith_semantics" ->
      """WITH d AS (
        |  SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem
        |  WHERE l_orderkey < 2000),
        |a AS (SELECT l_orderkey, l_linenumber, l_orderkey - 1000 AS a FROM d)
        |SELECT l_orderkey, l_linenumber, a,
        |  (a // 7)::BIGINT AS tdiv,
        |  (a % 7)::BIGINT AS tmod,
        |  (((a % 7) + 7) % 7)::BIGINT AS pm,
        |  abs(a)::BIGINT AS ab,
        |  sign(a)::BIGINT AS sgn,
        |  greatest(a, 0)::BIGINT AS gr,
        |  least(a, 0)::BIGINT AS ls
        |FROM a""".stripMargin,

    "rel_basket_rules" ->
      """WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |no AS (SELECT count(DISTINCT l_orderkey) AS n FROM b),
        |items AS (SELECT l_partkey, count(*) AS cnt FROM b GROUP BY 1),
        |pairs AS (
        |  SELECT x.l_partkey AS part_a, y.l_partkey AS part_b,
        |         count(*) AS n_ab
        |  FROM b x JOIN b y ON x.l_orderkey = y.l_orderkey
        |                   AND x.l_partkey < y.l_partkey
        |  GROUP BY 1, 2 HAVING count(*) >= 3)
        |SELECT part_a, part_b, n_ab,
        |  n_ab::DOUBLE / n::DOUBLE AS support,
        |  n_ab::DOUBLE / ia.cnt::DOUBLE AS confidence,
        |  (n_ab * n)::DOUBLE / (ia.cnt * ib.cnt)::DOUBLE AS lift
        |FROM pairs
        |JOIN items ia ON part_a = ia.l_partkey
        |JOIN items ib ON part_b = ib.l_partkey, no""".stripMargin,

    "rel_equidepth_hist" ->
      """WITH r AS (
        |  SELECT o_totalprice,
        |         row_number() OVER (ORDER BY o_totalprice, o_orderkey) AS rk,
        |         count(*) OVER () AS n
        |  FROM orders)
        |SELECT ((rk - 1) * 8) // n + 1 AS bucket,
        |       count(*) AS n_orders,
        |       min(o_totalprice) AS lo,
        |       max(o_totalprice) AS hi
        |FROM r GROUP BY 1""".stripMargin,

    // RFM mirror: same exact-cents metrics, same ascending rank +
    // integer-arithmetic quartile (row_number here — the oracle does
    // not need the two-phase rank, only its value), same tie-breaks.
    "rel_rfm_segments" ->
      """WITH c AS (
        |  SELECT o_custkey, max(o_orderdate) AS last_order,
        |         count(*) AS frequency,
        |         CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
        |              AS BIGINT) AS monetary_cents
        |  FROM orders GROUP BY 1),
        |r AS (
        |  SELECT *,
        |    row_number() OVER (ORDER BY last_order, o_custkey) AS rr,
        |    row_number() OVER (ORDER BY frequency, o_custkey) AS fr,
        |    row_number() OVER (ORDER BY monetary_cents, o_custkey) AS mr,
        |    count(*) OVER () AS n
        |  FROM c)
        |SELECT o_custkey, last_order, frequency, monetary_cents,
        |       ((rr - 1) * 4) // n + 1 AS r_score,
        |       ((fr - 1) * 4) // n + 1 AS f_score,
        |       ((mr - 1) * 4) // n + 1 AS m_score,
        |       (((rr - 1) * 4) // n + 1)::VARCHAR ||
        |       (((fr - 1) * 4) // n + 1)::VARCHAR ||
        |       (((mr - 1) * 4) // n + 1)::VARCHAR AS segment
        |FROM r""".stripMargin,

    "rel_explode_outer" ->
      """WITH h AS (
        |  SELECT l_orderkey, l_linenumber FROM lineitem WHERE l_quantity >= 45)
        |SELECT o_orderpriority, count(*) AS n_rows,
        |  CAST(sum(CASE WHEN l_linenumber IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_unmatched,
        |  CAST(coalesce(sum(l_linenumber), 0) AS BIGINT) AS sum_ln
        |FROM orders LEFT JOIN h ON o_orderkey = l_orderkey
        |GROUP BY 1""".stripMargin,

    "rel_tpch_q17" ->
      """WITH lif AS (
        |  SELECT l_partkey, l_quantity, l_extendedprice
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_brand = 'Brand#23'),
        |pp AS (
        |  SELECT l_partkey AS pk,
        |         sum(CAST(l_quantity AS DECIMAL(18,2))) AS sumq,
        |         CAST(count(*) AS DECIMAL(10,0)) AS nq
        |  FROM lif GROUP BY 1)
        |SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly,
        |       count(*) AS n_cheap
        |FROM lif JOIN pp ON l_partkey = pk
        |WHERE CAST(l_quantity AS DECIMAL(9,2)) * 5 * nq < sumq""".stripMargin,

    "rel_tpch_q4" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-10-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority""".stripMargin,

    "rel_tpch_q16" ->
      """SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#45'
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_size
        |LIMIT 50""".stripMargin,

    "rel_tpch_q20" ->
      """WITH ps AS (
        |  SELECT l_partkey, l_suppkey,
        |         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS q
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_size <= 15
        |  GROUP BY 1, 2),
        |pt AS (SELECT l_partkey, sum(q) AS tq FROM ps GROUP BY 1)
        |SELECT s_suppkey, s_name, s_acctbal
        |FROM supplier
        |WHERE EXISTS (SELECT 1 FROM ps JOIN pt USING (l_partkey)
        |              WHERE ps.l_suppkey = s_suppkey AND q * 7 > tq)""".stripMargin,

    "rel_tpch_q22" ->
      """WITH a AS (
        |  SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS ab
        |  FROM customer WHERE c_acctbal > 0.0)
        |SELECT c_nationkey % 5 AS cntrycode, count(*) AS numcust,
        |       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        |FROM customer, a
        |WHERE c_acctbal > ab
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
        |GROUP BY cntrycode""".stripMargin,

    "rel_tpch_q15" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |         sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |             * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS r
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate < TIMESTAMP '1997-04-01'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, CAST(r AS DOUBLE) AS total_revenue
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE r = (SELECT max(r) FROM rev)""".stripMargin,

    "rel_tpch_q2" ->
      """WITH ps AS (
        |  SELECT l_partkey, l_suppkey, min(CAST(l_extendedprice AS DECIMAL(18,2))) AS cost
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_size = 15 GROUP BY 1, 2),
        |mn AS (SELECT l_partkey, min(cost) AS m FROM ps GROUP BY 1)
        |SELECT ps.l_partkey AS p_partkey, s_suppkey, s_name, n_name,
        |       CAST(cost AS DOUBLE) AS min_cost
        |FROM ps JOIN mn ON ps.l_partkey = mn.l_partkey AND ps.cost = mn.m
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey""".stripMargin,

    "rel_tpch_q6" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |             * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |       count(*) AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07
        |  AND l_quantity < 24""".stripMargin,

    "rel_tpch_q7" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |       year(l_shipdate) AS l_year,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |           * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
        |         AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE n1.n_name IN ('NATION_1', 'NATION_2')
        |  AND n2.n_name IN ('NATION_1', 'NATION_2')
        |  AND n1.n_name <> n2.n_name
        |GROUP BY 1, 2, 3""".stripMargin,

    "rel_tpch_q8" ->
      """WITH v AS (
        |  SELECT year(o_orderdate) AS o_year,
        |    CAST(sum(CASE WHEN n_name = 'NATION_3'
        |          THEN CAST(l_extendedprice AS DECIMAL(18,2))
        |               * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) END)
        |      AS DOUBLE) AS nat,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |          * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS al
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  WHERE p_type = 'STANDARD'
        |  GROUP BY 1)
        |SELECT o_year, nat / al AS mkt_share FROM v""".stripMargin,

    "rel_tpch_q9" ->
      """SELECT n_name AS nation, year(l_shipdate) AS o_year,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |        * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
        |        - CAST(p_retailprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)))
        |    AS DOUBLE) AS sum_profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_name LIKE '%gizmo%'
        |GROUP BY 1, 2""".stripMargin,

    "rel_tpch_q11" ->
      """WITH pv AS (
        |  SELECT l_partkey,
        |         sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |             * CAST(l_quantity AS DECIMAL(18,2))) AS v
        |  FROM lineitem GROUP BY 1)
        |SELECT l_partkey AS p_partkey, CAST(v AS DOUBLE) AS part_value
        |FROM pv
        |WHERE CAST(v AS DOUBLE) * 1500.0 > (SELECT CAST(sum(v) AS DOUBLE) FROM pv)""".stripMargin,

    "rel_tpch_q12" ->
      """SELECT l_returnflag,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
        |    AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END)
        |    AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
        |GROUP BY 1""".stripMargin,

    "rel_tpch_q14" ->
      """SELECT 100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
        |    THEN CAST(l_extendedprice AS DECIMAL(18,2))
        |         * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) END) AS DOUBLE)
        |  / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |         * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
        |  AS promo_revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1997-03-01'
        |  AND l_shipdate < TIMESTAMP '1997-04-01'""".stripMargin,

    "rel_tpch_q19" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |          * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
        |    AS revenue,
        |  count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND l_quantity >= 1 AND l_quantity <= 11)
        |   OR (p_brand = 'Brand#23' AND l_quantity >= 10 AND l_quantity <= 20)
        |   OR (p_brand = 'Brand#24' AND l_quantity >= 20 AND l_quantity <= 30)""".stripMargin,

    "rel_stat_aggs" ->
      """WITH s AS (
        |  SELECT l_returnflag, count(*) AS n,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))
        |             * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |             * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))
        |             * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy
        |  FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, n,
        |  sx / n AS mean_qty,
        |  (n * sxx - sx * sx) / (CAST(n AS DOUBLE) * (n - 1)) AS var_qty,
        |  sqrt((n * sxx - sx * sx) / (CAST(n AS DOUBLE) * (n - 1))) AS std_qty,
        |  (n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
        |    AS corr_qty_price
        |FROM s""".stripMargin,

    "rel_tpch_q21" ->
      """WITH f AS (
        |  SELECT l_orderkey, l_suppkey,
        |         l_shipdate > o_orderdate + INTERVAL 90 DAY AS late
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderstatus = 'F')
        |SELECT s_name, count(*) AS numwait
        |FROM f l1 JOIN supplier ON l1.l_suppkey = s_suppkey
        |WHERE l1.late
        |  AND EXISTS (SELECT 1 FROM f l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM f l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey AND l3.late)
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 100""".stripMargin
  )
}
