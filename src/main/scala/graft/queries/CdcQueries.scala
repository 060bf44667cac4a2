package graft.queries

import graft.cdc.{ChangeFeed, Merge, Op, Scd2, SnapshotDiff}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-checkable CDC queries over a deterministic change fixture
  * (FIXTURES.md §3): `input_file_name()` is neither deterministic nor
  * DuckDB-expressible, so the declared queries drive the SAME merge
  * operators ([[graft.cdc.Merge]]) with an explicit `file_seq` ordering
  * column; the real file-based path is exercised by scalatest
  * (PipelineSpec/CdcStreamSpec).
  *
  * Fixture (seeded from `orders`, pure column functions, reproducible in
  * DuckDB SQL):
  *  - target    = orders tagged `Op='I'` (initial load);
  *  - CDC file 1 (`file_seq=1`): update keys ≡0 (mod 10) (+1.0 price,
  *    status 'X'), delete keys ≡1, insert keys ≡2 shifted by +10,000,000;
  *  - CDC file 2 (`file_seq=2`): update keys ≡0 (mod 20) again (+2.0
  *    price, status 'Y') — exercises cross-file latest-wins — and delete
  *    half the file-1 inserts (keys ≡2 mod 20, shifted).
  */
object CdcQueries {

  private val orderCols =
    Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority")
  private val orderColsSql = orderCols.mkString(", ")

  /** Target side: orders as a loaded lake table. */
  def target(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders").withColumn(Op.column, lit(Op.Insert))
      .select(col(Op.column) +: orderCols.map(col): _*)

  /** Deterministic two-file change batch with `file_seq`. One scan per
    * "file" with CASE-based op assignment (the branches partition the key
    * space, so a single pass per file emits the same row multiset as
    * per-branch scans — 2 parquet scans instead of 5). */
  def changes(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir, "orders")
    val m10 = col("o_orderkey") % 10
    val f1 = o.where(m10.isin(0, 1, 2)).select(
      when(m10 === 0, Op.Update).when(m10 === 1, Op.Delete).otherwise(Op.Insert).as(Op.column),
      when(m10 === 2, col("o_orderkey") + 10000000L).otherwise(col("o_orderkey")).as("o_orderkey"),
      col("o_custkey"),
      when(m10 === 0, lit("X")).otherwise(col("o_orderstatus")).as("o_orderstatus"),
      when(m10 === 0, col("o_totalprice") + 1.0).otherwise(col("o_totalprice")).as("o_totalprice"),
      col("o_orderdate"), col("o_orderpriority"),
      lit(1L).as(Merge.FileSeq))
    val m20 = col("o_orderkey") % 20
    val f2 = o.where(m20.isin(0, 2)).select(
      when(m20 === 0, Op.Update).otherwise(Op.Delete).as(Op.column),
      when(m20 === 2, col("o_orderkey") + 10000000L).otherwise(col("o_orderkey")).as("o_orderkey"),
      col("o_custkey"),
      when(m20 === 0, lit("Y")).otherwise(col("o_orderstatus")).as("o_orderstatus"),
      when(m20 === 0, col("o_totalprice") + 2.0).otherwise(col("o_totalprice")).as("o_totalprice"),
      col("o_orderdate"), col("o_orderpriority"),
      lit(2L).as(Merge.FileSeq))
    f1.unionByName(f2)
  }

  /** One on-disk MOR build of the fixture per (session, sf) — shared by
    * the read-only cdc_mor_merge / _asof / _diff queries. Cache PATHS,
    * not frames (the dirs outlive any cleared cache; deleted on JVM
    * exit by the temp-dir contract). */
  private val morFixtures =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def morFixture(s: SparkSession, dir: String): String =
    morFixtures.computeIfAbsent(s"${s.sparkContext.applicationId}:$dir", _ => {
      val base = QueryTmp.dir("mor_fix") + "/t"
      graft.io.MorTable.init(s, target(s, dir), base)
      val chg = changes(s, dir)
      graft.io.MorTable.merge(s, chg.where(col(Merge.FileSeq) === 1L), base, Seq("o_orderkey"))
      graft.io.MorTable.merge(s, chg.where(col(Merge.FileSeq) === 2L), base, Seq("o_orderkey"))
      base
    })

  /** Shared oracle CTEs for the fixture. */
  private val fixtureSql: String =
    s"""WITH target AS (
       |  SELECT 'I' AS "Op", $orderColsSql, CAST(0 AS BIGINT) AS file_seq FROM orders
       |), changes AS (
       |  SELECT 'U' AS "Op", o_orderkey, o_custkey, 'X' AS o_orderstatus,
       |         o_totalprice + 1.0 AS o_totalprice, o_orderdate, o_orderpriority,
       |         CAST(1 AS BIGINT) AS file_seq
       |  FROM orders WHERE o_orderkey % 10 = 0
       |  UNION ALL
       |  SELECT 'D', $orderColsSql, 1 FROM orders WHERE o_orderkey % 10 = 1
       |  UNION ALL
       |  SELECT 'I', o_orderkey + 10000000, o_custkey, o_orderstatus, o_totalprice,
       |         o_orderdate, o_orderpriority, 1 FROM orders WHERE o_orderkey % 10 = 2
       |  UNION ALL
       |  SELECT 'U', o_orderkey, o_custkey, 'Y' AS o_orderstatus,
       |         o_totalprice + 2.0, o_orderdate, o_orderpriority, 2
       |  FROM orders WHERE o_orderkey % 20 = 0
       |  UNION ALL
       |  SELECT 'D', o_orderkey + 10000000, o_custkey, o_orderstatus, o_totalprice,
       |         o_orderdate, o_orderpriority, 2 FROM orders WHERE o_orderkey % 20 = 2
       |)""".stripMargin

  /** Column-patch change fixture (NULL = unchanged): file 1 patches
    * ONLY o_orderstatus on keys ≡0 (mod 10); file 2 patches ONLY
    * o_totalprice (+5.0) on keys ≡0 (mod 20) and deletes keys ≡1
    * (mod 10). Keys ≡0 (mod 20) therefore accumulate BOTH patches —
    * the composition whole-row latest-wins cannot express. */
  def patchChanges(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir, "orders")
    def nul(t: String) = lit(null).cast(t)
    val f1 = o.where(col("o_orderkey") % 10 === 0).select(
      lit(Op.Update).as(Op.column), col("o_orderkey"),
      nul("bigint").as("o_custkey"), lit("P1").as("o_orderstatus"),
      nul("double").as("o_totalprice"), nul("timestamp").as("o_orderdate"),
      nul("string").as("o_orderpriority"), lit(1L).as(Merge.FileSeq))
    val f2a = o.where(col("o_orderkey") % 20 === 0).select(
      lit(Op.Update).as(Op.column), col("o_orderkey"),
      nul("bigint").as("o_custkey"), nul("string").as("o_orderstatus"),
      (col("o_totalprice") + 5.0).as("o_totalprice"),
      nul("timestamp").as("o_orderdate"),
      nul("string").as("o_orderpriority"), lit(2L).as(Merge.FileSeq))
    val f2b = o.where(col("o_orderkey") % 10 === 1).select(
      lit(Op.Delete).as(Op.column), col("o_orderkey"),
      nul("bigint").as("o_custkey"), nul("string").as("o_orderstatus"),
      nul("double").as("o_totalprice"), nul("timestamp").as("o_orderdate"),
      nul("string").as("o_orderpriority"), lit(2L).as(Merge.FileSeq))
    f1.unionByName(f2a).unionByName(f2b)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Flagship: full latest-wins merge (W1+U1+W2+P4-P6).
    "cdc_merge" -> ((s, dir) =>
      Merge.mergeCdc(target(s, dir), changes(s, dir), Seq("o_orderkey"), Nil)),

    // Per-file merge impact report — the observability row a CDC
    // operator reads after every batch: op counts, how many change
    // rows hit keys the target already holds vs new keys, and the net
    // row delta the merge will apply (inserts on new keys minus
    // deletes on existing ones). One semi-join-shaped left probe of
    // the (distinct) target key set + one partial agg per file.
    "cdc_merge_stats" -> ((s, dir) => {
      val tgtKeys = target(s, dir).select(col("o_orderkey")).distinct()
        .withColumn("__known", lit(true))
      changes(s, dir)
        .join(tgtKeys, Seq("o_orderkey"), "left")
        .groupBy(col(Merge.FileSeq))
        .agg(
          sum(when(col(Op.column) === Op.Insert, 1L).otherwise(0L)).as("n_inserts"),
          sum(when(col(Op.column) === Op.Update, 1L).otherwise(0L)).as("n_updates"),
          sum(when(col(Op.column) === Op.Delete, 1L).otherwise(0L)).as("n_deletes"),
          sum(when(col("__known").isNull, 1L).otherwise(0L)).as("n_new_keys"),
          (sum(when(col(Op.column) === Op.Insert && col("__known").isNull, 1L)
            .otherwise(0L)) -
            sum(when(col(Op.column) === Op.Delete && col("__known").isNotNull, 1L)
              .otherwise(0L))).as("net_row_delta"))
    }),

    // MOR sidecar observability (r10): per merge commit, the physical
    // ledger a maintenance scheduler reads — appended winners and
    // outstanding equality-delete keys. Reads the table's ACTUAL
    // deletes_eq/data dirs, so the oracle (which re-derives both counts
    // from the change fixture alone) pins the sidecar CONTENT of the
    // new equality-delete format against an independent derivation:
    // eq keys per commit = the batch's distinct keys, appended = its
    // non-delete per-key winners. Growth of n_eq_keys between compacts
    // is exactly the read-side anti-join cost — the number this
    // format's ops page watches.
    "cdc_mor_sidecar_stats" -> ((s, dir) => {
      val base = morFixture(s, dir)
      val eq = s.read.option("basePath", s"$base/deletes_eq")
        .parquet(s"$base/deletes_eq/batch=1", s"$base/deletes_eq/batch=2")
        .groupBy(col("batch").cast("long").as("batch"))
        .agg(count(lit(1)).as("n_eq_keys"))
      val app = s.read.option("basePath", s"$base/data")
        .parquet(s"$base/data/batch=1", s"$base/data/batch=2")
        .groupBy(col("batch").cast("long").as("batch"))
        .agg(count(lit(1)).as("n_appended"))
      eq.join(app, Seq("batch"), "full_outer")
        .select(col("batch"), coalesce(col("n_eq_keys"), lit(0L)).as("n_eq_keys"),
          coalesce(col("n_appended"), lit(0L)).as("n_appended"))
    }),

    // Column-patch merge (NULL = unchanged): per-column IGNORE-NULLS
    // folds compose file-1's status patch with file-2's price patch on
    // the same key — see [[graft.cdc.Merge.patchMerge]].
    "cdc_patch_merge" -> ((s, dir) =>
      Merge.patchMerge(target(s, dir), patchChanges(s, dir),
        Seq("o_orderkey"), Nil)),

    // P3: insert-only path (no-PK / first-load semantics).
    "cdc_insert_only" -> ((s, dir) =>
      Merge.insertOnly(changes(s, dir)).drop(Merge.FileSeq)),

    // W1: batch sequencing — rownum per key in commit order.
    "cdc_sequence" -> ((s, dir) =>
      Merge.sequenceBatch(changes(s, dir), Seq("o_orderkey"), Nil)
        .select(col("o_orderkey"), col(Merge.FileSeq), col(Op.column),
          col(Merge.RowNum).cast("long").as(Merge.RowNum))),

    // J1+A1: distinct target keys impacted by the batch (the key-level
    // content of the reference's impacted-file join).
    "cdc_impacted_keys" -> ((s, dir) =>
      target(s, dir).join(changes(s, dir).select("o_orderkey").distinct(),
        Seq("o_orderkey"), "left_semi").select("o_orderkey")),

    // Merge-maintained aggregate (see [[graft.ops.IncrementalAgg]]): the
    // per-customer rollup refreshed by recomputing ONLY groups the batch
    // touched, spliced into the pre-merge aggregate state. The oracle is
    // the FULL recompute over the merged table — so a hash match proves
    // incremental maintenance ≡ recompute-from-scratch on this fixture.
    "cdc_incr_agg" -> ((s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      val tgt = target(s, dir)
      val chg = changes(s, dir)
      val merged = Merge.mergeCdc(tgt, chg, Seq("o_orderkey"), Nil)
      val aggs = Seq(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).cast("double").as("total_price"))
      val prevAgg = tgt.groupBy("o_custkey").agg(aggs.head, aggs.tail: _*)
      // groups that can change: owners of updated/deleted rows (old side)
      // plus receivers of inserted/updated rows (change side)
      val changedGroups = tgt
        .join(chg.select("o_orderkey").distinct(), Seq("o_orderkey"), "left_semi")
        .select("o_custkey")
        .unionByName(chg.select("o_custkey"))
      graft.ops.IncrementalAgg.refresh(merged, prevAgg, changedGroups,
        Seq("o_custkey"), aggs)
    }),

    // Merge-maintained JOIN view (orders ⋈ customer, order-keyed): evict
    // the batch's keys from the previous view, recompute exactly those
    // keys from the merged fact joined to the dim, splice — see
    // [[graft.ops.IncrementalJoin]]; batch-proportional, never a full
    // re-join. Must equal the from-scratch join over the merged fact
    // (the oracle's formulation).
    "cdc_incr_join" -> ((s, dir) => {
      val tgt = target(s, dir)
      val chg = changes(s, dir)
      val dim = Tables(s, dir, "customer")
        .select(col("c_custkey").as("o_custkey"),
          col("c_mktsegment"), col("c_acctbal"))
      val factCols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice")
      val prevView = tgt.select(factCols.head, factCols.tail: _*)
        .join(dim, Seq("o_custkey"), "left")
      val merged = Merge.mergeCdc(tgt, chg, Seq("o_orderkey"), Nil)
      graft.ops.IncrementalJoin.refresh(
        merged.select(factCols.head, factCols.tail: _*),
        prevView, chg.select("o_orderkey"), Seq("o_orderkey"),
        dim, Seq("o_custkey"), "left")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
          "c_mktsegment", "c_acctbal")
    }),

    // Conditional MERGE — the `MERGE … WHEN` clause surface: deletes and
    // inserts apply as usual, but updates are POLICY-GATED by the
    // matched pair ("finalized 'F' orders are immutable" — late CDC
    // updates against them keep the target row). The batch folds to one
    // winner per key first, so the guard sees the batch's final image
    // ([[graft.cdc.Merge.mergeConditional]] — one PK-hash exchange).
    "cdc_merge_conditional" -> ((s, dir) =>
      Merge.mergeConditional(target(s, dir), changes(s, dir),
        Seq("o_orderkey"), Nil,
        updateWhen = col("t.o_orderstatus") =!= "F")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
          "o_orderdate", "o_orderpriority")),

    // The conditional clause through the MERGE-ON-READ format — format
    // choice must not change guard semantics (cdc_merge_conditional's
    // oracle, verbatim): MorTable.merge evaluates the matched (t, c)
    // pair against the live view (the one documented keyed target probe
    // of the MOR commit path) and a rejected winner leaves NEITHER a
    // data row NOR an equality entry, so the target row stays live.
    "cdc_merge_conditional_mor" -> ((s, dir) => {
      val base = QueryTmp.dir("mor_cond") + "/t"
      graft.io.MorTable.init(s, target(s, dir), base)
      graft.io.MorTable.merge(s, changes(s, dir), base, Seq("o_orderkey"),
        updateWhen = Some(col("t.o_orderstatus") =!= "F"))
      graft.io.MorTable.read(s, base)
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
          "o_orderdate", "o_orderpriority")
    }),

    // The expectation suite AGAINST THE LAKE — run the dq_orders_suite
    // rules on the post-ingest merged table instead of the pristine
    // snapshot: the update feed writes statuses ('X'/'Y') outside the
    // O/F contract, and the post-ingest audit is where that surfaces.
    // Deliveries ride [[graft.io.CdcPipeline.mergeTagged]] (the same
    // machinery as every lake write); the suite is one scan/agg pass
    // plus the uniqueness check ([[graft.ops.Quality.suite]]).
    "dq_suite_after_ingest" -> ((s, dir) => {
      import graft.ops.Quality
      // The ingested lake (snapshot + two CDC deliveries through the
      // standard mergeTagged machinery) is the ONE-TIME fixture, cached
      // per JVM; the TIMED body is the audit pass — the operation a
      // data-quality scheduler actually re-runs against a maintained
      // lake. Ingest itself is bench-measured by the cdc_* lifecycle
      // queries.
      val lake = QueryTmp.cached(s"dq_ingest:$dir") { base =>
        val lk = s"$base/orders"
        val cfg = graft.cdc.TableConfig(Seq("o_orderkey"), Nil, active = true)
        def tag(df: DataFrame, name: String) = df
          .withColumn(graft.io.CdcPipeline.SrcFile, lit(name))
          .withColumn(graft.io.CdcPipeline.RowIdx, lit(0L))
        graft.io.CdcPipeline.mergeTagged(s,
          tag(target(s, dir), "20260101-000000"), lk, cfg)
        val chg = changes(s, dir)
        Seq(1L, 2L).foreach { i =>
          graft.io.CdcPipeline.mergeTagged(s,
            tag(chg.where(col(Merge.FileSeq) === i).drop(Merge.FileSeq),
              f"2026010${i + 1}%d-000000"), lk, cfg)
        }
      } + "/orders"
      Quality.suite(s.read.parquet(lake),
        Seq(Quality.notNull("o_custkey"),
          Quality.inRange("o_totalprice", 0.0, 400000.0),
          Quality.inSet("o_orderstatus", Seq("O", "F")),
          Quality.matches("o_orderpriority", "^[1-3]-")),
        uniqueKeys = Seq(Seq("o_orderkey")))
    }),

    // The PERSISTED join view, maintained through streaming deliveries:
    // initial snapshot then the two change files, each delivered via
    // [[graft.streaming.JoinViewStream.ingestBatch]] — fact lake merge +
    // the view's own synthesized CDC batch through the same CoW
    // machinery. Reading the view table back must equal the from-scratch
    // join over the merged fact (the cdc_incr_join oracle, verbatim).
    "cdc_incr_join_after_ingest" -> ((s, dir) => {
      import graft.streaming.JoinViewStream
      val factCfg = graft.cdc.TableConfig(Seq("o_orderkey"), Nil, active = true)
      val viewCfg = graft.cdc.TableConfig(Seq("o_orderkey"), Nil, active = true)
      val dim = Tables(s, dir, "customer")
        .select(col("c_custkey").as("o_custkey"),
          col("c_mktsegment"), col("c_acctbal"))
      // Initial load = plain overwrites (the reference's C3 semantics —
      // production never replays the snapshot through the merge), for
      // BOTH the fact lake and the view's from-scratch join — the
      // ONE-TIME fixture, cached per JVM. The TIMED body is the
      // steady-state op: the two streaming deliveries (fact merge + the
      // view's synthesized CDC merge) plus the view read-back.
      // Re-delivering the same change files converges under latest-wins,
      // so every run lands the same oracle-checked state.
      val base = QueryTmp.cached(s"jv_ingest:$dir") { b =>
        val snap = target(s, dir)
        snap.write.mode("overwrite").parquet(s"$b/fact")
        snap.drop(graft.cdc.Op.column).join(dim, Seq("o_custkey"), "left")
          .withColumn(graft.cdc.Op.column, lit(graft.cdc.Op.Insert))
          .write.mode("overwrite").parquet(s"$b/view")
      }
      val factPath = s"$base/fact"
      val viewPath = s"$base/view"
      def tag(df: DataFrame, name: String) = df
        .withColumn(graft.io.CdcPipeline.SrcFile, lit(name))
        .withColumn(graft.io.CdcPipeline.RowIdx, lit(0L))
      def deliver(b: DataFrame, name: String, id: Long): Unit =
        JoinViewStream.ingestBatch(tag(b, name), factPath, viewPath, dim,
          Seq("o_orderkey"), Seq("o_custkey"), factCfg, viewCfg, id)
      val chg = changes(s, dir)
      deliver(chg.where(col(Merge.FileSeq) === 1L).drop(Merge.FileSeq),
        "20260102-000000", 1L)
      deliver(chg.where(col(Merge.FileSeq) === 2L).drop(Merge.FileSeq),
        "20260103-000000", 2L)
      s.read.parquet(viewPath)
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
          "c_mktsegment", "c_acctbal")
    }),

    // SCD Type-2 history: every version of every key with its validity
    // interval — deletes close intervals without emitting rows (see
    // [[graft.cdc.Scd2]]). Same single PK-hash exchange as the merge.
    "cdc_scd2" -> ((s, dir) =>
      Scd2.history(target(s, dir), changes(s, dir), Seq("o_orderkey"), Nil)
        .select(col("o_orderkey"), col(Op.column), col("o_orderstatus"),
          col("o_totalprice"), col("version"), col("valid_from_seq"),
          col("valid_to_seq"), col("is_current"))),

    // Temporal (AS OF) join against the SCD2 dimension: every key
    // probed at every batch instant joins to the version whose validity
    // interval covers it — the "join each fact to the dimension row
    // valid at fact time" warehouse idiom, generalizing the fixed-seq
    // asOf to per-row instants. The key equi-join carries the shuffle;
    // the interval predicate filters per pair (at scale: interval
    // min/max file skipping via the stats index on the history table).
    // A probe before the key existed, or at a batch where it was
    // deleted, keeps the left row with NULL attributes.
    "cdc_scd2_temporal_join" -> ((s, dir) => {
      val hist = Scd2.history(target(s, dir), changes(s, dir),
          Seq("o_orderkey"), Nil)
        .select(col("o_orderkey").as("__hk"), col("o_orderstatus"),
          col("o_totalprice"), col("version"),
          col("valid_from_seq"), col("valid_to_seq"))
      val probes = hist.select(col("__hk").as("o_orderkey")).distinct()
        .select(col("o_orderkey"),
          explode(expr("sequence(0L, 2L)")).as("probe_seq"))
      probes.join(hist,
          probes("o_orderkey") === hist("__hk") &&
            col("valid_from_seq") <= col("probe_seq") &&
            (col("valid_to_seq").isNull ||
              col("valid_to_seq") > col("probe_seq")), "left")
        .select(col("o_orderkey"), col("probe_seq"), col("version"),
          col("o_orderstatus"), col("o_totalprice"))
    }),

    // Time travel over the SCD2 history: table state as of the end of
    // batch 1 (before file 2's updates/deletes landed) — a pure interval
    // filter, no window, no join (see [[graft.cdc.Scd2.asOf]]).
    "cdc_scd2_asof" -> ((s, dir) =>
      Scd2.asOf(
        Scd2.history(target(s, dir), changes(s, dir), Seq("o_orderkey"), Nil)
          .select(col("o_orderkey"), col(Op.column), col("o_orderstatus"),
            col("o_totalprice"), col("version"), col("valid_from_seq"),
            col("valid_to_seq"), col("is_current")),
        seq = 1L)),

    // SCD2 history retention (row-level VACUUM): expire versions closed
    // at or before seq 1; time travel stays exact from the cutoff on
    // (see [[graft.cdc.Scd2.prune]] — pinned against unpruned asOf in
    // Scd2Spec, row-identity pinned here).
    "cdc_scd2_pruned" -> ((s, dir) =>
      Scd2.prune(
        Scd2.history(target(s, dir), changes(s, dir), Seq("o_orderkey"), Nil)
          .select(col("o_orderkey"), col(Op.column), col("o_orderstatus"),
            col("o_totalprice"), col("version"), col("valid_from_seq"),
            col("valid_to_seq"), col("is_current")),
        cutoffSeq = 1L)),

    // Snapshot diff: what did the batch do — added/removed/changed keys
    // between the pre-merge target and the merged result (see
    // [[graft.cdc.SnapshotDiff]]). Unchanged keys never leave the join.
    "cdc_snapshot_diff" -> ((s, dir) => {
      val cols = Seq("o_orderkey", "o_orderstatus", "o_totalprice")
      val before = target(s, dir).select(cols.map(col): _*)
      val after = Merge.mergeCdc(target(s, dir), changes(s, dir),
        Seq("o_orderkey"), Nil).select(cols.map(col): _*)
      SnapshotDiff.diff(before, after, Seq("o_orderkey"))
    }),

    // Change-data-feed: per-operation pre/post images over the per-key
    // commit order (see [[graft.cdc.ChangeFeed]]) — same single PK-hash
    // exchange as the merge.
    "cdc_change_feed" -> ((s, dir) =>
      ChangeFeed.feed(target(s, dir), changes(s, dir), Seq("o_orderkey"),
        Seq("o_orderstatus", "o_totalprice"))),

    // Time travel from the feed ALONE (the audit log restores any
    // historical state — no original change files): state as of commit
    // 1, an interior prefix where file 2's updates/deletes have not
    // happened yet. Oracle = the merge of the change PREFIX recomputed
    // from scratch — the prefix generalization of replay ≡ merge.
    "cdc_time_travel" -> ((s, dir) => {
      val f = ChangeFeed.feed(target(s, dir), changes(s, dir), Seq("o_orderkey"),
        Seq("o_orderstatus", "o_totalprice"), keepFileSeq = true)
      ChangeFeed.stateAsOf(target(s, dir), f, Seq("o_orderkey"),
        Seq("o_orderstatus", "o_totalprice"), seq = 1L)
    }),

    // Merge-on-read dual of cdc_merge: the SAME fixture driven through
    // [[graft.io.MorTable]] as two append-only commits (file 1, then
    // file 2) — winners appended, superseded positions recorded in the
    // delete sidecar, target never rewritten. Read-time anti-join
    // reconstructs exactly the copy-on-write result: the oracle is
    // cdc_merge's verbatim, so a hash match proves MOR ≡ CoW semantics
    // across commits (cross-file latest-wins, delete-of-insert).
    // cdc_mor_merge / _asof / _diff are pure READS of the same commit
    // history → one cached on-disk build (the statsPruneFixture
    // pattern); cdc_mor_compact mutates history (vacuum re-baselines
    // the sidecar) and builds its own copy.
    "cdc_mor_merge" -> ((s, dir) =>
      graft.io.MorTable.read(s, morFixture(s, dir))
        .select(col(Op.column) +: orderCols.map(col): _*)),

    // MOR lifecycle closure: compaction (rewrite-as-commit of files past
    // the dead-fraction threshold) then vacuum (physical GC of fully-dead
    // files + sidecar re-baseline) must leave the table bit-identical —
    // same oracle as cdc_merge again.
    "cdc_mor_compact" -> ((s, dir) => {
      val base = QueryTmp.dir("mor_qc") + "/t"
      graft.io.MorTable.init(s, target(s, dir), base)
      val chg = changes(s, dir)
      graft.io.MorTable.merge(s, chg.where(col(Merge.FileSeq) === 1L), base, Seq("o_orderkey"))
      graft.io.MorTable.merge(s, chg.where(col(Merge.FileSeq) === 2L), base, Seq("o_orderkey"))
      graft.io.MorTable.compact(s, base, minDeadFraction = 0.05)
      graft.io.MorTable.vacuum(s, base)
      graft.io.MorTable.read(s, base).select(col(Op.column) +: orderCols.map(col): _*)
    }),

    // MOR time travel: history IS the commit prefix (append-only
    // commits), so state as of commit 1 — after file 1's changes, before
    // file 2's — is a prefix read with the same anti-join, no log replay.
    // Oracle = the merge of the change PREFIX recomputed from scratch
    // (cdc_time_travel's contract, through the MOR path).
    "cdc_mor_asof" -> ((s, dir) =>
      graft.io.MorTable.readAsOf(s, morFixture(s, dir), batch = 1L)
        .select(col(Op.column) +: orderCols.map(col): _*)),

    // MOR change feed from commit structure alone (no sidecar log):
    // pre-images = live rows at positions commit 2's delete sidecar
    // superseded, post-images = its appended winners, value-diff
    // filtered — see [[graft.io.MorTable.commitDiff]]. Oracle = the
    // full-outer diff of the two prefix-merge states.
    "cdc_mor_diff" -> ((s, dir) =>
      graft.io.MorTable.commitDiff(s, morFixture(s, dir), batch = 2L,
        Seq("o_orderkey"), Seq("o_orderstatus", "o_totalprice"))),

    // U1 schema evolution: changes carry a new column; merged target rows
    // null-fill it (reference CHANGELOG 1.1.0 behavior).
    "cdc_schema_evolution" -> ((s, dir) => {
      val evolved = changes(s, dir).withColumn("o_channel",
        when(col("o_orderkey") % 2 === 0, lit("online")).otherwise(lit("retail")))
      Merge.mergeCdc(target(s, dir), evolved, Seq("o_orderkey"), Nil)
        .select("Op", "o_orderkey", "o_channel")
    })
  )

  val oracles: Map[String, String] = Map(
    "cdc_merge" ->
      s"""$fixtureSql,
         | unioned AS (
         |  SELECT * FROM changes UNION ALL SELECT * FROM target
         |), ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY o_orderkey ORDER BY file_seq DESC) AS rn
         |  FROM unioned
         |)
         |SELECT "Op", $orderColsSql FROM ranked WHERE rn = 1 AND "Op" <> 'D'""".stripMargin,

    "cdc_insert_only" ->
      s"""$fixtureSql SELECT "Op", $orderColsSql FROM changes WHERE "Op" = 'I'""",

    // Merge-stats mirror: same distinct-key left probe + per-file agg.
    // Sidecar-stats mirror: both counts re-derived from the change
    // fixture alone — distinct batch keys (eq sidecar) and non-delete
    // winners (appended) per file.
    "cdc_mor_sidecar_stats" ->
      """SELECT CAST(1 AS BIGINT) AS batch,
        |  (SELECT count(*) FROM orders WHERE o_orderkey % 10 IN (0, 1, 2))::BIGINT AS n_eq_keys,
        |  (SELECT count(*) FROM orders WHERE o_orderkey % 10 IN (0, 2))::BIGINT AS n_appended
        |UNION ALL
        |SELECT CAST(2 AS BIGINT),
        |  (SELECT count(*) FROM orders WHERE o_orderkey % 20 IN (0, 2))::BIGINT,
        |  (SELECT count(*) FROM orders WHERE o_orderkey % 20 = 0)::BIGINT""".stripMargin,

    "cdc_merge_stats" ->
      s"""$fixtureSql,
         |tk AS (SELECT DISTINCT o_orderkey, true AS known FROM target)
         |SELECT c.file_seq,
         |  sum(CASE WHEN c."Op" = 'I' THEN 1 ELSE 0 END)::BIGINT AS n_inserts,
         |  sum(CASE WHEN c."Op" = 'U' THEN 1 ELSE 0 END)::BIGINT AS n_updates,
         |  sum(CASE WHEN c."Op" = 'D' THEN 1 ELSE 0 END)::BIGINT AS n_deletes,
         |  sum(CASE WHEN tk.known IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_new_keys,
         |  (sum(CASE WHEN c."Op" = 'I' AND tk.known IS NULL THEN 1 ELSE 0 END)
         |   - sum(CASE WHEN c."Op" = 'D' AND tk.known IS NOT NULL THEN 1 ELSE 0 END))::BIGINT
         |    AS net_row_delta
         |FROM changes c LEFT JOIN tk ON c.o_orderkey = tk.o_orderkey
         |GROUP BY c.file_seq""".stripMargin,

    // Patch-merge mirror: the same union shape, per-column IGNORE-NULLS
    // running last_value folds, survivor by (file_seq, rownum) DESC.
    "cdc_patch_merge" ->
      s"""WITH target AS (
         |  SELECT 'I' AS "Op", $orderColsSql,
         |         CAST(0 AS BIGINT) AS file_seq, CAST(1 AS BIGINT) AS rownum
         |  FROM orders
         |), changes AS (
         |  SELECT 'U' AS "Op", o_orderkey, NULL::BIGINT AS o_custkey,
         |         'P1' AS o_orderstatus, NULL::DOUBLE AS o_totalprice,
         |         NULL::TIMESTAMP AS o_orderdate, NULL::VARCHAR AS o_orderpriority,
         |         CAST(1 AS BIGINT) AS file_seq, CAST(1 AS BIGINT) AS rownum
         |  FROM orders WHERE o_orderkey % 10 = 0
         |  UNION ALL
         |  SELECT 'U', o_orderkey, NULL, NULL, o_totalprice + 5.0, NULL, NULL, 2, 1
         |  FROM orders WHERE o_orderkey % 20 = 0
         |  UNION ALL
         |  SELECT 'D', o_orderkey, NULL, NULL, NULL, NULL, NULL, 2, 1
         |  FROM orders WHERE o_orderkey % 10 = 1
         |), u AS (
         |  SELECT * FROM changes UNION ALL SELECT * FROM target
         |), f AS (
         |  SELECT "Op", o_orderkey,
         |    ${orderCols.drop(1).map(c =>
              s"""last_value($c IGNORE NULLS) OVER wfold AS $c""").mkString(",\n    ")},
         |    row_number() OVER (PARTITION BY o_orderkey
         |      ORDER BY file_seq DESC, rownum DESC) AS rn
         |  FROM u
         |  WINDOW wfold AS (PARTITION BY o_orderkey ORDER BY file_seq, rownum
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |)
         |SELECT "Op", $orderColsSql FROM f WHERE rn = 1 AND "Op" <> 'D'""".stripMargin,

    // MOR reads must reconstruct exactly the CoW merge — cdc_merge's
    // oracle verbatim.
    "cdc_mor_merge" ->
      s"""$fixtureSql,
         | unioned AS (
         |  SELECT * FROM changes UNION ALL SELECT * FROM target
         |), ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY o_orderkey ORDER BY file_seq DESC) AS rn
         |  FROM unioned
         |)
         |SELECT "Op", $orderColsSql FROM ranked WHERE rn = 1 AND "Op" <> 'D'""".stripMargin,

    "cdc_mor_compact" ->
      s"""$fixtureSql,
         | unioned AS (
         |  SELECT * FROM changes UNION ALL SELECT * FROM target
         |), ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY o_orderkey ORDER BY file_seq DESC) AS rn
         |  FROM unioned
         |)
         |SELECT "Op", $orderColsSql FROM ranked WHERE rn = 1 AND "Op" <> 'D'""".stripMargin,

    "cdc_time_travel" ->
      s"""$fixtureSql,
         | unioned AS (
         |  SELECT * FROM changes WHERE file_seq <= 1 UNION ALL SELECT * FROM target
         |), ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY o_orderkey ORDER BY file_seq DESC) AS rn
         |  FROM unioned
         |)
         |SELECT o_orderkey, o_orderstatus, o_totalprice
         |FROM ranked WHERE rn = 1 AND "Op" <> 'D'""".stripMargin,

    "cdc_mor_asof" ->
      s"""$fixtureSql,
         | unioned AS (
         |  SELECT * FROM changes WHERE file_seq <= 1 UNION ALL SELECT * FROM target
         |), ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY o_orderkey ORDER BY file_seq DESC) AS rn
         |  FROM unioned
         |)
         |SELECT "Op", $orderColsSql FROM ranked WHERE rn = 1 AND "Op" <> 'D'""".stripMargin,

    "cdc_mor_diff" ->
      s"""$fixtureSql,
         | u1 AS (SELECT * FROM changes WHERE file_seq <= 1 UNION ALL SELECT * FROM target),
         | r1 AS (SELECT *, row_number() OVER (PARTITION BY o_orderkey ORDER BY file_seq DESC) AS rn FROM u1),
         | s1 AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM r1 WHERE rn = 1 AND "Op" <> 'D'),
         | u2 AS (SELECT * FROM changes UNION ALL SELECT * FROM target),
         | r2 AS (SELECT *, row_number() OVER (PARTITION BY o_orderkey ORDER BY file_seq DESC) AS rn FROM u2),
         | s2 AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM r2 WHERE rn = 1 AND "Op" <> 'D'),
         | j AS (
         |  SELECT coalesce(s1.o_orderkey, s2.o_orderkey) AS o_orderkey,
         |         s1.o_orderkey IS NOT NULL AS has_pre,
         |         s2.o_orderkey IS NOT NULL AS has_post,
         |         s1.o_orderstatus AS pre_o_orderstatus,
         |         s2.o_orderstatus AS post_o_orderstatus,
         |         s1.o_totalprice AS pre_o_totalprice,
         |         s2.o_totalprice AS post_o_totalprice
         |  FROM s1 FULL OUTER JOIN s2 ON s1.o_orderkey = s2.o_orderkey)
         |SELECT o_orderkey,
         |  CASE WHEN NOT has_pre THEN 'I' WHEN NOT has_post THEN 'D' ELSE 'U' END AS change_op,
         |  pre_o_orderstatus, post_o_orderstatus, pre_o_totalprice, post_o_totalprice
         |FROM j
         |WHERE NOT has_pre OR NOT has_post
         |   OR pre_o_orderstatus IS DISTINCT FROM post_o_orderstatus
         |   OR pre_o_totalprice IS DISTINCT FROM post_o_totalprice""".stripMargin,

    "cdc_sequence" ->
      s"""$fixtureSql
         |SELECT o_orderkey, file_seq, "Op",
         |       row_number() OVER (PARTITION BY o_orderkey ORDER BY file_seq) AS rownum
         |FROM changes""".stripMargin,

    "cdc_impacted_keys" ->
      s"""$fixtureSql
         |SELECT o_orderkey FROM target
         |WHERE o_orderkey IN (SELECT o_orderkey FROM changes)""".stripMargin,

    "cdc_incr_agg" ->
      s"""$fixtureSql,
         | unioned AS (
         |  SELECT * FROM changes UNION ALL SELECT * FROM target
         |), ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY o_orderkey ORDER BY file_seq DESC) AS rn
         |  FROM unioned
         |), merged AS (
         |  SELECT $orderColsSql FROM ranked WHERE rn = 1 AND "Op" <> 'D'
         |)
         |SELECT o_custkey, count(*) AS n_orders,
         |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
         |FROM merged GROUP BY o_custkey""".stripMargin,

    // Incremental-join mirror: the maintained view must equal the
    // from-scratch join over the merged fact.
    "cdc_incr_join" ->
      s"""$fixtureSql,
         | unioned AS (
         |  SELECT * FROM changes UNION ALL SELECT * FROM target
         |), ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY o_orderkey ORDER BY file_seq DESC) AS rn
         |  FROM unioned
         |), merged AS (
         |  SELECT $orderColsSql FROM ranked WHERE rn = 1 AND "Op" <> 'D'
         |)
         |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
         |       c_mktsegment, c_acctbal
         |FROM merged LEFT JOIN customer ON o_custkey = c_custkey""".stripMargin,

    // Conditional-merge mirror: the same batch-winner fold, then the
    // clause routing spelled out over a FULL OUTER JOIN (keys are
    // non-null in the fixture, so key nullity is the presence marker).
    "cdc_merge_conditional" ->
      s"""$fixtureSql,
         | win AS (
         |  SELECT * FROM (
         |    SELECT *, row_number() OVER (PARTITION BY o_orderkey ORDER BY file_seq DESC) AS rn
         |    FROM changes) WHERE rn = 1
         |), j AS (
         |  SELECT
         |    t.o_orderkey IS NOT NULL AND c.o_orderkey IS NOT NULL AS matched,
         |    t.o_orderkey IS NULL AS only_c, c.o_orderkey IS NULL AS only_t,
         |    c."Op" AS c_op,
         |    t.o_orderkey AS t1, t.o_custkey AS t2, t.o_orderstatus AS t3,
         |    t.o_totalprice AS t4, t.o_orderdate AS t5, t.o_orderpriority AS t6,
         |    c.o_orderkey AS c1, c.o_custkey AS c2, c.o_orderstatus AS c3,
         |    c.o_totalprice AS c4, c.o_orderdate AS c5, c.o_orderpriority AS c6
         |  FROM target t FULL OUTER JOIN win c ON t.o_orderkey = c.o_orderkey
         |), r AS (
         |  SELECT *,
         |    (matched AND c_op <> 'D' AND t3 <> 'F') OR (only_c AND c_op <> 'D') AS take_c,
         |    only_t OR (matched AND NOT (c_op = 'D') AND NOT (c_op <> 'D' AND t3 <> 'F')) AS keep_t
         |  FROM j)
         |SELECT
         |  CASE WHEN take_c THEN c1 ELSE t1 END AS o_orderkey,
         |  CASE WHEN take_c THEN c2 ELSE t2 END AS o_custkey,
         |  CASE WHEN take_c THEN c3 ELSE t3 END AS o_orderstatus,
         |  CASE WHEN take_c THEN c4 ELSE t4 END AS o_totalprice,
         |  CASE WHEN take_c THEN c5 ELSE t5 END AS o_orderdate,
         |  CASE WHEN take_c THEN c6 ELSE t6 END AS o_orderpriority
         |FROM r WHERE take_c OR keep_t""".stripMargin,

    // the MOR twin answers from the same merged state: the guard clause
    // is format-independent, so the oracle is cdc_merge_conditional's
    // verbatim
    "cdc_merge_conditional_mor" ->
      s"""$fixtureSql,
         | win AS (
         |  SELECT * FROM (
         |    SELECT *, row_number() OVER (PARTITION BY o_orderkey ORDER BY file_seq DESC) AS rn
         |    FROM changes) WHERE rn = 1
         |), j AS (
         |  SELECT
         |    t.o_orderkey IS NOT NULL AND c.o_orderkey IS NOT NULL AS matched,
         |    t.o_orderkey IS NULL AS only_c, c.o_orderkey IS NULL AS only_t,
         |    c."Op" AS c_op,
         |    t.o_orderkey AS t1, t.o_custkey AS t2, t.o_orderstatus AS t3,
         |    t.o_totalprice AS t4, t.o_orderdate AS t5, t.o_orderpriority AS t6,
         |    c.o_orderkey AS c1, c.o_custkey AS c2, c.o_orderstatus AS c3,
         |    c.o_totalprice AS c4, c.o_orderdate AS c5, c.o_orderpriority AS c6
         |  FROM target t FULL OUTER JOIN win c ON t.o_orderkey = c.o_orderkey
         |), r AS (
         |  SELECT *,
         |    (matched AND c_op <> 'D' AND t3 <> 'F') OR (only_c AND c_op <> 'D') AS take_c,
         |    only_t OR (matched AND NOT (c_op = 'D') AND NOT (c_op <> 'D' AND t3 <> 'F')) AS keep_t
         |  FROM j)
         |SELECT
         |  CASE WHEN take_c THEN c1 ELSE t1 END AS o_orderkey,
         |  CASE WHEN take_c THEN c2 ELSE t2 END AS o_custkey,
         |  CASE WHEN take_c THEN c3 ELSE t3 END AS o_orderstatus,
         |  CASE WHEN take_c THEN c4 ELSE t4 END AS o_totalprice,
         |  CASE WHEN take_c THEN c5 ELSE t5 END AS o_orderdate,
         |  CASE WHEN take_c THEN c6 ELSE t6 END AS o_orderpriority
         |FROM r WHERE take_c OR keep_t""".stripMargin,

    // Post-ingest suite mirror: the dq_orders_suite rules over the
    // merged CTE instead of the snapshot.
    "dq_suite_after_ingest" ->
      s"""$fixtureSql,
         | unioned AS (
         |  SELECT * FROM changes UNION ALL SELECT * FROM target
         |), ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY o_orderkey ORDER BY file_seq DESC) AS rn
         |  FROM unioned
         |), merged AS (
         |  SELECT $orderColsSql FROM ranked WHERE rn = 1 AND "Op" <> 'D'
         |), w AS (
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
         |  FROM merged)
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
         |FROM (SELECT count(*) AS k FROM merged GROUP BY o_orderkey) g""".stripMargin,

    // The streamed/persisted view must converge to the SAME truth.
    "cdc_incr_join_after_ingest" ->
      s"""$fixtureSql,
         | unioned AS (
         |  SELECT * FROM changes UNION ALL SELECT * FROM target
         |), ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY o_orderkey ORDER BY file_seq DESC) AS rn
         |  FROM unioned
         |), merged AS (
         |  SELECT $orderColsSql FROM ranked WHERE rn = 1 AND "Op" <> 'D'
         |)
         |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
         |       c_mktsegment, c_acctbal
         |FROM merged LEFT JOIN customer ON o_custkey = c_custkey""".stripMargin,

    "cdc_scd2" ->
      s"""$fixtureSql,
         | sequenced AS (
         |  SELECT *, row_number() OVER (PARTITION BY o_orderkey ORDER BY file_seq) AS rownum
         |  FROM changes
         |), unioned AS (
         |  SELECT * FROM sequenced
         |  UNION ALL SELECT *, 1 AS rownum FROM target
         |), versioned AS (
         |  SELECT o_orderkey, "Op", o_orderstatus, o_totalprice,
         |    row_number() OVER w AS version,
         |    file_seq AS valid_from_seq,
         |    lead(file_seq) OVER w AS valid_to_seq
         |  FROM unioned
         |  WINDOW w AS (PARTITION BY o_orderkey ORDER BY file_seq, rownum)
         |)
         |SELECT o_orderkey, "Op", o_orderstatus, o_totalprice, version,
         |       valid_from_seq, valid_to_seq, valid_to_seq IS NULL AS is_current
         |FROM versioned WHERE "Op" <> 'D'""".stripMargin,

    "cdc_scd2_temporal_join" ->
      s"""$fixtureSql,
         | sequenced AS (
         |  SELECT *, row_number() OVER (PARTITION BY o_orderkey ORDER BY file_seq) AS rownum
         |  FROM changes
         |), unioned AS (
         |  SELECT * FROM sequenced
         |  UNION ALL SELECT *, 1 AS rownum FROM target
         |), versioned AS (
         |  SELECT o_orderkey, "Op", o_orderstatus, o_totalprice,
         |    row_number() OVER w AS version,
         |    file_seq AS valid_from_seq,
         |    lead(file_seq) OVER w AS valid_to_seq
         |  FROM unioned
         |  WINDOW w AS (PARTITION BY o_orderkey ORDER BY file_seq, rownum)
         |), hist AS (
         |  SELECT * FROM versioned WHERE "Op" <> 'D'
         |), probes AS (
         |  SELECT o_orderkey, unnest(range(0, 3))::BIGINT AS probe_seq
         |  FROM (SELECT DISTINCT o_orderkey FROM hist)
         |)
         |SELECT p.o_orderkey, p.probe_seq, h.version,
         |       h.o_orderstatus, h.o_totalprice
         |FROM probes p LEFT JOIN hist h
         |  ON p.o_orderkey = h.o_orderkey
         | AND h.valid_from_seq <= p.probe_seq
         | AND (h.valid_to_seq IS NULL OR h.valid_to_seq > p.probe_seq)""".stripMargin,

    "cdc_scd2_pruned" ->
      s"""$fixtureSql,
         | sequenced AS (
         |  SELECT *, row_number() OVER (PARTITION BY o_orderkey ORDER BY file_seq) AS rownum
         |  FROM changes
         |), unioned AS (
         |  SELECT * FROM sequenced
         |  UNION ALL SELECT *, 1 AS rownum FROM target
         |), versioned AS (
         |  SELECT o_orderkey, "Op", o_orderstatus, o_totalprice,
         |    row_number() OVER w AS version,
         |    file_seq AS valid_from_seq,
         |    lead(file_seq) OVER w AS valid_to_seq
         |  FROM unioned
         |  WINDOW w AS (PARTITION BY o_orderkey ORDER BY file_seq, rownum)
         |)
         |SELECT o_orderkey, "Op", o_orderstatus, o_totalprice, version,
         |       valid_from_seq, valid_to_seq, valid_to_seq IS NULL AS is_current
         |FROM versioned
         |WHERE "Op" <> 'D' AND (valid_to_seq IS NULL OR valid_to_seq > 1)""".stripMargin,

    "cdc_change_feed" ->
      s"""$fixtureSql,
         | sequenced AS (
         |  SELECT *, row_number() OVER (PARTITION BY o_orderkey ORDER BY file_seq) AS rownum
         |  FROM changes
         |), unioned AS (
         |  SELECT * FROM sequenced
         |  UNION ALL SELECT *, 1 AS rownum FROM target
         |), lagged AS (
         |  SELECT o_orderkey, rownum, file_seq, "Op",
         |    lag("Op") OVER w AS prev_op,
         |    lag(o_orderstatus) OVER w AS prev_status,
         |    lag(o_totalprice) OVER w AS prev_price,
         |    o_orderstatus, o_totalprice
         |  FROM unioned
         |  WINDOW w AS (PARTITION BY o_orderkey ORDER BY file_seq, rownum)
         |)
         |SELECT o_orderkey, rownum::BIGINT AS change_seq, "Op",
         |  CASE WHEN prev_op IS NULL OR prev_op = 'D' THEN NULL
         |       ELSE prev_status END AS o_orderstatus_old,
         |  CASE WHEN "Op" = 'D' THEN NULL ELSE o_orderstatus END AS o_orderstatus_new,
         |  CASE WHEN prev_op IS NULL OR prev_op = 'D' THEN NULL
         |       ELSE prev_price END AS o_totalprice_old,
         |  CASE WHEN "Op" = 'D' THEN NULL ELSE o_totalprice END AS o_totalprice_new
         |FROM lagged WHERE file_seq > 0""".stripMargin,

    "cdc_scd2_asof" ->
      s"""$fixtureSql,
         | sequenced AS (
         |  SELECT *, row_number() OVER (PARTITION BY o_orderkey ORDER BY file_seq) AS rownum
         |  FROM changes
         |), unioned AS (
         |  SELECT * FROM sequenced
         |  UNION ALL SELECT *, 1 AS rownum FROM target
         |), versioned AS (
         |  SELECT o_orderkey, "Op", o_orderstatus, o_totalprice,
         |    file_seq AS valid_from_seq,
         |    lead(file_seq) OVER w AS valid_to_seq
         |  FROM unioned
         |  WINDOW w AS (PARTITION BY o_orderkey ORDER BY file_seq, rownum)
         |)
         |SELECT o_orderkey, "Op", o_orderstatus, o_totalprice
         |FROM versioned
         |WHERE "Op" <> 'D' AND valid_from_seq <= 1
         |  AND (valid_to_seq IS NULL OR valid_to_seq > 1)""".stripMargin,

    "cdc_snapshot_diff" ->
      s"""$fixtureSql,
         | unioned AS (
         |  SELECT * FROM changes UNION ALL SELECT * FROM target
         |), ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY o_orderkey ORDER BY file_seq DESC) AS rn
         |  FROM unioned
         |), merged AS (
         |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM ranked
         |  WHERE rn = 1 AND "Op" <> 'D'
         |), diffed AS (
         |  SELECT COALESCE(b.o_orderkey, a.o_orderkey) AS o_orderkey,
         |    CASE WHEN b.o_orderkey IS NULL THEN 'added'
         |         WHEN a.o_orderkey IS NULL THEN 'removed'
         |         WHEN b.o_orderstatus IS DISTINCT FROM a.o_orderstatus
         |              OR b.o_totalprice IS DISTINCT FROM a.o_totalprice THEN 'changed'
         |    END AS change_type,
         |    b.o_orderstatus AS old_o_orderstatus, a.o_orderstatus AS new_o_orderstatus,
         |    b.o_totalprice AS old_o_totalprice, a.o_totalprice AS new_o_totalprice
         |  FROM target b FULL OUTER JOIN merged a ON b.o_orderkey = a.o_orderkey
         |)
         |SELECT * FROM diffed WHERE change_type IS NOT NULL""".stripMargin,

    "cdc_schema_evolution" ->
      s"""$fixtureSql,
         | evolved AS (
         |  SELECT *, CASE WHEN o_orderkey % 2 = 0 THEN 'online' ELSE 'retail' END AS o_channel
         |  FROM changes
         |), unioned AS (
         |  SELECT * FROM evolved
         |  UNION ALL SELECT *, NULL AS o_channel FROM target
         |), ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY o_orderkey ORDER BY file_seq DESC) AS rn
         |  FROM unioned
         |)
         |SELECT "Op", o_orderkey, o_channel FROM ranked WHERE rn = 1 AND "Op" <> 'D'""".stripMargin
  )
}
