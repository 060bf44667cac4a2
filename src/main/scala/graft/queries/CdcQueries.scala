package graft.queries

import graft.cdc.{Merge, Op}
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

  /** Deterministic two-file change batch with `file_seq`. */
  def changes(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir, "orders")
    def base(op: String, seq: Long) =
      o.withColumn(Op.column, lit(op)).withColumn(Merge.FileSeq, lit(seq))
    val f1u = base(Op.Update, 1L).where(col("o_orderkey") % 10 === 0)
      .withColumn("o_orderstatus", lit("X"))
      .withColumn("o_totalprice", col("o_totalprice") + 1.0)
    val f1d = base(Op.Delete, 1L).where(col("o_orderkey") % 10 === 1)
    val f1i = base(Op.Insert, 1L).where(col("o_orderkey") % 10 === 2)
      .withColumn("o_orderkey", col("o_orderkey") + 10000000L)
    val f2u = base(Op.Update, 2L).where(col("o_orderkey") % 20 === 0)
      .withColumn("o_orderstatus", lit("Y"))
      .withColumn("o_totalprice", col("o_totalprice") + 2.0)
    val f2d = base(Op.Delete, 2L).where(col("o_orderkey") % 20 === 2)
      .withColumn("o_orderkey", col("o_orderkey") + 10000000L)
    f1u.unionByName(f1d).unionByName(f1i).unionByName(f2u).unionByName(f2d)
      .select((Op.column +: orderCols :+ Merge.FileSeq).map(col): _*)
  }

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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Flagship: full latest-wins merge (W1+U1+W2+P4-P6).
    "cdc_merge" -> ((s, dir) =>
      Merge.mergeCdc(target(s, dir), changes(s, dir), Seq("o_orderkey"), Nil)),

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

    "cdc_sequence" ->
      s"""$fixtureSql
         |SELECT o_orderkey, file_seq, "Op",
         |       row_number() OVER (PARTITION BY o_orderkey ORDER BY file_seq) AS rownum
         |FROM changes""".stripMargin,

    "cdc_impacted_keys" ->
      s"""$fixtureSql
         |SELECT o_orderkey FROM target
         |WHERE o_orderkey IN (SELECT o_orderkey FROM changes)""".stripMargin,

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
