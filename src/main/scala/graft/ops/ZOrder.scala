package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering: interleave the bits of two key columns and
  * range-partition + sort by the interleaved value, so rows close in BOTH
  * key dimensions land in the same parquet files. Every participating
  * column's footer min/max then stays narrow per file, and a predicate on
  * EITHER column (or both) prunes files at scan time — the multi-column
  * data-skipping layout that a single-column sort cannot give (sorting by
  * `a` leaves `b`'s per-file ranges as wide as the table).
  *
  * All pure Column bit-math (codegen'd Morton spreading, no UDF); the
  * clustering itself is one `repartitionByRange` (range exchange with a
  * sampled boundary pass) plus a per-partition sort — exactly the cost of
  * an ordinary sorted write.
  */
object ZOrder {

  /** Spread the low 16 bits of `x` onto the even bit positions of a
    * 32-bit value (classic Morton magic-mask cascade). */
  private def spread16(x: Column): Column = {
    val v0 = x.bitwiseAND(lit(0xFFFFL))
    val v1 = v0.bitwiseOR(shiftleft(v0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val v2 = v1.bitwiseOR(shiftleft(v1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val v3 = v2.bitwiseOR(shiftleft(v2, 2)).bitwiseAND(lit(0x33333333L))
    v3.bitwiseOR(shiftleft(v3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton code of two integer columns' low 16 bits (`a` on even
    * bits, `b` on odd). Monotone in the interleaved ordering, exactly
    * reproducible in any engine with integer bit ops. */
  def zValue(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** Cluster `df` into `numPartitions` z-ordered shards on (a, b).
    * `keepZCol` retains the computed z-value column (tests, diagnostics);
    * production writes drop it — the layout, not the value, is the
    * product. */
  def cluster(df: DataFrame, a: String, b: String, numPartitions: Int,
              keepZCol: Option[String] = None): DataFrame = {
    require(numPartitions > 0)
    val zc = keepZCol.getOrElse("__z")
    val out = df.withColumn(zc, zValue(col(a), col(b)))
      .repartitionByRange(numPartitions, col(zc))
      .sortWithinPartitions(zc)
    if (keepZCol.isEmpty) out.drop(zc) else out
  }
}
