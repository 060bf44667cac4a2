package graft.ops

import graft.expressions.BloomExpressions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter-accelerated joins: build a compact membership sketch from
  * the selective side, pre-filter the big side's scan with it, then run
  * the exact join on the survivors.
  *
  * Scale rationale (the reason this exists at 100 TB): a shuffle semi join
  * moves EVERY fact row whose key region hashes to a reducer — even rows
  * that can never match. The bloom probe runs inside the fact table's scan
  * stage (whole-stage codegen, before the Exchange), so shuffle bytes drop
  * by roughly the join selectivity (e.g. 1% of orders qualify → ~99% of
  * lineitem never leaves the scan). The sketch build is one treeAggregate
  * over the dim side (a few MB for millions of keys at 1% fpp), broadcast
  * with the task binary. False positives are removed by the exact join that
  * follows, so semantics are identical to the plain join — the filter only
  * prunes. This mirrors what AQE's runtime bloom filters do for eligible
  * plans, but as an explicit, always-on operator with a tunable fpp.
  */
object BloomJoin {

  /** One-pass bloom build over `keys` (distributed aggregate, driver gets
    * only the merged sketch). */
  def buildFilter(df: DataFrame, keyCol: String, expectedItems: Long,
                  fpp: Double = 0.01): BloomFilter =
    df.stat.bloomFilter(keyCol, expectedItems, fpp)

  /** Exact semi join of `big` against `small`'s keys, with the big side
    * pre-filtered by a bloom sketch of the small side. Output ≡
    * `big.join(small, bigKey === smallKey, "left_semi")`. */
  def bloomSemiJoin(big: DataFrame, bigKey: String, small: DataFrame, smallKey: String,
                    expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val bloom = buildFilter(small, smallKey, expectedItems, fpp)
    val pruned = big.where(BloomExpressions.mightContain(col(bigKey), bloom))
    pruned.join(small.select(col(smallKey).as("__bloom_k")),
      col(bigKey) === col("__bloom_k"), "left_semi")
  }

  /** Same pre-filter ahead of an inner equi-join (the general case: the
    * bloom prunes the big side's shuffle; the join itself is unchanged). */
  def bloomInnerJoin(big: DataFrame, bigKey: String, small: DataFrame, smallKey: String,
                     expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val bloom = buildFilter(small, smallKey, expectedItems, fpp)
    big.where(BloomExpressions.mightContain(col(bigKey), bloom))
      .join(small, col(bigKey) === col(smallKey))
  }
}
