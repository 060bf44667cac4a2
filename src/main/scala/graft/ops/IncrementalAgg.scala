package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Merge-maintained aggregates: keep a keyed aggregate table in lock-step
  * with a CDC-merged fact table WITHOUT rescanning the fact table.
  *
  * After a merge, only groups that owned or received a changed row can
  * have a different aggregate, so the refresh recomputes exactly those
  * groups from the merged target (semi-join pruned scan — with the lake's
  * PK-clustered files the scan prunes to the impacted files) and splices
  * them into the previous aggregate state (anti-join keep). Cost is
  * batch-proportional: |changed groups| drives both sides, never |table|.
  * Groups whose rows were all deleted drop out naturally (no rows → no
  * group in the recompute, dropped from the keep side by the anti-join).
  *
  * Works for ANY aggregate (medians, distincts, …), not just
  * delta-composable ones, because touched groups are recomputed from the
  * merged truth rather than patched with +/- delta math.
  */
object IncrementalAgg {

  /** @param mergedTarget  the fact table AFTER the merge
    * @param prevAgg       the aggregate table from BEFORE the merge
    * @param changedGroups group-key values touched by the batch (old rows'
    *                      groups ∪ change rows' groups)
    * @param aggs          aggregate columns (aliased) applied per group */
  def refresh(mergedTarget: DataFrame, prevAgg: DataFrame, changedGroups: DataFrame,
              groupKeys: Seq[String], aggs: Seq[Column]): DataFrame = {
    require(aggs.nonEmpty, "need at least one aggregate")
    val cg = changedGroups.select(groupKeys.map(col): _*).distinct().alias("__cg")
    // Null-safe (<=>): a null group key is a real aggregate group, and a
    // plain equi-join would neither recompute nor evict it. No broadcast
    // hint — the changed set is batch-driven and unbounded (a backfill can
    // touch millions of groups); AQE picks broadcast when it fits.
    def touched(df: DataFrame, alias: String, joinType: String) = {
      val cond = groupKeys.map(k => col(s"$alias.$k") <=> col(s"__cg.$k")).reduce(_ && _)
      df.alias(alias).join(cg, cond, joinType)
    }
    val recomputed = touched(mergedTarget, "__t", "left_semi")
      .groupBy(groupKeys.map(col): _*).agg(aggs.head, aggs.tail: _*)
    val kept = touched(prevAgg, "__p", "left_anti")
    kept.unionByName(recomputed)
  }
}
