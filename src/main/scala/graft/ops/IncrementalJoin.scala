package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Merge-maintained JOIN view: keep M = fact ⋈ dim (one view row per
  * fact row) in lock-step with a CDC-merged fact WITHOUT re-joining the
  * whole fact after every batch.
  *
  * After a merge, a view row can differ only if its fact PK appears in
  * the batch (an update/delete must evict its old row; an insert/update
  * must add the new one), so the refresh evicts exactly those PKs from
  * the previous view (null-safe anti-join) and recomputes them from the
  * merged fact restricted to the same PKs (semi-join pruned scan — with
  * the lake's PK-clustered files this prunes to the impacted files)
  * joined to the dimension. Cost is batch-proportional on the fact and
  * view sides; the dim lookup touches only the pruned rows (broadcast
  * under AQE when the dim fits — no forced hint, a backfill batch is
  * unbounded).
  *
  * A changed DIMENSION is the symmetric delta term: derive the impacted
  * fact keys from the dim batch's join-key values (fact semi-joined on
  * the dim keys) and call the same refresh — eviction and recompute are
  * driven by fact PKs either way, so the two delta paths compose.
  *
  * Same design stance as [[IncrementalAgg]]: touched rows are recomputed
  * from the merged TRUTH rather than patched with +/- delta math, so any
  * join type whose row grain stays fact-keyed (inner / left on a
  * unique-keyed dim) is maintainable without tombstone bookkeeping.
  */
object IncrementalJoin {

  /** @param mergedFact  the fact table AFTER the merge
    * @param prevView    the join view from BEFORE the merge
    * @param changedKeys fact-PK values touched by the batch (change rows'
    *                    keys — old rows with those keys are superseded)
    * @param pkCols      the fact primary key (view rows are keyed by it)
    * @param dim         the dimension side (unique on `usingCols`)
    * @param usingCols   equi-join columns (USING semantics)
    * @param joinType    "inner" or "left" (row grain must stay fact-keyed) */
  def refresh(mergedFact: DataFrame, prevView: DataFrame, changedKeys: DataFrame,
              pkCols: Seq[String], dim: DataFrame, usingCols: Seq[String],
              joinType: String = "left"): DataFrame = {
    val ck = changedKeys.select(pkCols.map(col): _*).distinct().alias("__ck")
    // Null-safe (<=>): a NULL fact PK is a real (if degenerate) view key;
    // a plain equi-join would neither evict nor recompute it.
    def cond(alias: String) =
      pkCols.map(k => col(s"$alias.$k") <=> col(s"__ck.$k")).reduce(_ && _)
    val kept = prevView.alias("__p").join(ck, cond("__p"), "left_anti")
    val recomputed = mergedFact.alias("__f").join(ck, cond("__f"), "left_semi")
      .join(dim, usingCols, joinType)
    kept.unionByName(recomputed)
  }
}
