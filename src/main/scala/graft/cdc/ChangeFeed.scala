package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-feed: the row-level audit log a lakehouse CDF endpoint
  * emits — for every change row, its pre-image (the value the key held
  * immediately before this operation) next to its post-image.
  *
  * Built from the same inputs as the merge (target state + sequenced
  * change batch, reference DMSCDC_LoadIncremental.py:56-73): union the
  * target as sequence 0, `lag()` each tracked column over the per-key
  * commit order, and keep only the actual change rows. The pre-image of
  * the first operation on a key is the target row (or NULL for inserts
  * of brand-new keys); deletes carry their last-known values as the
  * pre-image and NULL post-images.
  *
  * Scale: ONE shuffle on the PK hash — the identical exchange the merge
  * itself needs (Catalyst reuses the window partitioning), then a
  * per-key linear lag pass. No joins, no collect.
  */
object ChangeFeed {

  /** @param target    current table state (no metadata columns)
    * @param changes   change rows with `Op` and `file_seq` (>0)
    * @param pks       primary-key columns (non-empty)
    * @param trackCols data columns to emit pre/post images for
    * @return one row per change operation: pks, `change_seq` (1-based
    *         per-key operation index), `Op`, and `<c>_old` / `<c>_new`
    *         per tracked column
    */
  def feed(target: DataFrame, changes: DataFrame, pks: Seq[String],
           trackCols: Seq[String], intraFileOrder: Seq[Column] = Nil,
           keepFileSeq: Boolean = false): DataFrame = {
    require(pks.nonEmpty, "change feed requires primary keys")
    feedSequenced(target, Merge.sequenceBatch(changes, pks, intraFileOrder),
      pks, trackCols, keepFileSeq)
  }

  /** [[feed]] over an already-sequenced batch (rows carry `file_seq` and
    * `rownum`) — the entry point for pipelines that sequenced the batch
    * for the merge anyway ([[graft.io.CdcPipeline]]): feed and merge then
    * share one sequencing exchange.
    *
    * `target` may be restricted to the rows of impacted files: keys
    * absent from the batch contribute no feed rows (the `file_seq > 0`
    * filter drops them), so pre-images only need the impacted subset. */
  def feedSequenced(target: DataFrame, sequenced: DataFrame, pks: Seq[String],
                    trackCols: Seq[String],
                    keepFileSeq: Boolean = false): DataFrame = {
    require(pks.nonEmpty, "change feed requires primary keys")
    val taggedTarget = target
      .withColumn(Merge.FileSeq, lit(0L))
      .withColumn(Merge.RowNum, lit(1L))
    val unioned = sequenced.unionByName(taggedTarget, allowMissingColumns = true)
    val order = Seq(col(Merge.FileSeq), col(Merge.RowNum))
    val w = Window.partitionBy(pks.map(col): _*).orderBy(order: _*)
    // A key stops existing after a delete: the pre-image of whatever
    // follows one (a re-insert) is NULL, not the deleted row's values.
    val prevOp = lag(col(Op.column), 1).over(w)
    val images = trackCols.flatMap { c =>
      Seq(
        when(prevOp.isNull || prevOp === Op.Delete, lit(null))
          .otherwise(lag(col(c), 1).over(w)).as(s"${c}_old"),
        when(col(Op.column) === Op.Delete, lit(null)).otherwise(col(c)).as(s"${c}_new"))
    }
    val out = unioned
      .select(pks.map(col) ++ Seq(col(Merge.RowNum).cast("long").as("change_seq"),
        col(Merge.FileSeq), col(Op.column)) ++ images: _*)
      .where(col(Merge.FileSeq) > 0L)
    if (keepFileSeq) out else out.drop(Merge.FileSeq)
  }

  /** TIME TRAVEL from the feed alone: the table state as of commit
    * `seq`, reconstructed without the original change files — latest
    * post-image per key among feed rows with `file_seq` ≤ `seq`
    * (a key whose last operation by then is a delete drops), keys the
    * feed never touched by then riding from `base` (the pre-feed
    * state). The audit log is SUFFICIENT to restore any historical
    * state — the lakehouse RESTORE/AS OF read, and the prefix
    * generalization of the feed's replay ≡ merge law (at the max seq
    * this equals the full merge; `cdc_time_travel` oracle-checks an
    * interior prefix against the merge-of-prefix recompute). Requires a
    * feed built with `keepFileSeq = true`.
    *
    * Scale: one window pass over the (churn-sized) feed prefix + one
    * anti join against its distinct keys — base rows never shuffle
    * wider than the key anti-join; no original-change-file IO.
    * Output: (pks..., trackCols...). */
  def stateAsOf(base: DataFrame, feed: DataFrame, pks: Seq[String],
                trackCols: Seq[String], seq: Long): DataFrame = {
    require(pks.nonEmpty, "time travel requires primary keys")
    require(feed.columns.contains(Merge.FileSeq),
      s"feed lacks ${Merge.FileSeq} — build it with keepFileSeq = true")
    val upTo = feed.where(col(Merge.FileSeq) <= seq)
    val w = Window.partitionBy(pks.map(col): _*)
      .orderBy(col(Merge.FileSeq).desc, col("change_seq").desc)
    val survivors = upTo
      .withColumn("__rn", row_number().over(w)).where(col("__rn") === 1)
      .where(col(Op.column) =!= Op.Delete)
      .select(pks.map(col) ++ trackCols.map(c => col(s"${c}_new").as(c)): _*)
    base.join(upTo.select(pks.map(col): _*).distinct(), pks, "left_anti")
      .select((pks ++ trackCols).map(col): _*)
      .unionByName(survivors)
  }
}
