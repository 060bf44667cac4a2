package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD Type-2 history: instead of keeping only the latest version per key
  * (reference DMSCDC_LoadIncremental.py:72-73, [[Merge.applySequenced]]),
  * keep EVERY version with its validity interval — the standard
  * slowly-changing-dimension form the reference's latest-wins lake cannot
  * answer ("what did this row look like after batch N?").
  *
  * Interval semantics:
  *   - events per key are ordered by `(file_seq, rownum)` — the same total
  *     order the latest-wins merge uses;
  *   - `valid_from_seq` = the batch sequence that produced the version;
  *   - `valid_to_seq`   = the NEXT event's sequence (null while open) —
  *     computed over all events INCLUDING deletes, so a delete closes its
  *     predecessor's interval without emitting a version row;
  *   - `version`        = 1-based event index per key (delete events
  *     consume an index: version numbers are stable under replay whether
  *     or not a later batch resurrects the key);
  *   - `is_current`     = open interval (and, because delete rows are
  *     dropped after the lead(), a deleted key simply has no current row).
  *
  * Scale shape: one PK-hash exchange; `row_number` and `lead` share the
  * same window spec, so Catalyst plans a single Window operator after a
  * single Exchange — identical cost to the latest-wins merge, there is no
  * extra pass for history.
  */
object Scd2 {

  /** Build the full version history of `target` + `changes`.
    *
    * @param target  current table state (no metadata columns); treated as
    *                the `file_seq=0` snapshot, like [[Merge.applySequenced]]
    * @param changes change rows with `Op` and `file_seq` (>0) columns
    * @param pks     primary-key column list (non-empty)
    * @return        one row per non-delete version, schema = changes minus
    *                `rownum` plus (version, valid_from_seq, valid_to_seq,
    *                is_current)
    */
  def history(target: DataFrame, changes: DataFrame, pks: Seq[String],
              intraFileOrder: Seq[Column]): DataFrame = {
    require(pks.nonEmpty, "SCD2 history requires primary keys")
    val taggedTarget = target
      .withColumn(Merge.FileSeq, lit(0L))
      .withColumn(Merge.RowNum, lit(1L))
    val sequenced = Merge.sequenceBatch(changes, pks, intraFileOrder)
    val unioned = sequenced.unionByName(taggedTarget, allowMissingColumns = true)
    val w = Window.partitionBy(pks.map(col): _*)
      .orderBy(col(Merge.FileSeq), col(Merge.RowNum))
    unioned
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("valid_from_seq", col(Merge.FileSeq))
      .withColumn("valid_to_seq", lead(col(Merge.FileSeq), 1).over(w))
      .where(col(Op.column) =!= Op.Delete)
      .withColumn("is_current", col("valid_to_seq").isNull)
      .drop(Merge.FileSeq, Merge.RowNum)
  }

  /** Time travel: the table state as of the END of batch `seq` — every
    * version whose validity interval covers the instant after `seq`.
    * `asOf(history, 0)` is the original target (minus keys the target
    * never had); `asOf(history, lastSeq)` equals the latest-wins merge
    * (pinned in Scd2Spec and the `cdc_scd2_asof` oracle).
    *
    * Same-batch supersession is handled by the interval semantics: a
    * version superseded within its own batch has `valid_to_seq ==
    * valid_from_seq == seq` and is correctly excluded at `seq`.
    *
    * Scale: a FILTER over the history table — no window, no join; with
    * the history stored partitioned/z-ordered on the interval columns,
    * parquet min/max skips non-covering files. */
  def asOf(history: DataFrame, seq: Long): DataFrame =
    history
      .where(col("valid_from_seq") <= seq &&
        (col("valid_to_seq").isNull || col("valid_to_seq") > seq))
      .drop("version", "valid_from_seq", "valid_to_seq", "is_current")

  /** History retention (the row-level VACUUM): drop every version whose
    * interval closed at or before `cutoffSeq`. What remains answers
    * [[asOf]] EXACTLY for any `seq >= cutoffSeq` (a version covering an
    * instant after the cutoff has `valid_to_seq > cutoffSeq` and is
    * retained) and is silently incomplete before it — the same contract
    * as Delta's `VACUUM`/log retention, applied to interval rows.
    * Current rows (`valid_to_seq` null) always survive, so the pruned
    * history still contains the full latest-wins table.
    *
    * Scale: a filter — with the history partitioned on `valid_to_seq`
    * ranges (or a [[graft.io.StatsIndex]] over it), pruning rewrites only
    * the files that actually contain expired versions. */
  def prune(history: DataFrame, cutoffSeq: Long): DataFrame =
    history.where(col("valid_to_seq").isNull || col("valid_to_seq") > cutoffSeq)
}
