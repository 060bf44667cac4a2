package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The flagship operator: latest-wins per-primary-key CDC merge.
  *
  * Re-expresses the semantics of
  * /root/reference/DMSCDC_LoadIncremental.py:56-73 as pure
  * `DataFrame => DataFrame` functions, Spark-first:
  *
  *   - target rows get sentinel ordering `(file_seq=0, rownum=1)`
  *     (reference: `sortpath=lit("0")`, `rownum=lit(1)`, :64);
  *   - change rows are sequenced within the batch by
  *     `row_number() over (partition by pks order by file order)`
  *     (reference W1, :61,65);
  *   - union-by-name with null-fill gives schema evolution
  *     (reference U1, :71);
  *   - the latest version per key survives; deletes drop the key
  *     (reference W2+P4+P5, :72-73).
  *
  * Documented deltas from the reference (SURVEY.md §7.4):
  *   - `rank()` → `row_number()` with a total order: on exact
  *     (file_seq, rownum) ties the reference emits BOTH rows (duplicate
  *     hazard); we keep exactly one, deterministically.
  *   - the ordering column is an explicit numeric `file_seq` instead of a
  *     lexicographic file-name string; the file-based pipeline
  *     ([[graft.io.CdcPipeline]]) derives it from sorted file names, so the
  *     total order is identical.
  *
  * Scale notes (100 TB): the merge shuffles once on the PK hash (window)
  * — unavoidable for latest-wins semantics — and Catalyst plans the
  * union/window/filter in a single stage after the exchange. No
  * collect(), no driver-side loops. The change batch is typically ≪
  * target; AQE will broadcast the impacted-file semi-join side
  * (see [[graft.io.CdcPipeline]]).
  */
object Merge {

  /** Metadata columns synthesized during a merge; stripped from output. */
  val FileSeq = "file_seq"
  val RowNum = "rownum"
  private val Rnk = "rnk"
  private val metaCols = Seq(FileSeq, RowNum, Rnk)

  /** Tag a full-load snapshot with `Op='I'`
    * (reference DMSCDC_LoadInitial.py:28, parity with CDC format). */
  def tagInitial(df: DataFrame): DataFrame =
    df.withColumn(Op.column, lit(Op.Insert))

  /** Insert-only path: tables without a primary key, or first-ever load
    * (reference DMSCDC_LoadIncremental.py:56-57). NOT idempotent under
    * replay — documented reference behavior (README.md:208-220). */
  def insertOnly(changes: DataFrame): DataFrame =
    changes.filter(col(Op.column) === Op.Insert)

  /** Sequence a change batch: assign `rownum` = arrival order per key.
    *
    * `changes` must carry a `file_seq` column (commit order of the file
    * the row came from); `intraFileOrder` breaks ties within a file.
    * Reference W1 (DMSCDC_LoadIncremental.py:61,65) orders by file name
    * only and inherits scan order within a file — nondeterministic under
    * multi-split reads; we require an explicit total order.
    */
  def sequenceBatch(changes: DataFrame, pks: Seq[String], intraFileOrder: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(pks.map(col): _*)
      .orderBy(col(FileSeq) +: intraFileOrder: _*)
    changes.withColumn(RowNum, row_number().over(w))
  }

  /** Latest-wins merge of a sequenced change batch into a target.
    *
    * @param target  current table state (no metadata columns)
    * @param changes change rows with `Op`, `file_seq` (>0) and `rownum`
    *                columns (from [[sequenceBatch]])
    * @param pks     primary-key column list (non-empty)
    * @return        the post-merge table, schema = changes minus metadata
    *                (reference `select(inputfile.columns)`, :73 — note the
    *                reference drops target-only columns; we match that)
    */
  def applySequenced(target: DataFrame, changes: DataFrame, pks: Seq[String]): DataFrame = {
    require(pks.nonEmpty, "latest-wins merge requires primary keys; use insertOnly")
    val taggedTarget = target
      .withColumn(FileSeq, lit(0L))
      .withColumn(RowNum, lit(1L))
    // By-name union with null-fill = schema evolution (reference U1, :71).
    val unioned = changes.unionByName(taggedTarget, allowMissingColumns = true)
    // row_number (not rank): deterministic single survivor on ties (§7.4).
    val w = Window.partitionBy(pks.map(col): _*)
      .orderBy(col(FileSeq).desc, col(RowNum).desc)
    val outCols = changes.columns.filterNot(metaCols.contains).toIndexedSeq
    unioned
      .withColumn(Rnk, row_number().over(w))
      .where(col(Rnk) === 1 && col(Op.column) =!= Op.Delete)
      .select(outCols.map(col): _*)
  }

  /** Full merge: sequence the batch, then apply. `changes` carries `Op`
    * and `file_seq`; intra-file order defaults to input order via a
    * caller-supplied column (e.g. `_metadata.row_index` for real files,
    * or an explicit `rownum`-precursor for synthetic batches). */
  def mergeCdc(target: DataFrame, changes: DataFrame, pks: Seq[String],
               intraFileOrder: Seq[Column]): DataFrame =
    applySequenced(target, sequenceBatch(changes, pks, intraFileOrder), pks)

  /** Strip the op-code column for final user-facing reads: the lake holds
    * `Op` for parity with the reference's output (which keeps it —
    * LoadInitial writes `Op='I'` into the lake, :28,34-36). */
  def dropOp(df: DataFrame): DataFrame =
    df.drop(Op.column)

  /** Conditional MERGE — the general lakehouse `MERGE … WHEN` surface
    * beyond latest-wins:
    *
    *   WHEN MATCHED AND winner.Op = 'D'      THEN DELETE
    *   WHEN MATCHED AND `updateWhen`         THEN UPDATE (take the winner)
    *   WHEN MATCHED otherwise                THEN keep the target row
    *   WHEN NOT MATCHED AND winner.Op <> 'D' THEN INSERT
    *
    * The batch first folds to ONE winner per key (the same sequenced
    * latest-wins fold as [[applySequenced]], batch-internally), so the
    * clause predicate sees the batch's FINAL image and composes with
    * multi-file batches. `updateWhen` sees the matched pair through the
    * aliases `t` (target row) and `c` (batch winner) — e.g.
    * `col("t.o_orderstatus") =!= "F"` makes finalized rows immutable, or
    * `col("c.ts") > col("t.ts")` guards against out-of-order replays.
    * Physically PK-hash shuffles only (batch winner fold + the
    * full-outer join; the null-safe join re-keys the fold's exchange —
    * the price of NULL-key groups converging like [[applySequenced]]'s).
    * Output schema = changes minus metadata (reference parity). */
  def mergeConditional(target: DataFrame, changes: DataFrame, pks: Seq[String],
                       intraFileOrder: Seq[Column], updateWhen: Column): DataFrame =
    mergeConditionalSequenced(target,
      sequenceBatch(changes, pks, intraFileOrder), pks, updateWhen)

  /** [[mergeConditional]]'s apply half over an already-[[sequenceBatch]]ed
    * batch — the drop-in conditional twin of [[applySequenced]], which
    * [[graft.io.CdcPipeline.mergeTagged]] selects via
    * `TableConfig.updateWhen` (so the file pipeline AND the streaming
    * foreachBatch path get clause semantics from one switch, exactly
    * like `patchUpdates`). */
  def mergeConditionalSequenced(target: DataFrame, changes: DataFrame,
                                pks: Seq[String], updateWhen: Column): DataFrame = {
    require(pks.nonEmpty, "conditional merge requires primary keys")
    val w = Window.partitionBy(pks.map(col): _*)
      .orderBy(col(FileSeq).desc, col(RowNum).desc)
    val winner = changes
      .withColumn(Rnk, row_number().over(w))
      .where(col(Rnk) === 1)
      .drop(metaCols: _*)
    val t = target.withColumn("__has_t", lit(true)).alias("t")
    val c = winner.withColumn("__has_c", lit(true)).alias("c")
    val on = pks.map(k => col(s"t.$k") <=> col(s"c.$k")).reduce(_ && _)
    val matched = col("t.__has_t").isNotNull && col("c.__has_c").isNotNull
    val del = matched && col(s"c.${Op.column}") === Op.Delete
    // SQL MERGE treats an UNKNOWN clause predicate as not-matched-by-this-
    // clause: the row falls through to the keep branch. Without coalesce a
    // NULL guard (e.g. `c.ts > t.ts` with a NULL timestamp) would make
    // upd/keep/takeC all NULL and where(takeC || keep) drop the row.
    val upd = matched && col(s"c.${Op.column}") =!= Op.Delete &&
      coalesce(updateWhen, lit(false))
    val ins = col("t.__has_t").isNull && col(s"c.${Op.column}") =!= Op.Delete
    val keep = col("c.__has_c").isNull || (matched && !del && !upd)
    val takeC = upd || ins
    val outCols = changes.columns.filterNot(metaCols.contains).toIndexedSeq
    // Changes-side-only columns (schema evolution, or a caller-supplied
    // intra-file order column) null-fill on the kept-target side — the
    // same U1 semantics applySequenced gets from unionByName.
    val tCols = target.columns.toSet
    t.join(c, on, "full_outer")
      .where(takeC || keep)
      .select(outCols.map { n =>
        val tSide = if (tCols.contains(n)) col(s"t.$n")
                    else lit(null).cast(winner.schema(n).dataType)
        when(takeC, col(s"c.$n")).otherwise(tSide).as(n)
      }: _*)
  }

  /** COLUMN-PATCH merge — partial-update CDC semantics, where a NULL in
    * an update row means "column unchanged" (the wire format many CDC
    * feeds ship when only touched columns are captured), so a key's
    * final value per column is the LAST NON-NULL across (target row,
    * then changes in commit order). Two sequential patches to different
    * columns of one key COMPOSE — the property [[mergeCdc]]'s
    * whole-row latest-wins cannot express (its row 2 would erase row
    * 1's column).
    *
    * One window pass over the same union shape as [[applySequenced]]:
    * an IGNORE-NULLS running `last` per value column folds the patch
    * history (the `rel_window_ignore_nulls` semantics pin), and the
    * same (file_seq, rownum) DESC row_number picks the survivor, whose
    * folded values and op it carries. Deletes drop the key; an update
    * AFTER a delete resurrects it with the full folded history — the
    * identical resurrect-on-later-row shape as [[applySequenced]].
    * Limitation (inherent to the format, documented not hidden):
    * "set this column to NULL" is inexpressible.
    *
    * `target` rows carry `Op` like the lake does; output schema =
    * changes minus metadata, like [[applySequenced]]. */
  def patchMerge(target: DataFrame, changes: DataFrame, pks: Seq[String],
                 intraFileOrder: Seq[Column]): DataFrame =
    patchApplySequenced(target, sequenceBatch(changes, pks, intraFileOrder), pks)

  /** [[patchMerge]]'s apply half over an already-[[sequenceBatch]]ed
    * batch — the drop-in patch-semantics twin of [[applySequenced]],
    * which [[graft.io.CdcPipeline.mergeTagged]] selects via
    * `TableConfig.patchUpdates` (so the file pipeline AND the streaming
    * foreachBatch path get column-patch semantics from one switch). */
  def patchApplySequenced(target: DataFrame, changes: DataFrame,
                          pks: Seq[String]): DataFrame = {
    require(pks.nonEmpty, "column-patch merge requires primary keys")
    val taggedTarget = target
      .withColumn(FileSeq, lit(0L))
      .withColumn(RowNum, lit(1L))
    val unioned = changes.unionByName(taggedTarget, allowMissingColumns = true)
    val valueCols = changes.columns
      .filterNot(metaCols.contains).filterNot(pks.contains)
      .filterNot(_ == Op.column).toIndexedSeq
    val wFold = Window.partitionBy(pks.map(col): _*)
      .orderBy(col(FileSeq), col(RowNum))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wPick = Window.partitionBy(pks.map(col): _*)
      .orderBy(col(FileSeq).desc, col(RowNum).desc)
    val folded = unioned
      .select(Seq(col(Op.column), col(FileSeq), col(RowNum)) ++
        pks.map(col) ++
        valueCols.map(c => last(col(c), ignoreNulls = true).over(wFold).as(c)): _*)
      .withColumn(Rnk, row_number().over(wPick))
    folded
      .where(col(Rnk) === 1 && col(Op.column) =!= Op.Delete)
      .select((Op.column +: (pks ++ valueCols)).map(col): _*)
  }
}
