package graft.cdc

/** Core CDC data model.
  *
  * Mirrors the semantics of the reference's change-record envelope
  * (/root/reference/DMSCDC_LoadIncremental.py:57,73 — the leading `Op`
  * column) and its per-table state item
  * (/root/reference/DMSCDC_Controller.py:76-100), re-expressed as plain
  * Scala case classes. No DynamoDB / Glue — state is local (see
  * [[graft.state.StateStore]]).
  */
object Op {
  val Insert = "I"
  val Update = "U"
  val Delete = "D"
  /** Name of the op-code column every change record carries. */
  val column = "Op"
}

/** Per-table configuration (external metadata, never in the data).
  *
  * The reference keeps these as comma-separated strings with the literal
  * `"null"` meaning absent (DMSCDC_Controller.py:83-84,
  * DMSCDC_LoadIncremental.py:56,60). We model absence as empty Seq.
  */
/** @param replayGuard opt-in idempotent append for PK-less tables: the
  *   insert-only load writes one hive partition per source CDC file with
  *   dynamic partition overwrite, so an at-least-once replay rewrites a
  *   file's partition with identical rows instead of duplicating it. Off
  *   by default — the reference's documented non-idempotent append
  *   (/root/reference/README.md:208-220) is the parity behavior.
  * @param mergeOnRead opt-in storage mode for PK tables: merges commit
  *   through [[graft.io.MorTable]] (append-only batch winners +
  *   position-delete sidecars; reads reconstruct via a broadcast
  *   anti-join) instead of the reference's copy-on-write rewrite —
  *   write volume O(batch) instead of O(impacted files). Off by default
  *   (CoW is the parity behavior); requires primary keys, and the
  *   table's consumers must read through MorTable.read.
  * @param patchUpdates opt-in COLUMN-PATCH update semantics for PK
  *   tables: a NULL in an update row means "column unchanged", and
  *   sequential patches to different columns of one key compose
  *   ([[Merge.patchApplySequenced]]) instead of whole-row latest-wins.
  *   Off by default (whole-row is the parity behavior); "set a column
  *   to NULL" is inexpressible under this wire format (documented
  *   Merge.patchMerge limitation).
  * @param updateWhen opt-in CONDITIONAL-MERGE guard for PK tables: a
  *   SQL boolean over the aliases `t` (target row) and `c` (batch
  *   winner) — e.g. `"c.ts > t.ts"` rejects out-of-order replays,
  *   `"t.status <> 'F'"` makes finalized rows immutable. Routes every
  *   merge (batch Controller AND streaming foreachBatch — one switch,
  *   like patchUpdates) through [[Merge.mergeConditionalSequenced]]:
  *   WHEN MATCHED AND guard → update, guard false/UNKNOWN → keep the
  *   target row; deletes and inserts ride unconditionally. Stored as
  *   the expression TEXT so it serializes with the state item. */
final case class TableConfig(
    primaryKeys: Seq[String] = Nil,
    partitionKeys: Seq[String] = Nil,
    active: Boolean = false,
    replayGuard: Boolean = false,
    mergeOnRead: Boolean = false,
    patchUpdates: Boolean = false,
    updateWhen: Option[String] = None) {
  // MOR stores whole-row batch winners; a patch row's NULLs would read
  // back as values. Fail at config time, not as silent data corruption.
  require(!(patchUpdates && mergeOnRead),
    "patchUpdates requires copy-on-write storage (mergeOnRead=false)")
  // the clause fold needs the matched (t, c) pair — patch folds erase
  // it. MOR tables support the guard too (MorTable.merge evaluates it
  // against the live view — the documented keyed target probe).
  require(updateWhen.isEmpty || !patchUpdates,
    "updateWhen requires whole-row merges (patchUpdates=false)")
  require(updateWhen.forall(_.trim.nonEmpty),
    "updateWhen must be a non-empty SQL boolean expression")
  def hasPrimaryKey: Boolean = primaryKeys.nonEmpty
}

object TableConfig {
  /** Parse the reference's comma-separated-or-"null" convention
    * (DMSCDC_LoadIncremental.py:56,60,76-77). */
  def fromStrings(primaryKey: String, partitionKey: String, active: Boolean): TableConfig = {
    def parse(s: String): Seq[String] =
      if (s == null || s.isEmpty || s == "null") Nil
      else s.split(",").toSeq.map(_.trim).filter(_.nonEmpty)
    TableConfig(parse(primaryKey), parse(partitionKey), active)
  }
}

/** Per-table watermark state. Defaults are the reference's verbatim
  * (DMSCDC_Controller.py:83-89): full-load epoch `1900-01-01 00:00:00`
  * and an incremental watermark that sorts before every real CDC file.
  */
final case class TableState(
    lastFullLoadDate: String = TableState.EpochFullLoad,
    lastIncrementalFile: String = "")

object TableState {
  val EpochFullLoad = "1900-01-01 00:00:00"
  /** Reference default: `<table path> + "0.parquet"` — lexicographically
    * before any `2<timestamp>` CDC file (DMSCDC_Controller.py:86). */
  def initial(tableDir: String): TableState =
    TableState(EpochFullLoad, tableDir.stripSuffix("/") + "/0.parquet")
}
