package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot diff: classify every key as added / removed / changed between
  * two table states (e.g. pre-merge target vs post-merge result). The
  * reference pipeline offers no way to audit what a CDC batch actually did
  * to the lake; this is the verification operator for it.
  *
  * Design: a single full-outer PK join with null-safe (`<=>`) per-column
  * compares — no row fingerprint strings (which would false-match on
  * type-boundary collisions and cost a serialization pass). Presence is
  * tracked by `lit(true)` marker columns, not key nullness, so null PK
  * values in data columns cannot be misread as absence.
  *
  * Scale shape: both sides shuffle once on the PK hash (or the smaller
  * side broadcasts under AQE); the compare is a codegen'd projection.
  * Unchanged rows — the overwhelming majority of a 100 TB table under an
  * incremental batch — are filtered before anything downstream sees them.
  */
object SnapshotDiff {

  /** Diff `before` → `after` on `pks`; value columns are the non-PK
    * columns present in BOTH schemas. Returns only differing keys:
    * `(pks..., change_type, old_<c>..., new_<c>...)`. */
  def diff(before: DataFrame, after: DataFrame, pks: Seq[String]): DataFrame = {
    require(pks.nonEmpty, "snapshot diff requires primary keys")
    val valueCols = before.columns.filterNot(pks.contains)
      .filter(after.columns.contains).toIndexedSeq
    val b = before.select(
      pks.map(col) ++ valueCols.map(c => col(c).as(s"old_$c"))
        :+ lit(true).as("__in_before"): _*)
    val a = after.select(
      pks.map(col) ++ valueCols.map(c => col(c).as(s"new_$c"))
        :+ lit(true).as("__in_after"): _*)
    val anyChanged = valueCols
      .map(c => !(col(s"old_$c") <=> col(s"new_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    b.join(a, pks, "full_outer")
      .withColumn("change_type",
        when(col("__in_before").isNull, "added")
          .when(col("__in_after").isNull, "removed")
          .when(anyChanged, "changed")) // else null → unchanged, dropped
      .where(col("change_type").isNotNull)
      .select(pks.map(col) ++ (col("change_type") +:
        valueCols.flatMap(c => Seq(col(s"old_$c"), col(s"new_$c")))): _*)
  }
}
