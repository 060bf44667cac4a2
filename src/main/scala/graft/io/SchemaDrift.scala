package graft.io

import org.apache.spark.sql.types._

/** Schema-drift detection between a target table and incoming change
  * data — the decision input for the merge's schema-evolution path
  * (reference behavior: DMSCDC loads evolve by union; see
  * `CdcPipeline.mergeTagged`'s mergeSchema read). Pure metadata work:
  * runs on the driver against two StructTypes, no jobs.
  *
  * Policy encoded by [[isCompatible]]: additions and drops are safe under
  * `unionByName(allowMissingColumns)` (absent side reads as null);
  * type changes are safe only when they widen losslessly (the parquet
  * footer remains readable either way, but narrowing silently truncates).
  */
object SchemaDrift {

  sealed trait Change { def column: String }
  final case class Added(column: String, dataType: DataType) extends Change
  final case class Dropped(column: String, dataType: DataType) extends Change
  final case class TypeChanged(column: String, from: DataType, to: DataType) extends Change

  /** Lossless numeric/temporal widenings (the ANSI-store-assignment safe set). */
  def widens(from: DataType, to: DataType): Boolean = (from, to) match {
    case (a, b) if a == b => true
    case (ByteType, ShortType | IntegerType | LongType) => true
    case (ShortType, IntegerType | LongType) => true
    case (IntegerType, LongType) => true
    case (FloatType, DoubleType) => true
    case (ByteType | ShortType | IntegerType, DoubleType) => true
    case (DateType, TimestampType) => true
    case (a: DecimalType, b: DecimalType) =>
      b.precision - b.scale >= a.precision - a.scale && b.scale >= a.scale
    case _ => false
  }

  /** All changes from `current` to `incoming`, by column name (order is
    * irrelevant to parquet + unionByName). */
  def diff(current: StructType, incoming: StructType): Seq[Change] = {
    val cur = current.fields.map(f => f.name -> f.dataType).toMap
    val inc = incoming.fields.map(f => f.name -> f.dataType).toMap
    val added = incoming.fields.collect {
      case f if !cur.contains(f.name) => Added(f.name, f.dataType)
    }
    val dropped = current.fields.collect {
      case f if !inc.contains(f.name) => Dropped(f.name, f.dataType)
    }
    val changed = incoming.fields.collect {
      case f if cur.get(f.name).exists(_ != f.dataType) =>
        TypeChanged(f.name, cur(f.name), f.dataType)
    }
    (added ++ dropped ++ changed).toSeq
  }

  /** True when the merge can proceed without data loss. */
  def isCompatible(changes: Seq[Change]): Boolean = changes.forall {
    case TypeChanged(_, from, to) => widens(from, to)
    case _ => true
  }

  /** Human/log-friendly one-liner per change. */
  def describe(changes: Seq[Change]): Seq[String] = changes.map {
    case Added(c, t) => s"+ $c: ${t.simpleString}"
    case Dropped(c, t) => s"- $c: ${t.simpleString}"
    case TypeChanged(c, f, t) => s"~ $c: ${f.simpleString} -> ${t.simpleString}"
  }
}
