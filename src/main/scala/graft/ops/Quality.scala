package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations ("is this table fit to publish"),
  * evaluated in ONE aggregation pass: every rule compiles to a
  * `sum(violation ? 1 : 0)` over the same scan, so a 50-rule suite on a
  * 100 TB table costs exactly one read and no shuffle beyond the final
  * single-row reduce. Uniqueness rules need a grouped count and are the
  * exception — they run as one extra aggregation on the key.
  *
  * Results come back as data (rule, violations, pass), not exceptions:
  * pipelines route on them (quarantine, alert, block publish) — see
  * [[check]].
  */
object Quality {

  /** One expectation: `name` labels the rule, `violation` is a boolean
    * Column that is true for each FAILING row. */
  final case class Rule(name: String, violation: Column)

  def notNull(c: String): Rule = Rule(s"not_null:$c", col(c).isNull)

  def inRange(c: String, lo: Double, hi: Double): Rule =
    Rule(s"range:$c", col(c).isNotNull && (col(c) < lo || col(c) > hi))

  def inSet(c: String, allowed: Seq[String]): Rule =
    Rule(s"in_set:$c", col(c).isNotNull && !col(c).isin(allowed: _*))

  def matches(c: String, regex: String): Rule =
    Rule(s"matches:$c", col(c).isNotNull && !col(c).rlike(regex))

  /** Violation counts per rule — one scan, one partial-agg reduce.
    * Output: (rule, violations, n_rows, pass). Rule names are carried as
    * data (lit), never spliced into SQL text, so any name is safe; an
    * empty rule list yields zero rows with the same schema. */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    // positional aliases: rule names are arbitrary strings and must not
    // have to round-trip through identifier quoting
    val aggs = count(lit(1)).as("__n") +:
      rules.zipWithIndex.map { case (r, i) =>
        sum(when(r.violation, 1L).otherwise(0L)).as(s"__v$i") }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    if (rules.isEmpty)
      wide.select(lit("").as("rule"), lit(0L).as("violations"),
          col("__n").as("n_rows"), lit(true).as("pass"))
        .where(lit(false))
    else {
      // one row → long format via explode (no shuffle; the input is 1 row)
      val entries = rules.zipWithIndex.map { case (r, i) =>
        struct(lit(r.name).as("rule"), col(s"__v$i").as("violations")) }
      wide.select(explode(array(entries: _*)).as("e"), col("__n").as("n_rows"))
        .select(col("e.rule").as("rule"), col("e.violations").as("violations"),
          col("n_rows"), (col("e.violations") === 0L).as("pass"))
    }
  }

  /** Uniqueness expectation: rows per duplicated key combination.
    * Output: (rule, violations, n_rows, pass) — `violations` counts rows
    * beyond the first per key, so 0 means unique. */
  def checkUnique(df: DataFrame, keys: Seq[String]): DataFrame = {
    val dupRows = df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__k"))
      .agg(sum(col("__k") - 1L).as("violations"),
        sum(col("__k")).as("n_rows"))
    dupRows.select(
      lit(s"unique:${keys.mkString(",")}").as("rule"),
      coalesce(col("violations"), lit(0L)).as("violations"),
      coalesce(col("n_rows"), lit(0L)).as("n_rows"))
      .withColumn("pass", col("violations") === 0L)
  }

  /** Full suite: row rules + optional uniqueness, unioned. */
  def suite(df: DataFrame, rules: Seq[Rule],
            uniqueKeys: Seq[Seq[String]] = Nil): DataFrame =
    uniqueKeys.map(checkUnique(df, _)).foldLeft(check(df, rules))(_ unionByName _)

  /** Referential-integrity expectation: child rows whose (fully
    * non-NULL) foreign key has no parent. SQL FK semantics — a NULL in
    * any FK column exempts the row (it cannot "point wrong"), and NULL
    * counts ride along so partial feeds are visible, not hidden.
    *
    * Output: one (rule, violations, n_nulls, n_rows, pass) row.
    *
    * Scale: the orphan count is a left-anti join on the key hash —
    * the parent side ships only its DISTINCT key column (pruned at the
    * scan), so dimension-sized parents broadcast under AQE and
    * fact-fact checks degrade to one co-partitioned shuffle, never a
    * row-wise lookup. Totals come from the same child scan via a
    * grouping on the exemption bit, not a second pass. */
  def checkReferential(child: DataFrame, parent: DataFrame,
                       fkCols: Seq[String], pkCols: Seq[String]): DataFrame = {
    require(fkCols.nonEmpty && fkCols.length == pkCols.length,
      s"fk/pk arity mismatch: $fkCols vs $pkCols")
    val fkNull = fkCols.map(col(_).isNull).reduce(_ || _)
    val parentKeys = parent.select(pkCols.map(col): _*).distinct()
    val joinCond = fkCols.zip(pkCols)
      .map { case (f, p) => child(f) === parentKeys(p) }.reduce(_ && _)
    val orphans = child.where(!fkNull)
      .join(parentKeys, joinCond, "left_anti")
      .agg(count(lit(1)).as("violations"))
    val totals = child.agg(count(lit(1)).as("n_rows"),
      sum(when(fkNull, 1L).otherwise(0L)).as("__nn"))
    orphans.crossJoin(totals).select(
      lit(s"fk:${fkCols.mkString(",")}->${pkCols.mkString(",")}").as("rule"),
      col("violations"),
      coalesce(col("__nn"), lit(0L)).as("n_nulls"),
      col("n_rows"))
      .withColumn("pass", col("violations") === 0L)
  }
}
