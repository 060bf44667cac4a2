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
    * Output: (rule, violations, n_rows, pass). */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val aggs = count(lit(1)).as("__n") +:
      rules.map(r => sum(when(r.violation, 1L).otherwise(0L)).as(r.name))
    val wide = df.agg(aggs.head, aggs.tail: _*)
    // one row → long format via stack (no shuffle; the input is 1 row)
    val pairs = rules.map(r => s"'${r.name}', `${r.name}`").mkString(", ")
    wide.selectExpr(s"stack(${rules.length}, $pairs) AS (rule, violations)", "__n AS n_rows")
      .select(col("rule"), col("violations"), col("n_rows"),
        (col("violations") === 0L).as("pass"))
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
}
