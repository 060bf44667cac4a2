package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling ("ANALYZE TABLE"-style statistics as a query): per
  * column, null count and distinct cardinality, plus the table row count —
  * the inputs for join-size estimates, skew triage, and data-contract
  * checks.
  *
  * One aggregation pass over one scan. Exact distinct counts over N
  * columns make Catalyst plan an Expand (N× row multiplication before the
  * partial agg) — correct but heavy; at 100 TB switch `approx = true`
  * (HyperLogLog++ partial aggregates, no Expand, one ordinary shuffle)
  * and keep the exact path for oracle-checked small-scale validation.
  */
object Profile {

  /** Output: (column, n_rows, n_nulls, n_distinct) — one row per profiled
    * column. Column names are carried as data (lit), never spliced into
    * SQL text. */
  def profile(df: DataFrame, cols: Seq[String], approx: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = count(lit(1)).as("__n") +: cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(
        // count(when(...)) not sum(when(...)): sum over ZERO rows is null,
        // and an empty table must profile as 0 nulls, not null nulls
        count(when(col(c).isNull, lit(1))).as(s"__null$i"),
        (if (approx) approx_count_distinct(col(c)) else count_distinct(col(c)))
          .as(s"__dist$i"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val entries = cols.zipWithIndex.map { case (c, i) =>
      struct(lit(c).as("column"), col(s"__null$i").as("n_nulls"),
        col(s"__dist$i").as("n_distinct"))
    }
    wide.select(explode(array(entries: _*)).as("e"), col("__n").as("n_rows"))
      .select(col("e.column").as("column"), col("n_rows"),
        col("e.n_nulls").as("n_nulls"), col("e.n_distinct").as("n_distinct"))
  }
}
