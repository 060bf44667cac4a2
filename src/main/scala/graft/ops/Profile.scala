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

  /** Per-group z-scores over an integer metric series — the volume-
    * anomaly screen for ingest monitoring (an hour whose event count sits
    * `threshold` population standard deviations from its group's mean is
    * flagged; pipelines alert on it before bad data propagates).
    *
    * Exactness contract: `valueCol` must be integral (counts) — n, Σv,
    * Σv² accumulate as exact LONG sums, so the group statistics are
    * order-independent, and the only floating-point work is a fixed
    * expression of those exact sums (IEEE divide/subtract and one
    * correctly-rounded sqrt — bit-identical cross-engine). Zero-variance
    * groups score z = 0 everywhere (no divide-by-zero NaN). Σv² caps the
    * domain: |v| must stay ≤ ~3·10⁹ per row at a billion rows per group
    * to keep the squared sum inside a LONG — counts of real buckets are
    * far below it. The cap is ENFORCED, not just documented: max|v| and
    * the group count ride along in the same stats pass, and a group
    * whose count·max² could wrap a LONG raises a loud error instead of
    * emitting silently-wrapped (wrong, possibly z = 0) scores.
    *
    * Plan: one partial-agg pass for the per-group stats (tiny — one row
    * per group), broadcast back over the series. Output: the series
    * columns + (z, is_anomaly). */
  def zScores(series: DataFrame, groupCols: Seq[String], valueCol: String,
              threshold: Double): DataFrame = {
    require(threshold >= 0, s"threshold must be >= 0: $threshold")
    val v = col(valueCol)
    val stats = series.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("__cnt"), sum(v).as("__s1"),
        sum(v * v).as("__s2"), max(abs(v.cast("double"))).as("__ma"))
    val cntD = col("__cnt").cast("double")
    val s1D = col("__s1").cast("double")
    val mean = s1D / cntD
    val variance = (col("__s2").cast("double") - ((s1D * s1D) / cntD)) / cntD
    // Σv² ≤ count·max² exactly; Java long addition wraps silently on
    // overflow, so detect the only state that could have wrapped and
    // fail loudly (9.0e18 < Long.MaxValue leaves margin far beyond the
    // double rounding of the product).
    val overflow = cntD * col("__ma") * col("__ma") >= lit(9.0e18)
    val z = when(overflow, raise_error(format_string(
        "zScores: %s values up to |%s| over %s rows overflow LONG in " +
          "sum(v*v) - pre-scale or pre-validate the metric",
        lit(valueCol), col("__ma"), col("__cnt"))).cast("double"))
      .when(variance <= 0.0, lit(0.0))
      .otherwise((v.cast("double") - mean) / sqrt(variance))
    series.join(broadcast(stats), groupCols)
      .withColumn("z", z)
      .withColumn("is_anomaly", abs(col("z")) >= threshold)
      .drop("__cnt", "__s1", "__s2", "__ma")
  }
}
