package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Two-sample experiment analysis (A/B testing) over a metric column —
  * the readout step of every data-driven rollout: is the treatment
  * cohort's metric distribution different from control's?
  *
  * Reports both the parametric and the rank-based answer per key:
  *   - Welch's unequal-variance t statistic (means + sample variances
  *     from one pass of exact DECIMAL sums, so the inputs to the IEEE
  *     formula are order-independent — a 100 TB shuffle cannot change
  *     the answer);
  *   - the Mann-Whitney U statistic with average-rank tie handling.
  *     Ranks come from one window pass; the tie-averaged rank sum is
  *     kept EXACT by summing the integer `2·rank + ties − 1` (= 2× the
  *     average rank) per cohort in LONGs and halving once at the end —
  *     no fractional accumulation anywhere.
  *
  * Scale shape: one rank window (shuffle on keyCol — each key's rows
  * sort together, the same exchange any per-key statistic pays) feeding
  * one partial aggregate (map-side combined, output = #keys rows). No
  * driver materialization, no second corpus pass. Significance
  * thresholds (t > 1.96 etc.) are left to the caller — the statistics
  * are the engine's job, the inference policy is not.
  *
  * Output: (keyCol, n_a, n_b, mean_a, mean_b, welch_t, u_stat) where
  * `u_stat` is cohort A's U (U_b = n_a·n_b − U_a). Keys where either
  * cohort is empty or a variance denominator is zero yield null
  * welch_t (honest: the statistic is undefined, not 0).
  */
object Experiment {

  /** `cohortAExpr` is a boolean SQL expression (e.g. a flag column name
    * or `"user_id % 2 = 0"`) naming cohort A; everything else is B. */
  def abTest(df: DataFrame, keyCol: String, cohortAExpr: String,
             valueCol: String): DataFrame = {
    val wRank = Window.partitionBy(keyCol).orderBy(col(valueCol))
    val wTie = Window.partitionBy(keyCol, valueCol)
    val vd = col(valueCol).cast(DecimalType(18, 2))
    val ranked = df.select(col(keyCol), expr(cohortAExpr).cast("boolean").as("__a"),
        col(valueCol), vd.as("__vd"))
      // 2·avgrank = 2·minrank + (ties − 1): exact LONG per row
      .withColumn("__r2",
        lit(2L) * rank().over(wRank) + count(lit(1)).over(wTie) - lit(1L))
    def side(a: Boolean, c: org.apache.spark.sql.Column) =
      sum(when(col("__a") === a, c))
    val agg = ranked.groupBy(col(keyCol)).agg(
      count(when(col("__a"), lit(1))).as("n_a"),
      count(when(!col("__a"), lit(1))).as("n_b"),
      side(true, col("__vd")).as("__sxa"),
      side(false, col("__vd")).as("__sxb"),
      side(true, col("__vd") * col("__vd")).as("__sxxa"),
      side(false, col("__vd") * col("__vd")).as("__sxxb"),
      side(true, col("__r2")).cast("long").as("__r2a"))
    def mean(sx: String, n: String) =
      col(sx).cast("double") / col(n).cast("double")
    // sample variance from exact sums: (Σx² − (Σx)²/n) / (n−1)
    def variance(sxx: String, sx: String, n: String) =
      (col(sxx).cast("double") -
        col(sx).cast("double") * col(sx).cast("double") / col(n).cast("double")) /
        (col(n).cast("double") - lit(1.0))
    val va = variance("__sxxa", "__sxa", "n_a")
    val vb = variance("__sxxb", "__sxb", "n_b")
    agg.select(col(keyCol), col("n_a"), col("n_b"),
      mean("__sxa", "n_a").as("mean_a"),
      mean("__sxb", "n_b").as("mean_b"),
      when(col("n_a") > 1 && col("n_b") > 1,
        (mean("__sxa", "n_a") - mean("__sxb", "n_b")) /
          sqrt(va / col("n_a").cast("double") + vb / col("n_b").cast("double")))
        .as("welch_t"),
      // U_a = R_a − n_a(n_a+1)/2, computed on the doubled-integer axis
      ((col("__r2a") - col("n_a") * (col("n_a") + lit(1L))).cast("double") /
        lit(2.0)).as("u_stat"))
  }
}
