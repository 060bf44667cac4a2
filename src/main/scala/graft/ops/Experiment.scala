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
    agg.select(col(keyCol), col("n_a"), col("n_b"),
      meanCol("__sxa", "n_a").as("mean_a"),
      meanCol("__sxb", "n_b").as("mean_b"),
      welchCol().as("welch_t"),
      // U_a = R_a − n_a(n_a+1)/2, computed on the doubled-integer axis
      ((col("__r2a") - col("n_a") * (col("n_a") + lit(1L))).cast("double") /
        lit(2.0)).as("u_stat"))
  }

  /** Mean from an exact moment sum: sx/n (the abTest expression — ONE
    * definition, shared by the batch op and the streaming moments
    * reader so the two are bit-identical by construction). */
  private[graft] def meanCol(sx: String, n: String): org.apache.spark.sql.Column =
    col(sx).cast("double") / col(n).cast("double")

  /** Sample variance from exact sums: (Σx² − (Σx)²/n) / (n−1). */
  private[graft] def varCol(sxx: String, sx: String,
                            n: String): org.apache.spark.sql.Column =
    (col(sxx).cast("double") -
      col(sx).cast("double") * col(sx).cast("double") / col(n).cast("double")) /
      (col(n).cast("double") - lit(1.0))

  /** Welch's t over columns (n_a, n_b, __sxa, __sxb, __sxxa, __sxxb);
    * null when either cohort lacks 2 observations. */
  private[graft] def welchCol(): org.apache.spark.sql.Column = {
    val va = varCol("__sxxa", "__sxa", "n_a")
    val vb = varCol("__sxxb", "__sxb", "n_b")
    when(col("n_a") > 1 && col("n_b") > 1,
      (meanCol("__sxa", "n_a") - meanCol("__sxb", "n_b")) /
        sqrt(va / col("n_a").cast("double") + vb / col("n_b").cast("double")))
  }

  /** Theil-Sen robust trend per key (Theil 1950 / Sen 1968): the median
    * of all pairwise slopes (v_j − v_i)/(t_j − t_i) over a key's time
    * series — the outlier-immune answer to "is this user's metric
    * drifting?" (up to ~29% contamination cannot move it, where one
    * wild point owns an OLS slope).
    *
    * Scale shape: pairwise work is quadratic PER KEY, so keys are first
    * thinned to ≤ `maxPerKey` points by a deterministic systematic
    * stride over the (ts, id) order (every ⌈n/maxPerKey⌉-th point —
    * keeps the full time span, unlike head/tail truncation), bounding
    * each key at maxPerKey²/2 pairs regardless of corpus growth. The
    * pair join shuffles on the key once; the median is a lower-median
    * row_number pick ordered by (slope, id_i, id_j) — fully
    * deterministic, no interpolation, engine-portable (one IEEE
    * division per pair on exact inputs).
    *
    * Equal-timestamp pairs are excluded (slope undefined); keys with no
    * valid pair produce no row. Output: (keyCol, n_points, n_pairs,
    * theil_sen_slope). */
  def theilSen(df: DataFrame, keyCol: String, idCol: String, tsCol: String,
               valueCol: String, maxPerKey: Int = 100): DataFrame = {
    require(maxPerKey >= 2, s"maxPerKey must be >= 2: $maxPerKey")
    val wOrd = Window.partitionBy(keyCol).orderBy(col(tsCol), col(idCol))
    val wKey = Window.partitionBy(keyCol)
    val thinned = df
      .select(col(keyCol), col(idCol), col(tsCol), col(valueCol))
      .withColumn("__rn", row_number().over(wOrd))
      .withColumn("__n", count(lit(1)).over(wKey))
      .where((col("__rn") - 1) %
        expr(s"(__n + ${maxPerKey - 1}) div $maxPerKey") === 0)
      .drop("__rn", "__n")
      // three consumers (both pair sides + the points count): checkpoint
      // once or the scan + thin windows replan/execute three times
      .localCheckpoint(true)
    val a = thinned.select(col(keyCol), col(idCol).as("__ia"),
      col(tsCol).as("__ta"), col(valueCol).as("__va"))
    val b = thinned.select(col(keyCol), col(idCol).as("__ib"),
      col(tsCol).as("__tb"), col(valueCol).as("__vb"))
    val pairs = a.join(b, keyCol).where(col("__ta") < col("__tb"))
      .select(col(keyCol), col("__ia"), col("__ib"),
        ((col("__vb") - col("__va")).cast("double") /
          (col("__tb") - col("__ta")).cast("double")).as("__slope"))
    val wMed = Window.partitionBy(keyCol)
      .orderBy(col("__slope"), col("__ia"), col("__ib"))
    val points = thinned.groupBy(col(keyCol)).agg(count(lit(1)).as("n_points"))
    pairs
      .withColumn("__rk", row_number().over(wMed))
      .withColumn("n_pairs", count(lit(1)).over(wKey))
      .where(col("__rk") === expr("(n_pairs + 1) div 2")) // lower median
      .join(points, keyCol)
      .select(col(keyCol), col("n_points"), col("n_pairs"),
        col("__slope").as("theil_sen_slope"))
  }
}
