package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shared finishing math of the event-series detectors — factored out
  * so the BATCH queries (`events_cusum`, `events_mad_anomaly`) and their
  * STREAMING twins ([[graft.streaming.DetectorStream]]) provably run the
  * same arithmetic over the same summary state:
  *
  *  - CUSUM reads the per-(type, hour) count table — additive, so
  *    per-delivery counts SUM-merge into exactly the single-pass table.
  *  - MAD reads the per-(type, cents) value HISTOGRAM — also additive,
  *    and bounded by the cents domain (value range × 100), not corpus
  *    size; medians over a histogram are cumulative-count crossings.
  *
  * Both finishers stay on the repo's exactness contract: pure integer
  * arithmetic (cross-multiplied means, lower-median crossings, integer
  * MAD thresholds) — no float enters until/unless the caller divides. */
object Detectors {

  /** CUSUM level-shift statistic over an hourly count table
    * (event_type, hour, n). The clamped recurrence
    * C_t = max(0, C_{t−1} + (n_t − mean)) has the closed form
    * C_t = P_t − min(0, min_{j≤t} P_j) with P the prefix sum of
    * deviations — two window passes, no recursion. Deviations are
    * cross-multiplied by the hour count (d_t = n_t·T − N) so the mean
    * never becomes a float. Shift flag at C_t > 5·T (≈ five sustained
    * excess events). Window state is hours-bounded, never corpus.
    * Output: (event_type, hour, n, cusum, is_shift). */
  def cusumOverHourly(hourly: DataFrame): DataFrame = {
    val wStats = Window.partitionBy("event_type")
    val wRun = Window.partitionBy("event_type").orderBy("hour")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hourly
      .withColumn("__T", count(lit(1)).over(wStats))
      .withColumn("__N", sum(col("n")).over(wStats))
      .withColumn("__p", sum(col("n") * col("__T") - col("__N")).over(wRun))
      .withColumn("cusum",
        col("__p") - least(lit(0L), min(col("__p")).over(wRun)))
      .select(col("event_type"), col("hour"), col("n"), col("cusum"),
        (col("cusum") > lit(5L) * col("__T")).as("is_shift"))
  }

  /** Robust median/MAD outlier profile from a value histogram
    * (event_type, cents, cnt): lower-median crossings over cumulative
    * counts (2·cum ≥ n → min cents), the deviation histogram re-keyed
    * from the SAME histogram, its lower median as the MAD, and the
    * 3×MAD exceedance count — everything integer-exact. Running sums
    * ride [[Curation.parallelRunningSum]] (two-phase sliced prefix sum),
    * so one dominant type never serializes a single window task; state
    * is cents-domain-bounded. Output: (event_type, n, med_cents,
    * mad_cents, n_outliers) — identical to the corpus-rank formulation
    * it replaced (the crossing picks the same lower median). */
  def madOverHist(hist0: DataFrame): DataFrame = {
    // the histogram subtree feeds n1, the median prefix-sum AND the
    // deviation re-histogram — and each broadcast branch of the final
    // plan evaluates its subtree separately, so an unmaterialized hist
    // would re-run the corpus scan+agg ~5x per action. Both shared
    // frames are cents-domain-bounded (tiny).
    val hist = hist0.localCheckpoint(true)
    val n1 = hist.groupBy("event_type").agg(sum("cnt").as("n"))
    val c1 = Curation.parallelRunningSum(hist, Seq("event_type"),
      Seq("cents"), "cnt", "cum")
    val med = c1.join(broadcast(n1), "event_type")
      .where(lit(2L) * col("cum") >= col("n"))
      .groupBy("event_type").agg(min(col("cents")).as("med_cents"))
    val devHist = hist.join(broadcast(med), "event_type")
      .groupBy(col("event_type"), col("med_cents"),
        abs(col("cents") - col("med_cents")).as("dev"))
      .agg(sum("cnt").as("cnt"))
      .localCheckpoint(true) // feeds the MAD prefix-sum and the final agg
    val c2 = Curation.parallelRunningSum(devHist, Seq("event_type"),
      Seq("dev"), "cnt", "cum")
    val mad = c2.join(broadcast(n1), "event_type")
      .where(lit(2L) * col("cum") >= col("n"))
      .groupBy("event_type").agg(min(col("dev")).as("mad_cents"))
    devHist.join(broadcast(mad), "event_type").join(broadcast(n1), "event_type")
      .groupBy("event_type")
      .agg(max("n").as("n"), max("med_cents").as("med_cents"),
        max("mad_cents").as("mad_cents"),
        sum(when(col("dev") > lit(3L) * col("mad_cents"), col("cnt"))
          .otherwise(0L)).as("n_outliers"))
  }
}
