package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis: for each user, the earliest time each step of
  * an event sequence completed, where step i+1 must happen STRICTLY after
  * step i (the standard product-analytics funnel).
  *
  * Shape: one aggregation per step plus an equi-join per transition, all
  * keyed on the user column — the aggregations emit hash-partitioned
  * outputs and the joins are co-partitioned on the same key, so the k-step
  * funnel costs k passes over the (filtered) events and no extra
  * exchanges. This deliberately avoids the collect_list-per-user
  * formulation: a user with millions of events would materialize an
  * unbounded array; min-aggregates stay O(1) per user per step.
  */
object Funnel {

  /** @param steps ordered event types, e.g. Seq("view","click","purchase")
    * @param conversionWindow when set, a step counts only within
    *        `entry (t1) + window` (inclusive; same units as tsCol) — the
    *        "converted within N days" funnel definition, matching the
    *        window-gated crediting of
    *        [[graft.streaming.EventStreams.funnelProgress]]
    * @return one row per user who completed step 1: userCol,
    *         `t1..tk` (earliest completion time per step, null once the
    *         funnel stalls), `steps_completed`
    */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
             typeCol: String, steps: Seq[String],
             conversionWindow: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "funnel requires at least one step")
    val first = events.where(col(typeCol) === steps.head)
      .groupBy(userCol).agg(min(col(tsCol)).as("t1"))
    val full = steps.zipWithIndex.tail.foldLeft(first) { case (acc, (step, i)) =>
      val prev = s"t$i"
      val cur = s"t${i + 1}"
      // t1 rides along for the window gate (it IS prev at step 2)
      val accSel =
        if (prev == "t1") acc.select(col(userCol), col(prev))
        else acc.select(col(userCol), col(prev), col("t1"))
      val inWindow = conversionWindow
        .map(w => col("__ts") <= col("t1") + w).getOrElse(lit(true))
      val next = events.where(col(typeCol) === step)
        .select(col(userCol), col(tsCol).as("__ts"))
        .join(accSel, userCol)
        .where(col("__ts") > col(prev) && inWindow)
        .groupBy(userCol).agg(min(col("__ts")).as(cur))
      acc.join(next, Seq(userCol), "left")
    }
    val completed = (1 to steps.size).map(i => when(col(s"t$i").isNotNull, 1L).otherwise(0L))
      .reduce(_ + _)
    full.withColumn("steps_completed", completed)
  }
}
