package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto frontier) — the rows no other row dominates on
  * (minimize `minCol`, maximize `maxCol`): the "cheapest AND newest"
  * multi-criteria shortlist (Börzsönyi et al. 2001, "The Skyline
  * Operator"). A row is dominated iff some other row is ≤ on the
  * minimized axis, ≥ on the maximized axis, and strictly better on one.
  *
  * Algorithm — the sort-filter skyline made distributed:
  *  1. Reduce to one candidate per `minCol` value (only the per-value
  *     max of `maxCol` can survive; equal-(min,max) twins all survive).
  *     One partial agg.
  *  2. Running max of `maxCol` over STRICTLY-SMALLER `minCol`, computed
  *     with the same two-phase slicing as
  *     [[Curation.parallelRunningSum]]: range-partition by `minCol`,
  *     per-slice maxima, a broadcast cummax of the slice maxima (the
  *     only global window runs over #slices rows), then a per-slice
  *     exclusive-frame local max — no single-task corpus window.
  *  3. A candidate is on the frontier iff its `maxCol` exceeds that
  *     running max (or nothing precedes it).
  *  4. Join the surviving (min, max) pairs back to the input — every
  *     original row on the frontier returns, twins included.
  *
  * Cost: one agg + one range exchange + one broadcast join back;
  * driver state is #slices rows. Output = the input's frontier rows.
  */
object Skyline {

  def skyline2d(df: DataFrame, minCol: String, maxCol: String,
                maxBroadcastFrontier: Long = 1L << 20): DataFrame = {
    val (frontierLazy, sliced) = frontierPlan(df, minCol, maxCol)
    // Materialize the frontier ONCE (eager checkpoint: the size gate
    // and the join-back both read it), then release the candidate cache
    // — persist() without this was a CacheManager leak for long-lived
    // library sessions (r8 advice).
    val frontier = frontierLazy.localCheckpoint(true)
    sliced.unpersist(false)
    // Frontier size is DATA-DEPENDENT: correlated axes → a handful of
    // rows; anti-correlated axes → ~every distinct minCol value. A
    // forced broadcast hint is not demotable by AQE, so at 100 TB an
    // adversarial frontier would OOM the driver (r8 verdict). Count the
    // (already materialized) frontier and only hint broadcast below the
    // gate — above it the join-back runs as a regular shuffle join on
    // the (min, max) pair.
    val joinBack =
      if (frontier.count() <= maxBroadcastFrontier) broadcast(frontier)
      else frontier
    df.join(joinBack,
        col(minCol) === col("__fm") && col(maxCol) === col("__d"))
      .select(df.columns.map(col): _*)
  }

  /** The lazy frontier plan: (frontier (__fm, __d), the persisted sliced
    * candidate frame backing it — unpersist after materializing the
    * frontier). Exposed for plan assertions (the checkpoint in
    * [[skyline2d]] truncates the executed plan at the frontier). */
  private[ops] def frontierPlan(df: DataFrame, minCol: String,
                                maxCol: String): (DataFrame, DataFrame) = {
    val spark = df.sparkSession
    val slices = spark.sessionState.conf.numShufflePartitions
    val cand = df.groupBy(col(minCol)).agg(max(col(maxCol)).as("__d"))
    val sliced = cand.repartitionByRange(slices, col(minCol))
      .withColumn("__slice", spark_partition_id())
      .persist()
    val sliceMax = sliced.groupBy("__slice").agg(max("__d").as("__smax"))
    val offW = Window.orderBy("__slice")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = sliceMax
      .withColumn("__off", max(col("__smax")).over(offW))
      .drop("__smax")
    val localW = Window.partitionBy("__slice").orderBy(minCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontier = sliced.join(broadcast(offsets), "__slice")
      .withColumn("__lmax", max(col("__d")).over(localW))
      .withColumn("__prevmax", greatest(col("__off"), col("__lmax")))
      .where(col("__prevmax").isNull || col("__d") > col("__prevmax"))
      .select(col(minCol).as("__fm"), col("__d"))
    (frontier, sliced)
  }

  /** Domination test for specs: does `a` dominate `b` under (minimize
    * m, maximize x)? */
  def dominates(am: Double, ax: Long, bm: Double, bx: Long): Boolean =
    am <= bm && ax >= bx && (am < bm || ax > bx)
}
