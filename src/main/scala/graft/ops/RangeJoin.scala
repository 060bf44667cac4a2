package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join: match each left "point" row to the
  * right "interval" rows containing it — without the broadcast-nested-
  * loop plan Spark falls back to for inequality-only join conditions
  * (O(|points|·|intervals|) comparisons; the classic 100 TB cliff).
  *
  * The binned formulation: pick a bucket width, explode every interval
  * into the buckets it covers, bucket every point, equi-join on
  * (key, bucket) — Spark plans a plain shuffle hash/sort-merge join —
  * then apply the exact containment predicate. Each interval lands in
  * `ceil(len/width)+1` buckets, so cost is linear in data with a small
  * constant governed by `bucketWidth` (choose ≈ median interval length:
  * shorter → more replicas; longer → more false candidates filtered).
  * No pair survives past its bucket unless it truly matches, and a point
  * matches an interval in exactly one shared bucket (the point's), so no
  * dedup pass is needed.
  */
object RangeJoin {

  /** @param points   left side, one row per point event
    * @param intervals right side with `[startCol, endCol]` inclusive
    * @param keyCols   equi-key both sides share (e.g. user_id)
    * @param bucketWidth time-bucket width in the ts/start/end unit */
  def pointInInterval(points: DataFrame, tsCol: String,
                      intervals: DataFrame, startCol: String, endCol: String,
                      keyCols: Seq[String], bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val key = keyCols.map(col)
    // every bucket the interval overlaps: floor(start/w) .. floor(end/w)
    val exploded = intervals.withColumn("__bucket",
      explode(sequence(floor(col(startCol) / bucketWidth),
        floor(col(endCol) / bucketWidth))))
    val bucketedPoints = points.withColumn("__bucket",
      floor(col(tsCol) / bucketWidth))
    bucketedPoints.join(exploded, keyCols :+ "__bucket")
      .where(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("__bucket")
  }
}
