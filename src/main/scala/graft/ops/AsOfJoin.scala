package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (last-value) join: attach to each left row the single most
  * recent right row with `right.ts <= left.ts` for the same key — the
  * standard time-series enrichment (trade←quote, purchase←click,
  * reading←calibration) that plain SQL can only express as a quadratic
  * range join + per-row argmax.
  *
  * Implementation is the union-window formulation, NOT a range join:
  * tag both inputs, union them, and compute `last(right payload) IGNORE
  * NULLS` over a per-key window ordered by (ts, side) with right rows
  * sorting before coincident left rows. Cost is ONE shuffle of
  * |left|+|right| rows on the key and a linear window pass — no
  * candidate-pair blowup however dense the right side is (a range join
  * pairs every left row with ALL its preceding right rows before the
  * argmax; this never materializes more than the union).
  *
  * Right rows are first collapsed to one per (key, ts) — latest by
  * `rightSeqCol` — so "most recent" is well-defined under timestamp ties
  * (and the oracle's ASOF JOIN agrees bit-for-bit).
  */
object AsOfJoin {

  /** @param rightCols right payload columns to attach (null when no right
    *                  row precedes the left row)
    * @param rightSeqCol tie-breaker among right rows sharing (key, ts):
    *                    highest value wins */
  def asOf(left: DataFrame, right: DataFrame, keyCols: Seq[String],
           leftTs: String, rightTs: String, rightCols: Seq[String],
           rightSeqCol: String): DataFrame = {
    // Fail fast on output-name collisions: a right payload column shadowing
    // a left column (or the matched-ts alias) would silently produce a
    // duplicate column name and break every downstream reference.
    val matchedName = s"${rightTs}_matched"
    val clashes = rightCols.filter(left.columns.contains) ++
      left.columns.filter(_ == matchedName) ++
      rightCols.filter(_ == matchedName) ++
      rightCols.diff(rightCols.distinct)
    require(clashes.isEmpty,
      s"asOf output collision on ${clashes.distinct.mkString(", ")}: " +
        "rename the left column(s) or the right payload column(s) first")
    val reserved = (left.columns ++ right.columns)
      .filter(c => c == "__ts" || c == "__side" || c == "__rn" ||
        c == "__matched_ts" || c.startsWith("__r_"))
    require(reserved.isEmpty,
      s"asOf reserves __ts/__side/__rn/__matched_ts/__r_* names; found ${reserved.distinct.mkString(", ")}")
    val key = keyCols.map(col)
    // one right row per (key, ts): latest by seq
    val tieW = Window.partitionBy((keyCols :+ rightTs).map(col): _*)
      .orderBy(col(rightSeqCol).desc)
    val r1 = right.withColumn("__rn", row_number().over(tieW)).where(col("__rn") === 1)

    val passthrough = left.columns.filterNot(c => keyCols.contains(c) || c == leftTs).toSeq
    val rTagged = r1.select(
      key ++ Seq(col(rightTs).as("__ts"), lit(0).as("__side")) ++
        passthrough.map(c => lit(null).as(c)) ++
        rightCols.map(c => col(c).as(s"__r_$c")) :+ col(rightTs).as("__r_ts"): _*)
    val lTagged = left.select(
      key ++ Seq(col(leftTs).as("__ts"), lit(1).as("__side")) ++
        passthrough.map(col) ++
        rightCols.map(c => lit(null).as(s"__r_$c")) :+ lit(null).as("__r_ts"): _*)

    // right rows (side 0) sort before coincident left rows (side 1), so a
    // right row at exactly left.ts is eligible (<= semantics)
    val w = Window.partitionBy(key: _*).orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matchedCols = rightCols.map(c =>
      last(col(s"__r_$c"), ignoreNulls = true).over(w).as(c)) :+
      last(col("__r_ts"), ignoreNulls = true).over(w).as("__matched_ts")

    rTagged.unionByName(lTagged)
      .select(col("*") +: matchedCols: _*)
      .where(col("__side") === 1)
      .drop((Seq("__side") ++ rightCols.map(c => s"__r_$c") :+ "__r_ts"): _*)
      .withColumnRenamed("__ts", leftTs)
      .withColumnRenamed("__matched_ts", s"${rightTs}_matched")
  }

  /** [[asOf]] generalized with DIRECTION and TOLERANCE — the full
    * pandas-merge_asof surface. `forward = true` attaches the EARLIEST
    * right row with `right.ts >= left.ts` (the "next event" enrichment:
    * click→next purchase, reading→next calibration); `tolerance` nulls
    * the attached payload when the matched row lies further than the
    * bound in timestamp units — the left row is KEPT with null payload,
    * exactly merge_asof's contract, so downstream aggregates see every
    * left row.
    *
    * Forward is the backward walk on NEGATED timestamps — the same one
    * union shuffle + linear window pass, no range join, no candidate
    * blowup. Tie-breaks are unchanged: a right row at exactly left.ts is
    * eligible in both directions, and right rows sharing (key, ts)
    * collapse to the highest `rightSeqCol`. Timestamps must be numeric
    * (negation); the matched-ts output column is `<rightTs>_matched`. */
  def asOfDirectional(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                      leftTs: String, rightTs: String, rightCols: Seq[String],
                      rightSeqCol: String, forward: Boolean = false,
                      tolerance: Option[Long] = None): DataFrame = {
    val matchedName = s"${rightTs}_matched"
    val joined =
      if (!forward) asOf(left, right, keyCols, leftTs, rightTs, rightCols, rightSeqCol)
      else {
        val lneg = left.withColumn(leftTs, -col(leftTs))
        val rneg = right.withColumn(rightTs, -col(rightTs))
        asOf(lneg, rneg, keyCols, leftTs, rightTs, rightCols, rightSeqCol)
          .withColumn(leftTs, -col(leftTs))
          .withColumn(matchedName, -col(matchedName))
      }
    tolerance.fold(joined) { tol =>
      require(tol >= 0, s"tolerance must be >= 0: $tol")
      val gap = if (forward) col(matchedName) - col(leftTs)
                else col(leftTs) - col(matchedName)
      val keep = col(matchedName).isNotNull && gap <= tol
      rightCols.foldLeft(joined)((df, c) => df.withColumn(c, when(keep, col(c))))
        .withColumn(matchedName, when(keep, col(matchedName)))
    }
  }
}
