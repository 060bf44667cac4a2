package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale probe for the sortless quality floor: a 90%-one-domain corpus
  * (the skew shape qualityFloor's per-domain sort serializes on) at row
  * counts where the rank path's one-task mega-domain sort actually
  * bites, vs the quantile-sketch cutoff path. Scratch tool; results
  * recorded in SCALE.md.
  *
  * Usage: Test/runMain graft.tools.ProbeQualityFloor [millionsOfRows]
  */
object ProbeQualityFloor {
  def main(args: Array[String]): Unit = {
    val millions = if (args.nonEmpty) args(0).toInt else 20
    val n = millions * 1000000L
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // 90% of rows in one domain; distinct quality per (dom, id)
    def mk(rows: Long): DataFrame = spark.range(rows).select(col("id"),
      when(pmod(col("id"), lit(10L)) =!= 0L, "web")
        .otherwise(concat(lit("src"), pmod(col("id"), lit(4L)).cast("string"))).as("dom"),
      (pmod(col("id") * 2654435761L, lit(1000000007L)).cast("double")
        / 1000000007.0).as("quality"))

    def rankFloor(df: DataFrame): DataFrame =
      graft.ops.Curation.qualityFloor(df, "dom", "quality", "id", 0.2)
    def cutoffFloor(df: DataFrame): DataFrame =
      graft.ops.Curation.qualityFloorByCutoff(df, "dom", "quality", 0.2)

    def time(df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def best2(df: => DataFrame): Double = math.min(time(df), time(df))

    time(cutoffFloor(mk(100000L))); time(rankFloor(mk(100000L))) // warm-up
    val small = mk(n / 10).localCheckpoint(true)
    val big = mk(n).localCheckpoint(true)
    val cutSmall = best2(cutoffFloor(small))
    val cutBig = best2(cutoffFloor(big))
    val rankSmall = best2(rankFloor(small))
    val rankBig = best2(rankFloor(big))
    println(f"PROBE rows=${n / 10}%d rank=$rankSmall%.1fs cutoff=$cutSmall%.1fs")
    println(f"PROBE rows=$n%d rank=$rankBig%.1fs cutoff=$cutBig%.1fs " +
      f"speedup=${rankBig / cutBig}%.1fx cutoff-vs-linear=${cutBig / (10 * cutSmall)}%.2f")
    // sanity: realized drop fraction is below but near dropFrac on the
    // mega-domain (distinct qualities → cume boundary within 1/n)
    val tot = big.where(col("dom") === "web").count().toDouble
    val kept = cutoffFloor(big).where(col("dom") === "web").count().toDouble
    println(f"PROBE web-domain kept-frac=${kept / tot}%.4f (expect ~0.80)")
    spark.stop()
  }
}
