package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale probe for the two-phase parallel prefix sum: a 90%-one-domain
  * running sum (the real pretraining-mixture shape) with the order/value
  * columns isolated from tokenization cost, at row counts where the
  * naive single-window plan's one-task-per-domain sort actually bites.
  * Scratch tool; results recorded in SCALE.md.
  *
  * Usage: Test/runMain graft.tools.ProbeSkewMix [millionsOfRows]
  */
object ProbeSkewMix {
  def main(args: Array[String]): Unit = {
    val millions = if (args.nonEmpty) args(0).toInt else 20
    val n = millions * 1000000L
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // 90% of rows in one domain; unique (v, id) order key per domain
    def mk(rows: Long): DataFrame = spark.range(rows).select(col("id"),
      when(pmod(col("id"), lit(10L)) =!= 0L, "web")
        .otherwise(concat(lit("src"), pmod(col("id"), lit(4L)).cast("string"))).as("dom"),
      (pmod(col("id") * 37L, lit(100000L)) + 1L).as("v"))

    def naive(df: DataFrame): DataFrame =
      df.withColumn("cum", sum(col("v")).over(
        Window.partitionBy("dom").orderBy(col("v"), col("id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))

    def sliced(df: DataFrame): DataFrame =
      graft.ops.Curation.parallelRunningSum(df, Seq("dom"), Seq("v", "id"), "v", "cum")

    // The domainMix shape: order led by a uniform 60-bit hash key →
    // deterministic `key div width` slicing, no sampled range exchange.
    def detSliced(df: DataFrame): DataFrame = {
      val keyed = df.withColumn("__key",
        graft.functions.TextFunctions.hash60(concat(lit("p:"), col("id").cast("string"))))
      graft.ops.Curation.parallelRunningSum(keyed, Seq("dom"), Seq("__key", "id"),
        "v", "cum",
        sliceOf = Some { n =>
          val width = ((1L << 60) + n - 1) / n
          expr(s"__key div ${width}L")
        })
    }

    def time(df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def best2(df: => DataFrame): Double = math.min(time(df), time(df))

    time(sliced(mk(100000L))); time(naive(mk(100000L))) // warm-up
    val small = mk(n / 10)
    val bigDf = mk(n)
    val s1 = best2(sliced(small)); val sN = best2(sliced(bigDf))
    val d1 = best2(detSliced(small)); val dN = best2(detSliced(bigDf))
    val n1 = best2(naive(small)); val nN = best2(naive(bigDf))
    println(f"[skewprobe] rows=${n / 10} -> $n (90%% one domain)")
    println(f"[skewprobe] sliced: 1x=$s1%.2fs 10x=$sN%.2fs vs-linear=${sN / (10 * s1)}%.2f")
    println(f"[skewprobe] det:    1x=$d1%.2fs 10x=$dN%.2fs vs-linear=${dN / (10 * d1)}%.2f")
    println(f"[skewprobe] naive:  1x=$n1%.2fs 10x=$nN%.2fs vs-linear=${nN / (10 * n1)}%.2f")
    println(f"[skewprobe] at ${n / 1000000}M rows the sliced prefix sum is ${nN / sN}%.1fx faster")
    spark.stop()
  }
}
