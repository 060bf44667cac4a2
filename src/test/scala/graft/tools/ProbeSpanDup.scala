package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale probe for [[graft.ops.TextAnalysis.spanDupRate]]: synthetic
  * corpora with a heavy duplicated-boilerplate share (the web-crawl
  * shape — the same span repeated across a large fraction of documents)
  * at 1× and 10×, to verify the global span-frequency join stays
  * sub-linear-per-row and the hot span key does not serialize a task.
  * The hot key lands on ONE reducer in the count aggregation, but only
  * as a partial-agg merge (32 partial counts, not N rows) — the probe
  * exists to prove that holds. Scratch tool; results in SCALE.md.
  *
  * Usage: Test/runMain graft.tools.ProbeSpanDup [thousandsOfDocs]
  */
object ProbeSpanDup {
  def main(args: Array[String]): Unit = {
    val thousands = if (args.nonEmpty) args(0).toInt else 100
    val n = thousands * 1000L
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // 30% of docs carry the same boilerplate sentence (every trigram of it
    // duplicated corpus-wide, one mega-hot span key per position); the
    // rest are pseudo-random 40-token texts with incidental duplication.
    def mk(rows: Long): DataFrame = spark.range(rows).select(col("id"),
      when(pmod(col("id"), lit(10L)) < 3L,
        lit("all rights reserved click here to subscribe to our newsletter today"))
        .otherwise(concat_ws(" ", (0 until 40).map(i =>
          concat(lit("w"), pmod(col("id") * (2 * i + 1) + i, lit(500L)).cast("string"))): _*))
        .as("text"))

    def time(df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def best2(df: => DataFrame): Double = math.min(time(df), time(df))

    def run(rows: Long): DataFrame =
      graft.ops.TextAnalysis.spanDupRate(mk(rows), "id", "text", n = 3)

    time(run(10000L)) // warm-up
    val t1 = best2(run(n))
    val t10 = best2(run(n * 10))
    println(f"spanDupRate: ${n / 1000}%dk docs = $t1%.1fs, ${n * 10 / 1000}%dk docs = $t10%.1fs, ratio ${t10 / t1}%.1fx")
    spark.stop()
  }
}
