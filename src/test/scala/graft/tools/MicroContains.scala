package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-probe for [[graft.plans.TokenContainsRule]]: token membership
  * via array_contains(split(...)) vs the rewritten allocation-free scan
  * on realistic document lengths — the term-probe predicate shape
  * (`StatsIndex.prunedReadToken`). Scratch tool; result recorded in
  * SCALE.md. */
object MicroContains {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // 200k docs x ~400 tokens (~2.8 KB prose-ish); the probe term hits
    // ~1/1000 docs late in the string (worst case for early exit, the
    // whole string is scanned either way)
    val docs = spark.range(200000).select(concat(
        expr("array_join(transform(sequence(1, 400), i -> concat('tok', (i * (id + 7)) % 997)), ' ')"),
        when(col("id") % 1000 === 0, lit(" needle")).otherwise(lit("")))
      .as("t"))
      .localCheckpoint(true)
    def time(f: => Long): Double = {
      val t0 = System.nanoTime(); val n = f
      val dt = (System.nanoTime() - t0) / 1e9
      println(s"  hits=$n"); dt
    }
    def q() = docs.select(sum(
      when(array_contains(split(col("t"), "\\s+"), "needle"), 1L).otherwise(0L))
      .as("s")).head().getLong(0)
    def viaRule() = {
      graft.plans.GraftOptimizations.install(spark)
      try q() finally graft.plans.GraftOptimizations.uninstall(spark)
    }
    q(); viaRule() // warm
    val a = Seq.fill(3)(time(q())).min
    val b = Seq.fill(3)(time(viaRule())).min
    println(f"array_contains(split): $a%.2f s; rule(scan): $b%.2f s; " +
      f"speedup ${a / b}%.2fx")
    spark.stop()
  }
}
