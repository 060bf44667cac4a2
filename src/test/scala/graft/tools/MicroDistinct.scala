package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-probe for [[graft.plans.DistinctCountRule]]: distinct-token
  * count via size(array_distinct(...)) vs the rewritten hash-set count
  * on LARGE (~32 KB, ~4k-token) documents, where materializing the
  * deduplicated array per row dominates. Scratch tool; result recorded
  * in SCALE.md. */
object MicroDistinct {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // 20k docs x 4000 tokens; two dedup regimes (the ARRAY is
    // checkpointed so timing covers only distinct + size):
    //  - repetitive: ~997 distinct per doc (dedup output small)
    //  - mostly-distinct: 4000 distinct per doc (dedup output = input,
    //    the materialization the rewrite avoids is maximal)
    def corpus(mod: String) = spark.range(20000).select(expr(
      s"transform(sequence(1, 4000), i -> concat('tok', (i * (id + 7)) $mod))")
      .as("a"))
      .localCheckpoint(true)
    def time(f: => Long): Double = {
      val t0 = System.nanoTime(); val n = f
      val dt = (System.nanoTime() - t0) / 1e9
      println(s"  sum=$n"); dt
    }
    for ((label, mod) <- Seq("repetitive" -> "% 997", "distinct" -> "% 100000019")) {
      val docs = corpus(mod)
      def builtin() = docs.select(sum(size(array_distinct(col("a")))).as("s"))
        .head().getLong(0)
      def viaRule() = {
        graft.plans.GraftOptimizations.install(spark)
        try docs.select(sum(size(array_distinct(col("a")))).as("s"))
          .head().getLong(0)
        finally graft.plans.GraftOptimizations.uninstall(spark)
      }
      builtin(); viaRule() // warm
      val a = Seq.fill(3)(time(builtin())).min
      val b = Seq.fill(3)(time(viaRule())).min
      println(f"[$label] size(array_distinct): $a%.2f s; rule(count): $b%.2f s; " +
        f"speedup ${a / b}%.2fx")
    }
    spark.stop()
  }
}
