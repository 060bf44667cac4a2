package graft.tools

import graft.cdc.{Merge, Op}
import graft.io.MorTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-11 probe: the threshold-driven maintenance policy
  * ([[MorTable.maintainIfNeeded]]) must re-flatten MOR read cost under
  * sustained churn. Drive K churny commits into a 1M-row table twice —
  * once bare, once with the every-commit policy check — and compare the
  * post-ingest full-read wall time and outstanding mask rows. Scratch
  * tool; results in SCALE.md.
  *
  * Usage: Test/runMain graft.tools.ProbeMaintain
  */
object ProbeMaintain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val n = 1000000L
    val commits = 20
    def mkTarget: DataFrame =
      spark.range(n).select(lit(Op.Insert).as(Op.column), $"id".as("k"),
        concat(lit("v"), $"id").as("v"))
    // each commit updates one contiguous 5% stripe → after 20 commits the
    // whole key space churned once (every base file well past 30% dead)
    def mkBatch(i: Int): DataFrame =
      spark.range(n / commits).select(lit(Op.Update).as(Op.column),
        ($"id" + i.toLong * (n / commits)).as("k"),
        concat(lit(s"u$i-"), $"id").as("v"), lit(1L).as(Merge.FileSeq))

    def run(maintain: Boolean): (Double, Long, Double) = {
      val base = java.nio.file.Files.createTempDirectory(
        s"morm$maintain").toString + "/t"
      MorTable.init(spark, mkTarget, base, maxRecordsPerFile = 100000L)
      var maintMs = 0.0
      (0 until commits).foreach { i =>
        MorTable.merge(spark, mkBatch(i).localCheckpoint(true), base, Seq("k"))
        if (maintain) {
          val t0 = System.nanoTime()
          MorTable.maintainIfNeeded(spark, base, maxAmplification = 0.3,
            clusterBy = Seq("k")): Unit
          maintMs += (System.nanoTime() - t0) / 1e6
        }
      }
      val masks = MorTable.health(spark, base).maskRows
      val reads = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        MorTable.read(spark, base).count()
        (System.nanoTime() - t0) / 1e9
      }
      (reads.min, masks, maintMs / 1e3)
    }

    val (bareRead, bareMasks, _) = run(maintain = false)
    val (maintRead, maintMasks, maintSec) = run(maintain = true)
    println(f"[maintain] bare:       read=$bareRead%.2f s, outstanding masks=$bareMasks%,d")
    println(f"[maintain] maintained: read=$maintRead%.2f s, outstanding masks=$maintMasks%,d (policy time total=$maintSec%.1f s over $commits commits)")
    println(f"[maintain] read-cost ratio maintained/bare = ${maintRead / bareRead}%.2f")
    spark.stop()
  }
}
