package graft.tools

import graft.cdc.{Merge, Op}
import graft.io.MorTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-10 probe: MOR merge commit cost must be FLAT in target size
  * (the whole point of the equality-delete sidecar — the r9 verdict's
  * #1 item was that the old position-delete merge scanned the full
  * live target per commit, O(target)). Build MOR tables at 1× and 10×
  * rows, commit the SAME fixed-size change batch into each, compare
  * wall time. Scratch tool; results in SCALE.md.
  *
  * Usage: Test/runMain graft.tools.ProbeMorCommit
  */
object ProbeMorCommit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def mkTarget(n: Long): DataFrame =
      spark.range(n).select(lit(Op.Insert).as(Op.column), $"id".as("k"),
        concat(lit("v"), $"id").as("v"), ($"id" % 97).as("grp"))

    // fixed-size batch: 1000 updates spread across the key space
    def mkBatch(n: Long): DataFrame =
      spark.range(1000).select(lit(Op.Update).as(Op.column),
        ($"id" * (n / 1000L)).as("k"), concat(lit("u"), $"id").as("v"),
        lit(0L).as("grp"), lit(1L).as(Merge.FileSeq))

    def probe(n: Long): Double = {
      val base = java.nio.file.Files.createTempDirectory(s"morp$n").toString + "/t"
      MorTable.init(spark, mkTarget(n), base, maxRecordsPerFile = 100000L)
      val batch = mkBatch(n).localCheckpoint(true) // exclude batch prep
      val times = (1 to 3).map { i =>
        val t0 = System.nanoTime()
        MorTable.merge(spark, batch, base, Seq("k"))
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[mor-commit] target=$n%,d rows: merges=${times.map(t => f"$t%.2f").mkString(",")} min=${times.min}%.2f s")
      times.min
    }

    val t1 = probe(1000000L)
    val t10 = probe(10000000L)
    println(f"[mor-commit] 10x-target commit cost ratio = ${t10 / t1}%.2f (flat = 1.0)")
    spark.stop()
  }
}
