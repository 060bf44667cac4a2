package graft.tools

import graft.ops.Similarity
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-11 probe: [[Similarity.kCenterScalable]]'s Spark-job count must
  * be independent of k (the sequential [[Similarity.kCenterCoreset]] is
  * k driver-paced argmax jobs — its round count IS the bottleneck at
  * k = 10,000, not data volume). Count scheduler jobs for both variants
  * at k = 8 and k = 32 over the same 100k-row corpus. Scratch tool;
  * results in SCALE.md.
  *
  * Usage: Test/runMain graft.tools.ProbeKCenter
  */
object ProbeKCenter {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val corpus = spark.range(100000L).select(col("id").as("vec_id"),
      array((0 until 64).map(d =>
        sin(col("id") * (d * 7 + 3) + d).cast("float")): _*).as("embedding"))
      .localCheckpoint(true)

    val jobs = new java.util.concurrent.atomic.AtomicLong()
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet(): Unit
    }
    spark.sparkContext.addSparkListener(listener)
    def countJobs(body: => Unit): Long = {
      Thread.sleep(500); jobs.set(0L)
      body
      Thread.sleep(500) // listener delivery is async; jobs are seconds-long
      jobs.get()
    }

    def seqJobs(k: Int): Long = countJobs(
      Similarity.kCenterCoreset(corpus, "vec_id", "embedding", k).count(): Unit)
    def parJobs(k: Int): Long = countJobs(
      Similarity.kCenterScalable(corpus, "vec_id", "embedding",
        k, oversample = 2 * k, passes = 3).count(): Unit)

    val (s8, s32) = (seqJobs(8), seqJobs(32))
    val (p8, p32) = (parJobs(8), parJobs(32))
    println(s"[kcenter] sequential greedy: k=8 -> $s8 jobs, k=32 -> $s32 jobs (grows with k)")
    println(s"[kcenter] k-center||:        k=8 -> $p8 jobs, k=32 -> $p32 jobs (pass-bound)")
    spark.stop()
  }
}
